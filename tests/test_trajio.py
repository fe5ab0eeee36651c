"""Unified trajectory loading (data/trajio.py) — the library equivalent of
the reference's load_traj dispatcher (src/utils/traj_utils.py:25-41)."""

import numpy as np
import pytest

from lam_slide_tpu.data.trajio import load_traj, read_pdb_frames


def _xyz(t=3, n=5, seed=0):
    return np.random.default_rng(seed).normal(size=(t, n, 3)).astype(np.float32)


def test_npz_positions_key(tmp_path):
    xyz = _xyz()
    p = tmp_path / "a.npz"
    np.savez(p, positions=xyz)
    np.testing.assert_array_equal(load_traj(str(p)), xyz)


def test_npz_missing_key(tmp_path):
    p = tmp_path / "a.npz"
    np.savez(p, other=np.zeros(3))
    with pytest.raises(ValueError, match="positions"):
        load_traj(str(p))


def test_npy_batch_axis_squeezed(tmp_path):
    # Reference squeezes a [B, T, N, 3] array to its first trajectory
    # (traj_utils.py:35-37).
    xyz = _xyz(t=4)
    p = tmp_path / "a.npy"
    np.save(p, xyz[None].repeat(2, axis=0))
    np.testing.assert_array_equal(load_traj(str(p)), xyz)


def test_npz_batched_rejected(tmp_path):
    # A 4-D npz is an error: the reference squeezes .npy only
    # (traj_utils.py:34-37), and silently returning arr[0] would drop
    # trajectories 1..B-1.
    p = tmp_path / "a.npz"
    np.savez(p, positions=_xyz(t=4)[None].repeat(2, axis=0))
    with pytest.raises(ValueError, match="batched"):
        load_traj(str(p))


def test_pdb_nm_unit(tmp_path):
    # pdb_unit="nm" reproduces the reference's mdtraj contract (A -> nm).
    p = tmp_path / "a.pdb"
    p.write_text(
        "MODEL     1\n"
        "ATOM      1  CA  ALA A   1      10.000  20.000  30.000\n"
        "ENDMDL\n"
    )
    np.testing.assert_allclose(load_traj(str(p), pdb_unit="nm"),
                               [[[1.0, 2.0, 3.0]]], atol=1e-6)
    with pytest.raises(ValueError, match="pdb_unit"):
        load_traj(str(p), pdb_unit="bogus")


def test_npy_bad_shape(tmp_path):
    p = tmp_path / "a.npy"
    np.save(p, np.zeros((5, 7)))
    with pytest.raises(ValueError, match="expected"):
        load_traj(str(p))


def test_pdb_multimodel(tmp_path):
    xyz = _xyz(t=2, n=3) * 10.0  # Angstrom-scale values
    lines = []
    for t in range(2):
        lines.append(f"MODEL     {t + 1}")
        for i in range(3):
            x, y, z = xyz[t, i]
            lines.append(
                f"ATOM  {i + 1:5d}  CA  ALA A{i + 1:4d}    "
                f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           C"
            )
        lines.append("ENDMDL")
    p = tmp_path / "a.pdb"
    p.write_text("\n".join(lines) + "\n")
    got = load_traj(str(p))
    assert got.shape == (2, 3, 3)
    np.testing.assert_allclose(got, xyz, atol=5e-4)  # 8.3f rounding


def test_pdb_inconsistent_models(tmp_path):
    p = tmp_path / "a.pdb"
    p.write_text(
        "MODEL     1\n"
        "ATOM      1  CA  ALA A   1       1.000   2.000   3.000\n"
        "ENDMDL\n"
        "MODEL     2\n"
        "ATOM      1  CA  ALA A   1       1.000   2.000   3.000\n"
        "ATOM      2  CB  ALA A   1       1.000   2.000   3.000\n"
        "ENDMDL\n"
    )
    with pytest.raises(ValueError, match="inconsistent"):
        read_pdb_frames(str(p))


def test_dcd_dispatch(tmp_path):
    from lam_slide_tpu.data.dcd import write_dcd

    xyz = _xyz(t=3, n=4)
    p = tmp_path / "a.dcd"
    write_dcd(str(p), xyz)
    np.testing.assert_allclose(load_traj(str(p)), xyz, atol=1e-6)


def test_xtc_dispatch(tmp_path):
    pytest.importorskip("ctypes")
    from lam_slide_tpu.data import xtc as xtcmod

    try:
        xtcmod._engine()
    except RuntimeError:
        pytest.skip("no host compiler for the native xtc codec")
    xyz = _xyz(t=3, n=6)
    p = tmp_path / "a.xtc"
    xtcmod.write_xtc(str(p), xyz)
    np.testing.assert_allclose(load_traj(str(p)), xyz, atol=2e-3)


def test_unsupported_extension(tmp_path):
    p = tmp_path / "a.h5"
    p.write_bytes(b"")
    with pytest.raises(ValueError, match="unsupported"):
        load_traj(str(p))


def test_process_4aa_discovers_dcd(tmp_path):
    """tools/process_4aa.py must pick up a {name}.dcd trajectory next to the
    topology pdb (regression: .dcd was missing from the extension search, so
    the single-model topology silently became a 1-frame trajectory)."""
    import subprocess
    import sys

    from lam_slide_tpu.data.dcd import write_dcd

    raw = tmp_path / "raw" / "GLYX"
    raw.mkdir(parents=True)
    (raw / "GLYX.pdb").write_text(
        "MODEL     1\n"
        "ATOM      1  N   GLY A   1       0.000   0.000   0.000  1.00  0.00           N\n"
        "ATOM      2  CA  GLY A   1       1.458   0.000   0.000  1.00  0.00           C\n"
        "ATOM      3  C   GLY A   1       2.000   1.420   0.000  1.00  0.00           C\n"
        "ENDMDL\n"
    )
    xyz = _xyz(t=4, n=3, seed=7)
    write_dcd(str(raw / "GLYX.dcd"), xyz)
    (tmp_path / "split.csv").write_text("name\nGLYX\n")
    out = tmp_path / "out"
    subprocess.run(
        [sys.executable, "tools/process_4aa.py", "--split",
         str(tmp_path / "split.csv"), "--sim-dir", str(tmp_path / "raw"),
         "--outdir", str(out), "--stride", "2"],
        check=True, timeout=120,
    )
    npz = np.load(out / "GLYX-traj-arrays.npz")
    assert npz["positions"].shape == (2, 3, 3)  # 4 dcd frames strided by 2
