"""Native GROMACS XTC codec (lam_slide_tpu/native/xtc.cc).

Write→read round-trips across system sizes, precisions, and the
uncompressed ≤9-atom path; quantization error bounded by 1/(2·precision);
structural checks on the XDR framing.
"""

import numpy as np
import pytest

from lam_slide_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no host compiler")


def _traj(rng, t, n, spread=2.0, local=0.05):
    pos = (rng.standard_normal((t, n, 3)) * spread).astype(np.float32)
    if n > 1:  # water-like locality to exercise the small-diff run encoding
        m = pos[:, 1::2].shape[1]
        pos[:, 1::2] = pos[:, 0::2][:, :m] + local * rng.standard_normal(
            (t, m, 3)
        ).astype(np.float32)
    return pos


@pytest.mark.parametrize(
    "t,n,prec",
    [(5, 50, 1000.0), (3, 9, 1000.0), (2, 10, 1000.0), (4, 500, 100.0),
     (6, 23, 10000.0), (1, 1000, 1000.0), (2, 11, 1000.0)],
)
def test_roundtrip(tmp_path, t, n, prec):
    from lam_slide_tpu.data.xtc import read_xtc, write_xtc

    rng = np.random.default_rng(n)
    pos = _traj(rng, t, n)
    path = str(tmp_path / "x.xtc")
    write_xtc(path, pos, precision=prec)
    dec, meta = read_xtc(path)
    assert dec.shape == pos.shape
    bound = (0.5 / prec + 1e-6) if n > 9 else 1e-7  # <=9 atoms: raw floats
    assert np.abs(dec - pos).max() <= bound * 1.5
    assert meta["time"].shape == (t,) and meta["box"].shape == (t, 3, 3)


def test_metadata_roundtrip(tmp_path):
    from lam_slide_tpu.data.xtc import read_xtc, write_xtc

    rng = np.random.default_rng(0)
    pos = _traj(rng, 3, 40)
    box = np.tile(np.diag([2.5, 3.0, 3.5]).astype(np.float32), (3, 1, 1))
    time = np.asarray([0.0, 10.0, 20.0], np.float32)
    step = np.asarray([0, 500, 1000], np.int32)
    path = str(tmp_path / "m.xtc")
    write_xtc(path, pos, time=time, step=step, box=box)
    _, meta = read_xtc(path)
    np.testing.assert_array_equal(meta["time"], time)
    np.testing.assert_array_equal(meta["step"], step)
    np.testing.assert_allclose(meta["box"], box)


def test_magic_and_corruption(tmp_path):
    from lam_slide_tpu.data.xtc import read_xtc, write_xtc

    rng = np.random.default_rng(1)
    path = str(tmp_path / "c.xtc")
    write_xtc(path, _traj(rng, 2, 30))
    raw = np.fromfile(path, np.uint8)
    assert int.from_bytes(raw[:4].tobytes(), "big") == 1995  # XDR magic
    (tmp_path / "bad.xtc").write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError):
        read_xtc(str(tmp_path / "bad.xtc"))
    # truncated file -> corrupt-frame error, not garbage
    raw[: len(raw) // 2].tofile(str(tmp_path / "trunc.xtc"))
    with pytest.raises(ValueError):
        read_xtc(str(tmp_path / "trunc.xtc"))


def test_compression_is_real(tmp_path):
    """Compressed frames are much smaller than raw floats for coherent data."""
    from lam_slide_tpu.data.xtc import write_xtc

    rng = np.random.default_rng(2)
    pos = _traj(rng, 4, 300, spread=1.0, local=0.02)
    path = str(tmp_path / "z.xtc")
    write_xtc(path, pos)
    raw_bytes = pos.nbytes
    import os

    assert os.path.getsize(path) < 0.65 * raw_bytes


def test_process_4aa_reads_xtc(tmp_path):
    """tools/process_4aa.py ingests .xtc via the native codec."""
    import subprocess
    import sys

    from lam_slide_tpu.data.xtc import write_xtc

    rng = np.random.default_rng(3)
    n_atoms = 12
    pos = _traj(rng, 6, n_atoms)
    raw = tmp_path / "raw" / "TEST"
    raw.mkdir(parents=True)
    write_xtc(str(raw / "TEST.xtc"), pos)
    # matching topology pdb (heavy atoms only, one fake residue per 4 atoms)
    lines = []
    names = ["N", "CA", "C", "O"]
    for i in range(n_atoms):
        x, y, z = pos[0, i]
        lines.append(
            f"ATOM  {i+1:5d}  {names[i%4]:<3s}ALA A{i//4+1:4d}    "
            f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00\n")
    (raw / "TEST.pdb").write_text("".join(lines) + "END\n")
    (tmp_path / "split.csv").write_text("name\nTEST\n")
    subprocess.run(
        [sys.executable, "tools/process_4aa.py", "--split",
         str(tmp_path / "split.csv"), "--sim-dir", str(tmp_path / "raw"),
         "--outdir", str(tmp_path / "out"), "--stride", "2"],
        check=True,
    )
    data = np.load(tmp_path / "out" / "TEST-traj-arrays.npz")
    assert data["positions"].shape == (3, n_atoms, 3)


class TestFuzz:
    """Property-based round-trips: arbitrary sizes/scales/precisions."""

    @pytest.mark.parametrize("seed", range(8))
    def test_random_roundtrip(self, tmp_path, seed):
        from lam_slide_tpu.data.xtc import read_xtc, write_xtc

        rng = np.random.default_rng(seed)
        t = int(rng.integers(1, 5))
        n = int(rng.integers(1, 400))
        spread = float(10.0 ** rng.uniform(-2, 2))
        prec = float(10.0 ** rng.integers(1, 5))
        pos = (rng.standard_normal((t, n, 3)) * spread).astype(np.float32)
        if rng.random() < 0.5 and n > 4:  # clustered halves (mixed run lengths)
            pos[:, n // 2:] = pos[:, : n - n // 2] + 0.01 * spread * rng.standard_normal(
                (t, n - n // 2, 3)).astype(np.float32)
        path = str(tmp_path / f"f{seed}.xtc")
        write_xtc(path, pos, precision=prec)
        dec, _ = read_xtc(path)
        assert dec.shape == pos.shape
        bound = (0.5 / prec) if n > 9 else 0.0
        # int32 quantization caps representable magnitude; skip pathological
        # spread/precision combos the format itself cannot hold
        if spread * prec < 2**30:
            assert np.abs(dec - pos).max() <= bound * 1.5 + 1e-7

    def test_hypothesis_small_systems(self, tmp_path):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from lam_slide_tpu.data.xtc import read_xtc, write_xtc

        @settings(max_examples=25, deadline=None)
        @given(
            n=st.integers(1, 60),
            t=st.integers(1, 3),
            seed=st.integers(0, 2**16),
        )
        def run(n, t, seed):
            rng = np.random.default_rng(seed)
            pos = (rng.standard_normal((t, n, 3)) * 2).astype(np.float32)
            path = str(tmp_path / "h.xtc")
            write_xtc(path, pos, precision=1000.0)
            dec, _ = read_xtc(path)
            bound = 5.5e-4 if n > 9 else 1e-7
            assert np.abs(dec - pos).max() <= bound

        run()


def test_corruption_fuzz_never_crashes(tmp_path):
    """Random in-place byte corruption must yield a decode error or a decoded
    array — never a process crash (the decoder guards every size/index the
    format supplies before using it)."""
    from lam_slide_tpu.data.xtc import read_xtc, write_xtc

    rng = np.random.default_rng(5)
    path = str(tmp_path / "base.xtc")
    write_xtc(path, _traj(rng, 2, 64))
    base = np.fromfile(path, np.uint8)
    for trial in range(60):
        corrupt = base.copy()
        n_flips = int(rng.integers(1, 6))
        pos = rng.integers(4, len(base), n_flips)  # keep the magic intact
        corrupt[pos] = rng.integers(0, 256, n_flips).astype(np.uint8)
        cpath = str(tmp_path / "c.xtc")
        corrupt.tofile(cpath)
        try:
            read_xtc(cpath)
        except ValueError:
            pass  # decode error is the acceptable failure mode
