"""DCD codec: round-trip, a hand-laid golden bytestream (independent of the
writer, so a symmetric encode/decode bug cannot hide), endianness, and
corrupt-input rejection."""

import struct

import numpy as np
import pytest

from lam_slide_tpu.data.dcd import read_dcd, write_dcd


def _rand_xyz(t=5, n=7, seed=0):
    return np.random.default_rng(seed).standard_normal((t, n, 3)).astype(np.float32)


def test_roundtrip(tmp_path):
    xyz = _rand_xyz()
    path = tmp_path / "t.dcd"
    write_dcd(path, xyz)
    back, cells = read_dcd(path)
    assert cells is None
    # nm -> Angstrom -> f32 -> nm loses a little precision
    np.testing.assert_allclose(back, xyz, rtol=1e-6, atol=1e-6)


def test_roundtrip_with_unit_cells(tmp_path):
    xyz = _rand_xyz(t=3)
    cells = np.tile(np.array([10.0, 90.0, 10.0, 90.0, 90.0, 10.0]), (3, 1))
    path = tmp_path / "t.dcd"
    write_dcd(path, xyz, unit_cells=cells)
    back, back_cells = read_dcd(path)
    np.testing.assert_allclose(back, xyz, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(back_cells, cells)


def _build_dcd_bytes(xyz_ang, endian="<"):
    """Hand-laid CHARMM DCD bytestream built with struct only."""

    def rec(payload):
        m = struct.pack(endian + "i", len(payload))
        return m + payload + m

    t, n, _ = xyz_ang.shape
    icntrl = [0] * 20
    icntrl[0] = t
    icntrl[19] = 24
    out = rec(b"CORD" + struct.pack(endian + "20i", *icntrl))
    out += rec(struct.pack(endian + "i", 1) + b"T" * 80)
    out += rec(struct.pack(endian + "i", n))
    for f in range(t):
        for ax in range(3):
            out += rec(struct.pack(endian + f"{n}f", *xyz_ang[f, :, ax]))
    return out


@pytest.mark.parametrize("endian", ["<", ">"])
def test_golden_bytestream_decodes(tmp_path, endian):
    xyz_ang = np.array(
        [[[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]],
         [[7.0, 8.0, 9.0], [-1.0, -2.0, -3.0]]], np.float32)
    path = tmp_path / "g.dcd"
    path.write_bytes(_build_dcd_bytes(xyz_ang, endian))
    back, cells = read_dcd(path)
    assert cells is None
    np.testing.assert_allclose(back, xyz_ang * 0.1, rtol=1e-7)  # Angstrom->nm


def test_trailing_garbage_frame_is_dropped_not_fatal(tmp_path):
    xyz = _rand_xyz(t=2)
    path = tmp_path / "t.dcd"
    write_dcd(path, xyz)
    with open(path, "ab") as f:
        f.write(b"\x01\x02")  # truncated marker at EOF
    back, _ = read_dcd(path)
    assert back.shape[0] == 2


def test_truncated_after_cell_keeps_cells_matched_to_frames(tmp_path):
    """A file cut between a frame's unit-cell record and its coordinates
    must not return one more cell row than coordinate frames."""
    xyz = _rand_xyz(t=2)
    cells = np.tile(np.array([10.0, 90.0, 10.0, 90.0, 90.0, 10.0]), (2, 1))
    path = tmp_path / "t.dcd"
    write_dcd(path, xyz, unit_cells=cells)
    with open(path, "ab") as f:  # orphan cell record of a third frame
        payload = np.zeros(6, np.float64).tobytes()
        f.write(struct.pack("<i", 48) + payload + struct.pack("<i", 48))
    back, back_cells = read_dcd(path)
    assert back.shape[0] == 2 and back_cells.shape[0] == 2


def test_xplor_flavor_ignores_crystal_flag_word(tmp_path):
    """In X-PLOR DCDs (icntrl[19]==0) the icntrl[10] word overlaps a
    float64 timestep — arbitrary nonzero bits must not make the reader
    expect unit-cell records."""
    xyz_ang = np.array([[[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]], np.float32)
    t, n, _ = xyz_ang.shape

    def rec(payload):
        m = struct.pack("<i", len(payload))
        return m + payload + m

    icntrl = [0] * 20
    icntrl[0] = t
    icntrl[10] = -1091633152  # high word of a float64 AKMA timestep
    icntrl[19] = 0  # X-PLOR: no CHARMM version tag
    out = rec(b"CORD" + struct.pack("<20i", *icntrl))
    out += rec(struct.pack("<i", 1) + b"T" * 80)
    out += rec(struct.pack("<i", n))
    for f in range(t):
        for ax in range(3):
            out += rec(struct.pack(f"<{n}f", *xyz_ang[f, :, ax]))
    path = tmp_path / "xplor.dcd"
    path.write_bytes(out)
    back, cells = read_dcd(path)
    assert cells is None
    np.testing.assert_allclose(back, xyz_ang * 0.1, rtol=1e-7)


def test_corrupt_inputs_rejected(tmp_path):
    p = tmp_path / "bad.dcd"
    p.write_bytes(b"\x00" * 3)
    with pytest.raises(ValueError, match="too short"):
        read_dcd(p)
    p.write_bytes(struct.pack("<i", 84) + b"XORD" + b"\x00" * 80
                  + struct.pack("<i", 84))
    with pytest.raises(ValueError, match="CORD"):
        read_dcd(p)
    # mismatched record markers
    p.write_bytes(struct.pack("<i", 84) + b"CORD" + b"\x00" * 80
                  + struct.pack("<i", 83))
    with pytest.raises(ValueError, match="disagree"):
        read_dcd(p)


def test_process_4aa_accepts_dcd(tmp_path, monkeypatch):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "process_4aa", os.path.join(os.path.dirname(__file__), "..",
                                    "tools", "process_4aa.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    xyz = _rand_xyz(t=4, n=3)
    path = tmp_path / "traj.dcd"
    write_dcd(path, xyz)
    out = mod._load_xyz(str(path), top_path=None)
    np.testing.assert_allclose(out, xyz, rtol=1e-6, atol=1e-6)
