"""Multi-format trajectory loading (host-side, pure numpy).

Library equivalent of the reference's ``load_traj`` dispatcher
(src/utils/traj_utils.py:25-41), which routes .pdb/.xtc/.dcd/.npz/.npy
through mdtraj. Here each format is decoded natively:

    .xtc  native GROMACS codec (native/xtc.cc via data/xtc.py)
    .dcd  pure-numpy CHARMM/NAMD codec (data/dcd.py)
    .npz  positions under "positions"/"xyz"/"arr_0"
    .npy  raw array; a leading batch axis of a [B, T, N, 3] array is
          squeezed to [T, N, 3] like the reference (traj_utils.py:35-37)
    .pdb  multi-model ATOM/HETATM records

Coordinates come back as stored: nm for xtc/dcd (the dcd codec converts
from Angstrom to match mdtraj), Angstrom for pdb, as-saved for npz/npy —
the same contract the mdtraj-backed reference exposes.
"""

import io
import os

import numpy as np

__all__ = ["load_traj", "read_pdb_frames"]


def read_pdb_frames(source) -> np.ndarray:
    """Parse a multi-model PDB (path or file-like) -> [T, n_atoms, 3]."""
    if hasattr(source, "read"):
        f = source
        close = False
    else:
        f = open(source)
        close = True
    frames, cur = [], []
    try:
        for line in f:
            if line.startswith("ENDMDL"):
                if cur:
                    frames.append(cur)
                    cur = []
            elif line.startswith(("ATOM", "HETATM")):
                cur.append([float(line[30:38]), float(line[38:46]),
                            float(line[46:54])])
    finally:
        if close:
            f.close()
    if cur:
        frames.append(cur)
    if not frames:
        raise ValueError("no ATOM records found")
    counts = {len(fr) for fr in frames}
    if len(counts) != 1:
        raise ValueError(f"inconsistent atom counts across models: {sorted(counts)}")
    return np.asarray(frames, np.float32)


def load_traj(path: str) -> np.ndarray:
    """Load any supported trajectory format -> [T, n_atoms, 3] float32.

    Raises ValueError for an unsupported extension or a file whose
    contents don't yield a coordinate array.
    """
    ext = os.path.splitext(path)[1].lower()
    if ext == ".xtc":
        from lam_slide_tpu.data.xtc import read_xtc

        return np.asarray(read_xtc(path)[0], np.float32)
    if ext == ".dcd":
        from lam_slide_tpu.data.dcd import read_dcd

        return np.asarray(read_dcd(path)[0], np.float32)
    if ext in (".npz", ".npy"):
        data = np.load(path)
        if hasattr(data, "files"):  # npz archive
            for k in ("positions", "xyz", "arr_0"):
                if k in data.files:
                    arr = np.asarray(data[k], np.float32)
                    break
            else:
                raise ValueError(f"{path}: no positions/xyz/arr_0 key")
        else:
            arr = np.asarray(data, np.float32)
        if arr.ndim == 4:  # [B, T, N, 3] -> first trajectory
            arr = arr[0]
        if arr.ndim != 3 or arr.shape[-1] != 3:
            raise ValueError(f"{path}: expected [T, N, 3], got {arr.shape}")
        return arr
    if ext == ".pdb":
        return read_pdb_frames(path)
    raise ValueError(f"unsupported trajectory format: {path}")
