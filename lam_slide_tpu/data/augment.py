"""Host-side geometric augmentations (numpy, explicit RNG).

Numpy port of src/utils/data_utils.py — per-sample random rotations/
translations applied on the host before collation, keeping the jitted
device program augmentation-free and shape-static. RNG is an explicit
``np.random.Generator`` (the reference leans on torch global RNG).
"""

import numpy as np


def random_rotation_matrix(rng: np.random.Generator) -> np.ndarray:
    """Euler-angle 3D rotation (data_utils.py:11-31): Rz(θ)·Ry(φ)·Rx(ψ)."""
    theta = 2 * np.pi * rng.random()
    phi = np.arccos(2 * rng.random() - 1)
    psi = 2 * np.pi * rng.random()
    ct, st = np.cos(theta), np.sin(theta)
    cp, sp = np.cos(phi), np.sin(phi)
    cs, ss = np.cos(psi), np.sin(psi)
    rz = np.array([[ct, -st, 0], [st, ct, 0], [0, 0, 1]])
    ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    rx = np.array([[1, 0, 0], [0, cs, -ss], [0, ss, cs]])
    return (rz @ ry @ rx).astype(np.float32)


def random_rotation_matrices(rng: np.random.Generator, b: int) -> np.ndarray:
    """[b, 3, 3] batch of Euler rotations Rz(θ)Ry(φ)Rx(ψ) — vectorized
    random_rotation_matrix (same per-matrix distribution, batched draws)."""
    theta = 2 * np.pi * rng.random(b)
    phi = np.arccos(2 * rng.random(b) - 1)
    psi = 2 * np.pi * rng.random(b)
    ct, st = np.cos(theta), np.sin(theta)
    cp, sp = np.cos(phi), np.sin(phi)
    cs, ss = np.cos(psi), np.sin(psi)
    z = np.zeros(b)
    o = np.ones(b)
    rz = np.stack([ct, -st, z, st, ct, z, z, z, o], -1).reshape(b, 3, 3)
    ry = np.stack([cp, z, sp, z, o, z, -sp, z, cp], -1).reshape(b, 3, 3)
    rx = np.stack([o, z, z, z, cs, -ss, z, ss, cs], -1).reshape(b, 3, 3)
    return (rz @ ry @ rx).astype(np.float32)


def random_rotation_matrix_2d(rng: np.random.Generator) -> np.ndarray:
    theta = 2 * np.pi * rng.random()
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s], [s, c]], dtype=np.float32)


def rotate(points: np.ndarray, rot: np.ndarray) -> np.ndarray:
    """points [..., D] @ R^T (data_utils.py rotate_point_cloud)."""
    return points @ rot.T


def uniform_rotation_matrix(rng: np.random.Generator) -> np.ndarray:
    """Haar-uniform SO(3) rotation via QR (used for SE(3) trajectory aug)."""
    a = rng.standard_normal((3, 3))
    q, r = np.linalg.qr(a)
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q.astype(np.float32)
