"""Rigid-body (SE(3)) transforms as JAX pytrees.

Functional replacement for the reference's 1.3k-LoC torch ``Rotation`` /
``Rigid`` class pair (src/utils/rigid_utils.py:267,753). A transform is a
flax.struct pytree of a rotation-matrix stack ``rots [..., 3, 3]`` and a
translation stack ``trans [..., 3]`` — it vmaps, jits, and shards like any
other array pair, so no hand-unrolled matmuls or AMP workarounds are
needed: math runs in fp32 on the MXU via plain einsums.

Quaternion helpers are provided for checkpoint/IO parity; all compute paths
use matrices.
"""

from typing import Tuple

import jax
from flax import struct
from jax import numpy as jnp


@struct.dataclass
class Rigid:
    rots: jnp.ndarray  # [..., 3, 3]
    trans: jnp.ndarray  # [..., 3]

    # -- constructors ------------------------------------------------------

    @staticmethod
    def identity(batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> "Rigid":
        rots = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        trans = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return Rigid(rots, trans)

    @staticmethod
    def from_3_points(
        p_neg_x_axis: jnp.ndarray,
        origin: jnp.ndarray,
        p_xy_plane: jnp.ndarray,
        eps: float = 1e-8,
    ) -> "Rigid":
        """Gram–Schmidt frame construction (AlphaFold alg. 21;
        rigid_utils.py:1093-1136): e0 = origin − p_neg_x_axis,
        e1 = p_xy_plane − origin orthogonalized against e0, e2 = e0 × e1;
        basis vectors form the matrix columns, origin the translation."""
        e0 = origin - p_neg_x_axis
        e1 = p_xy_plane - origin
        denom = jnp.sqrt(jnp.sum(e0**2, axis=-1, keepdims=True) + eps)
        e0 = e0 / denom
        dot = jnp.sum(e0 * e1, axis=-1, keepdims=True)
        e1 = e1 - e0 * dot
        denom = jnp.sqrt(jnp.sum(e1**2, axis=-1, keepdims=True) + eps)
        e1 = e1 / denom
        e2 = jnp.cross(e0, e1)
        rots = jnp.stack([e0, e1, e2], axis=-1)  # columns are the basis
        return Rigid(rots, origin)

    @staticmethod
    def from_tensor_4x4(t: jnp.ndarray) -> "Rigid":
        return Rigid(t[..., :3, :3], t[..., :3, 3])

    def to_tensor_4x4(self) -> jnp.ndarray:
        out = jnp.zeros((*self.shape, 4, 4), dtype=self.rots.dtype)
        out = out.at[..., :3, :3].set(self.rots)
        out = out.at[..., :3, 3].set(self.trans)
        return out.at[..., 3, 3].set(1.0)

    # -- algebra -----------------------------------------------------------

    @property
    def shape(self):
        return self.trans.shape[:-1]

    def compose(self, other: "Rigid") -> "Rigid":
        """self ∘ other: apply ``other`` first in local frame, then self."""
        rots = jnp.einsum("...ij,...jk->...ik", self.rots, other.rots, precision=jax.lax.Precision.HIGHEST)
        trans = self.apply(other.trans)
        return Rigid(rots, trans)

    def apply(self, points: jnp.ndarray) -> jnp.ndarray:
        """Rotate+translate points [..., 3]."""
        return jnp.einsum("...ij,...j->...i", self.rots, points,
                          precision=jax.lax.Precision.HIGHEST) + self.trans

    def invert(self) -> "Rigid":
        inv_rots = jnp.swapaxes(self.rots, -1, -2)
        inv_trans = -jnp.einsum("...ij,...j->...i", inv_rots, self.trans,
                                precision=jax.lax.Precision.HIGHEST)
        return Rigid(inv_rots, inv_trans)

    def invert_apply(self, points: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("...ji,...j->...i", self.rots, points - self.trans,
                          precision=jax.lax.Precision.HIGHEST)

    def scale_translation(self, factor) -> "Rigid":
        return Rigid(self.rots, self.trans * factor)

    # -- structural ops (replace torch indexing/cat/map) -------------------

    def __getitem__(self, idx) -> "Rigid":
        if not isinstance(idx, tuple):
            idx = (idx,)
        return Rigid(self.rots[idx + (slice(None), slice(None))], self.trans[idx + (slice(None),)])

    @staticmethod
    def cat(rigids, axis: int = 0) -> "Rigid":
        """Concatenate along a batch axis (negative axes count from the last
        batch dim, as in the reference's Rigid.cat)."""
        rot_axis = axis if axis >= 0 else axis - 2
        tr_axis = axis if axis >= 0 else axis - 1
        return Rigid(
            jnp.concatenate([r.rots for r in rigids], axis=rot_axis),
            jnp.concatenate([r.trans for r in rigids], axis=tr_axis),
        )

    def unsqueeze(self, axis: int) -> "Rigid":
        rot_axis = axis if axis >= 0 else axis - 2
        tr_axis = axis if axis >= 0 else axis - 1
        return Rigid(
            jnp.expand_dims(self.rots, rot_axis), jnp.expand_dims(self.trans, tr_axis)
        )


# ---------------------------------------------------------------------------
# Quaternion interop (reference Rotation quaternion pathway)
# ---------------------------------------------------------------------------


def quat_to_rot(quat: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3]."""
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = (quat[..., i] for i in range(4))
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(*quat.shape[:-1], 3, 3)


def rot_to_quat(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (w, x, y, z).

    Eigen-decomposition of the K-matrix (robust for all traces), matching
    the reference's implementation strategy (rigid_utils.py rot_to_quat).
    """
    m = rot
    xx, xy, xz = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    yx, yy, yz = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    zx, zy, zz = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    k = jnp.stack(
        [
            xx + yy + zz, zy - yz, xz - zx, yx - xy,
            zy - yz, xx - yy - zz, xy + yx, xz + zx,
            xz - zx, xy + yx, yy - xx - zz, yz + zy,
            yx - xy, xz + zx, yz + zy, zz - xx - yy,
        ],
        axis=-1,
    ).reshape(*m.shape[:-2], 4, 4) / 3.0
    _, vecs = jnp.linalg.eigh(k)
    quat = vecs[..., -1]  # eigenvector of the largest eigenvalue
    # canonical sign: w >= 0
    return quat * jnp.sign(quat[..., :1] + 1e-20)
