"""Differentiable all-atom geometry ops (JAX).

Parity target: src/modules/geometry.py (mdgen/OpenFold all-atom pipeline):
atom14↔atom37 conversion, backbone frames from N/CA/C, atom37→torsion
sin/cos extraction, and torsion→frames→atom14 forward kinematics. Every op
is pure jnp over static-shape arrays (gathers vectorize over batch via
take_along_axis), jit/vmap/grad-safe, and used inside the peptide losses
(frame-aligned position loss + torsion cosine loss).
"""

from typing import Optional, Tuple

import jax
import numpy as np
from jax import numpy as jnp

from lam_slide_tpu.geometry import constants as pc
from lam_slide_tpu.geometry.rigid import Rigid


def _gather_atoms(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather along the atom axis (-2): arr [..., A, 3], idx [..., A']."""
    return jnp.take_along_axis(arr, idx[..., None].astype(jnp.int32), axis=-2)


def atom14_to_atom37(
    atom14: jnp.ndarray, aatype: jnp.ndarray, atom14_mask: Optional[jnp.ndarray] = None
):
    """[..., N, 14, 3] -> [..., N, 37, 3] (geometry.py:14-32)."""
    idx = jnp.asarray(pc.RESTYPE_ATOM37_TO_ATOM14)[aatype]  # [..., N, 37]
    mask37 = jnp.asarray(pc.RESTYPE_ATOM37_MASK)[aatype]
    atom37 = _gather_atoms(atom14, idx) * mask37[..., None]
    if atom14_mask is not None:
        m = jnp.take_along_axis(atom14_mask, idx.astype(jnp.int32), axis=-1) * mask37
        return atom37, m
    return atom37


def atom37_to_atom14(
    atom37: jnp.ndarray, aatype: jnp.ndarray, atom37_mask: Optional[jnp.ndarray] = None
):
    """[..., N, 37, 3] -> [..., N, 14, 3] (geometry.py:35-53)."""
    idx = jnp.asarray(pc.RESTYPE_ATOM14_TO_ATOM37)[aatype]
    mask14 = jnp.asarray(pc.RESTYPE_ATOM14_MASK)[aatype]
    atom14 = _gather_atoms(atom37, idx) * mask14[..., None]
    if atom37_mask is not None:
        m = jnp.take_along_axis(atom37_mask, idx.astype(jnp.int32), axis=-1) * mask14
        return atom14, m
    return atom14


_FLIP = np.diag([-1.0, 1.0, -1.0]).astype(np.float32)


def atom14_to_frames(atom14: jnp.ndarray) -> Rigid:
    """Backbone frames from N/CA/C with the mdgen axis flip (geometry.py:212-227).

    atom14: [..., N, 14, 3] -> Rigid with batch shape [..., N].
    """
    n = atom14[..., pc.ATOM_ORDER["N"], :]
    ca = atom14[..., pc.ATOM_ORDER["CA"], :]
    c = atom14[..., pc.ATOM_ORDER["C"], :]
    frames = Rigid.from_3_points(c, ca, n)
    flip = jnp.asarray(_FLIP)
    return frames.compose(Rigid(jnp.broadcast_to(flip, frames.rots.shape), jnp.zeros_like(frames.trans)))


def atom37_to_torsions(
    all_atom_positions: jnp.ndarray,
    aatype: jnp.ndarray,
    all_atom_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """7 torsions (omega, phi, psi, chi1-4) as sin/cos + validity mask.

    all_atom_positions: [..., N, 37, 3]; aatype: [..., N] ->
    (torsions [..., N, 7, 2], mask [..., N, 7]). (geometry.py:80-196)
    """
    if all_atom_mask is None:
        all_atom_mask = jnp.asarray(pc.RESTYPE_ATOM37_MASK)[aatype]

    pad_pos = jnp.zeros_like(all_atom_positions[..., :1, :, :])
    prev_pos = jnp.concatenate([pad_pos, all_atom_positions[..., :-1, :, :]], axis=-3)
    pad_mask = jnp.zeros_like(all_atom_mask[..., :1, :])
    prev_mask = jnp.concatenate([pad_mask, all_atom_mask[..., :-1, :]], axis=-2)

    # backbone torsion atom quadruples
    pre_omega_pos = jnp.concatenate(
        [prev_pos[..., 1:3, :], all_atom_positions[..., :2, :]], axis=-2
    )
    phi_pos = jnp.concatenate(
        [prev_pos[..., 2:3, :], all_atom_positions[..., :3, :]], axis=-2
    )
    psi_pos = jnp.concatenate(
        [all_atom_positions[..., :3, :], all_atom_positions[..., 4:5, :]], axis=-2
    )
    pre_omega_mask = jnp.prod(prev_mask[..., 1:3], axis=-1) * jnp.prod(
        all_atom_mask[..., :2], axis=-1
    )
    phi_mask = prev_mask[..., 2] * jnp.prod(all_atom_mask[..., :3], axis=-1)
    psi_mask = jnp.prod(all_atom_mask[..., :3], axis=-1) * all_atom_mask[..., 4]

    # chi quadruples via per-residue atom indices
    chi_idx = jnp.asarray(pc.CHI_ATOM_INDICES)[aatype]  # [..., N, 4, 4]
    flat_idx = chi_idx.reshape(*chi_idx.shape[:-2], 16)
    chis_pos = _gather_atoms(all_atom_positions, flat_idx).reshape(
        *chi_idx.shape[:-2], 4, 4, 3
    )
    chis_atom_mask = jnp.take_along_axis(
        all_atom_mask, flat_idx.astype(jnp.int32), axis=-1
    ).reshape(*chi_idx.shape[:-2], 4, 4)
    chis_mask = jnp.asarray(pc.CHI_ANGLES_MASK_ARR)[aatype] * jnp.prod(
        chis_atom_mask, axis=-1
    )

    torsions_pos = jnp.concatenate(
        [
            pre_omega_pos[..., None, :, :],
            phi_pos[..., None, :, :],
            psi_pos[..., None, :, :],
            chis_pos,
        ],
        axis=-3,
    )  # [..., N, 7, 4, 3]
    torsions_mask = jnp.concatenate(
        [
            pre_omega_mask[..., None],
            phi_mask[..., None],
            psi_mask[..., None],
            chis_mask,
        ],
        axis=-1,
    )

    frames = Rigid.from_3_points(
        torsions_pos[..., 1, :], torsions_pos[..., 2, :], torsions_pos[..., 0, :], eps=1e-8
    )
    fourth_rel = frames.invert_apply(torsions_pos[..., 3, :])
    sin_cos = jnp.stack([fourth_rel[..., 2], fourth_rel[..., 1]], axis=-1)
    denom = jnp.sqrt(jnp.sum(sin_cos**2, axis=-1, keepdims=True) + 1e-8)
    sin_cos = sin_cos / denom
    # psi sign flip (geometry.py:189-196)
    sign = jnp.asarray([1.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0])[..., :, None]
    return sin_cos * sign, torsions_mask


def torsion_angles_to_frames(bb: Rigid, alpha: jnp.ndarray, aatype: jnp.ndarray) -> Rigid:
    """Backbone frame + 7 torsions -> 8 global group frames (geometry.py:284-328).

    bb: Rigid [..., N]; alpha: [..., N, 7, 2] sin/cos; -> Rigid [..., N, 8].
    """
    default_4x4 = jnp.asarray(pc.RESTYPE_RIGID_GROUP_DEFAULT_FRAME)[aatype]  # [..., N, 8, 4, 4]
    default_r = Rigid.from_tensor_4x4(default_4x4)

    bb_rot = jnp.zeros((*alpha.shape[:-2], 1, 2), alpha.dtype).at[..., 1].set(1.0)
    alpha8 = jnp.concatenate([bb_rot, alpha], axis=-2)  # [..., N, 8, 2]

    sin_a = alpha8[..., 0]
    cos_a = alpha8[..., 1]
    zeros = jnp.zeros_like(sin_a)
    ones = jnp.ones_like(sin_a)
    # x-axis rotation by the torsion angle (geometry.py:306-317)
    rots = jnp.stack(
        [
            ones, zeros, zeros,
            zeros, cos_a, -sin_a,
            zeros, sin_a, cos_a,
        ],
        axis=-1,
    ).reshape(*sin_a.shape, 3, 3)

    all_frames = default_r.compose(Rigid(rots, jnp.zeros((*sin_a.shape, 3), alpha.dtype)))

    chi1 = all_frames[..., 4]
    chi2 = chi1.compose(all_frames[..., 5])
    chi3 = chi2.compose(all_frames[..., 6])
    chi4 = chi3.compose(all_frames[..., 7])
    all_to_bb = Rigid.cat(
        [
            all_frames[..., :5],
            chi2.unsqueeze(-1),
            chi3.unsqueeze(-1),
            chi4.unsqueeze(-1),
        ],
        axis=-1,
    )
    return bb.unsqueeze(-1).compose(all_to_bb)


def frames_to_atom14(frames8: Rigid, aatype: jnp.ndarray) -> jnp.ndarray:
    """8 global group frames -> idealized atom14 coords (geometry.py:231-262)."""
    group_idx = jnp.asarray(pc.RESTYPE_ATOM14_TO_RIGID_GROUP)[aatype]  # [..., N, 14]
    group_mask = jax.nn.one_hot(group_idx, 8, dtype=frames8.rots.dtype)  # [..., N, 14, 8]
    # select each atom's frame: weighted sum over the 8 group slots
    hp = jax.lax.Precision.HIGHEST
    rots = jnp.einsum("...gij,...ag->...aij", frames8.rots, group_mask, precision=hp)
    trans = jnp.einsum("...gi,...ag->...ai", frames8.trans, group_mask, precision=hp)
    atom_frames = Rigid(rots, trans)
    lit = jnp.asarray(pc.RESTYPE_ATOM14_RIGID_GROUP_POSITIONS)[aatype]  # [..., N, 14, 3]
    mask = jnp.asarray(pc.RESTYPE_ATOM14_MASK)[aatype][..., None]
    return atom_frames.apply(lit) * mask


def frames_torsions_to_atom14(bb: Rigid, torsions: jnp.ndarray, aatype: jnp.ndarray):
    """Full FK: backbone frames + torsions -> atom14 (geometry.py:66-77)."""
    return frames_to_atom14(torsion_angles_to_frames(bb, torsions, aatype), aatype)


def frames_torsions_to_atom37(bb: Rigid, torsions: jnp.ndarray, aatype: jnp.ndarray):
    return atom14_to_atom37(frames_torsions_to_atom14(bb, torsions, aatype), aatype)
