"""Trajectory-forecasting evaluation protocols.

Implements the exact measurement protocols the reference defines in its
test_steps (SURVEY.md §6): mean-over-K ADE/FDE (MD17, K=5, GeoTDM protocol,
second_stage/md17.py:139-179) and min-over-K ADE/FDE (pedestrian K=20 /
NBA K=60, second_stage/pedestrian.py:149-239). All are masked so the static
entity padding never contaminates the metric, and the K repeats run as a
vmapped axis inside one jitted program.
"""

from typing import Dict, Optional, Tuple

import jax
from jax import numpy as jnp

from lam_slide_tpu.nn.losses import safe_norm


def zero_target_frames(batch: Dict[str, jnp.ndarray], cond_end: int, keys=("pos", "atom")):
    """Test-protocol leak guard (second_stage/md17.py:148-156): target frames
    are zeroed before sampling so conditioning cannot peek at them."""
    out = dict(batch)
    for k in keys:
        if k in out:
            out[k] = out[k].at[:, cond_end:].set(0)
    return out


def assert_no_target_leak(batch: Dict[str, jnp.ndarray], cond_end: int, keys=("pos", "atom")):
    for k in keys:
        if k in batch:
            total = jnp.abs(batch[k][:, cond_end:]).sum()
            if float(total) != 0.0:
                raise AssertionError(f"target frames of {k!r} are nonzero — conditioning leak")


def masked_ade_fde(
    pred_pos: jnp.ndarray,
    true_pos: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample ADE/FDE over prediction frames.

    pred_pos/true_pos: [B, Tp, N, D]; mask: [B, Tp, N] → (ade[B], fde[B]).
    ADE = mean_t,n ||Δ||; FDE = mean_n ||Δ_T||  (second_stage/md17.py:163-164).
    """
    err = safe_norm(pred_pos - true_pos, axis=-1)
    if mask is None:
        return jnp.mean(err, axis=(1, 2)), jnp.mean(err[:, -1], axis=1)
    m = mask.astype(err.dtype)
    ade = jnp.sum(err * m, axis=(1, 2)) / jnp.maximum(jnp.sum(m, axis=(1, 2)), 1.0)
    fde = jnp.sum(err[:, -1] * m[:, -1], axis=1) / jnp.maximum(jnp.sum(m[:, -1], axis=1), 1.0)
    return ade, fde


def mean_over_k_ade_fde(pred_pos_k, true_pos, mask=None):
    """MD17 protocol: mean of per-repeat ADE/FDE over K samples.

    pred_pos_k: [K, B, Tp, N, D] → (ade[B], fde[B]).
    """
    ade_k, fde_k = jax.vmap(lambda p: masked_ade_fde(p, true_pos, mask))(pred_pos_k)
    return jnp.mean(ade_k, axis=0), jnp.mean(fde_k, axis=0)


def min_over_k_ade_fde(pred_pos_k, true_pos, mask=None):
    """Best-of-K at the scene level: min over K of per-sample ADE/FDE."""
    ade_k, fde_k = jax.vmap(lambda p: masked_ade_fde(p, true_pos, mask))(pred_pos_k)
    return jnp.min(ade_k, axis=0), jnp.min(fde_k, axis=0)


def per_entity_min_k_ade_fde(
    pred_pos_k: jnp.ndarray,
    true_pos: jnp.ndarray,
    entity_mask: jnp.ndarray,
    num_runs: Optional[int] = None,
    fpc: bool = False,
    kmeans_iters: int = 20,
):
    """Pedestrian/NBA test protocol (second_stage/pedestrian.py:148-226).

    Each *entity trajectory* is scored independently: min-over-K of its ADE
    and (independently) FDE. Without FPC the first ``num_runs`` of the K
    samples are used; with FPC the K final positions are clustered into
    ``num_runs`` k-means clusters and, per cluster, the sample nearest the
    center is selected before taking the min (SocialVAE FPC).

    pred_pos_k: [K, B, Tp, N, D]; true_pos: [B, Tp, N, D];
    entity_mask: [B, N] → (ade, fde): masked means over all real entities.
    """
    k, b, tp, n, d = pred_pos_k.shape
    num_runs = num_runs or k
    # [B*N, K, Tp, D]
    pred = pred_pos_k.transpose(1, 3, 0, 2, 4).reshape(b * n, k, tp, d)
    true = true_pos.transpose(0, 2, 1, 3).reshape(b * n, 1, tp, d)
    err = safe_norm(pred - true, axis=-1)  # [B*N, K, Tp]
    ade_k = jnp.mean(err, axis=-1)
    fde_k = err[..., -1]

    if fpc:
        from lam_slide_tpu.ops.kmeans import batched_kmeans

        finals = pred[:, :, -1]  # [B*N, K, D]
        centers, _ = batched_kmeans(finals, num_runs, kmeans_iters)
        dis = jnp.linalg.norm(finals[:, :, None] - centers[:, None], axis=-1)  # [M, K, C]
        sel = jnp.argmin(dis, axis=1)  # [M, C] sample index per cluster
        ade_sel = jnp.take_along_axis(ade_k, sel, axis=1)
        fde_sel = jnp.take_along_axis(fde_k, sel, axis=1)
    else:
        ade_sel = ade_k[:, :num_runs]
        fde_sel = fde_k[:, :num_runs]

    ade_e = jnp.min(ade_sel, axis=1)
    fde_e = jnp.min(fde_sel, axis=1)
    m = entity_mask.reshape(b * n).astype(ade_e.dtype)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(ade_e * m) / denom, jnp.sum(fde_e * m) / denom
