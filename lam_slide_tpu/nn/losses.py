"""Masked losses as pure functions (reference src/modules/losses.py).

All losses take explicit boolean/float masks and normalize by mask mass, so
they are shape-stable under the static padding the TPU pipeline uses (no
data-dependent shapes → one XLA compilation per dataset).
"""

from typing import Optional

import jax
from jax import numpy as jnp


def _mask_mean(per_item: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    mask = mask.astype(per_item.dtype)
    return jnp.sum(per_item * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """MSE averaged over the feature axis, masked over items (losses.py:5-13)."""
    per_item = jnp.mean(jnp.square(pred - target), axis=-1)
    return _mask_mean(per_item, mask)


def masked_l1(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    per_item = jnp.mean(jnp.abs(pred - target), axis=-1)
    return _mask_mean(per_item, mask)


def masked_huber(
    pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray, delta: float = 1.0
) -> jnp.ndarray:
    diff = jnp.abs(pred - target)
    per_elem = jnp.where(diff <= delta, 0.5 * diff * diff, delta * (diff - 0.5 * delta))
    return _mask_mean(jnp.mean(per_elem, axis=-1), mask)


def masked_norm(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean Euclidean error over valid items (losses.py:27-34)."""
    per_item = safe_norm(pred - target, axis=-1)
    return _mask_mean(per_item, mask)


def masked_cross_entropy(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """CE over integer targets, masked (losses.py:62-72)."""
    n_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(target, n_classes, dtype=logp.dtype)
    if label_smoothing > 0:
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / n_classes
    per_item = -jnp.sum(onehot * logp, axis=-1)
    return _mask_mean(per_item, mask)


def masked_cosine(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """1 - cosine similarity, masked (losses.py:75-82)."""
    pn = pred / jnp.maximum(safe_norm(pred, axis=-1, keepdims=True), 1e-8)
    tn = target / jnp.maximum(safe_norm(target, axis=-1, keepdims=True), 1e-8)
    per_item = 1.0 - jnp.sum(pn * tn, axis=-1)
    return _mask_mean(per_item, mask)


def masked_cosine_v2(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """1 - <pred, target> for already-normalized vectors (losses.py:85-92)."""
    per_item = 1.0 - jnp.sum(pred * target, axis=-1)
    return _mask_mean(per_item, mask)


def safe_norm(
    x: jnp.ndarray, axis: int = -1, keepdims: bool = False, eps: float = 0.0
) -> jnp.ndarray:
    """L2 norm with a well-defined zero gradient at x == 0.

    torch.norm backpropagates a zero subgradient at the origin; naive
    jnp.linalg.norm produces NaN there. Double-where keeps values exact.
    """
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims)
    safe = jnp.where(sq > 0, sq, 1.0)
    return jnp.where(sq > 0, jnp.sqrt(safe + eps), 0.0)


def cdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Euclidean distances [..., N, M] with NaN-free gradients."""
    diff = a[..., :, None, :] - b[..., None, :, :]
    return safe_norm(diff, axis=-1)


def inter_distance(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Squared error between pairwise-distance matrices (losses.py:126-134).

    pred/target: [B, S, D], mask: [B, S] → loss over valid (i, j) pairs.
    """
    pair_mask = (mask[..., :, None] * mask[..., None, :]).astype(jnp.float32)
    dp = cdist(pred, pred)
    dt = cdist(target, target)
    diff = (dp - dt) * pair_mask
    return jnp.sum(jnp.square(diff)) / jnp.maximum(jnp.sum(pair_mask), 1.0)


def inter_distance_huber(
    pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray, delta: float = 1.0
) -> jnp.ndarray:
    """Huber variant of inter_distance (losses.py:37-48)."""
    pair_mask = (mask[..., :, None] * mask[..., None, :]).astype(jnp.float32)
    dp = cdist(pred, pred)
    dt = cdist(target, target)
    diff = jnp.abs(dp - dt)
    per_pair = jnp.where(diff <= delta, 0.5 * diff * diff, delta * (diff - 0.5 * delta))
    return jnp.sum(per_pair * pair_mask) / jnp.maximum(jnp.sum(pair_mask), 1.0)


def inter_distance_relative(
    pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray, relative: bool = True
) -> jnp.ndarray:
    """|Δdist| (optionally relative) variant (losses.py:156-175)."""
    pair_mask = (mask[..., :, None] * mask[..., None, :]).astype(jnp.float32)
    dp = cdist(pred, pred)
    dt = cdist(target, target)
    diff = jnp.abs(dp - dt)
    if relative:
        diff = diff / (dt + 1e-8)
    return jnp.sum(diff * pair_mask) / jnp.maximum(jnp.sum(pair_mask), 1.0)


def similarity(pred: jnp.ndarray, mask: jnp.ndarray, sigma: float = 0.01) -> jnp.ndarray:
    """RBF self-similarity repulsion over upper-triangular pairs (losses.py:112-123)."""
    s = pred.shape[-2]
    triu = jnp.triu(jnp.ones((s, s), dtype=jnp.float32), k=1)
    pair_mask = (mask[..., :, None] * mask[..., None, :]).astype(jnp.float32) * triu
    d = cdist(pred, pred)
    sim = jnp.exp(-jnp.square(d) / (2.0 * sigma**2)) * pair_mask
    return jnp.sum(sim) / jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)


def masked_cosine_v3(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Clamped squared-difference variant (reference MaskedCosineLossV3,
    losses.py:95-109 — despite the name it is an MSE with |diff| clamped)."""
    diff = jnp.maximum(jnp.abs(pred - target), 1e-3)
    per_item = jnp.sum(diff**2, axis=-1)
    return _mask_mean(per_item, mask)


def inter_distance_signed(
    pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Signed (non-squared) pairwise-distance difference (InterDistanceLoss2)."""
    pair_mask = (mask[..., :, None] * mask[..., None, :]).astype(jnp.float32)
    diff = (cdist(pred, pred) - cdist(target, target)) * pair_mask
    return jnp.sum(diff) / jnp.maximum(jnp.sum(pair_mask), 1.0)


def inter_distance_adjacent(
    pred: jnp.ndarray, target: jnp.ndarray, adj_matrix: jnp.ndarray
) -> jnp.ndarray:
    """Squared distance error over an explicit adjacency (bond) matrix
    (InterDistanceLossAdjacent)."""
    adj = adj_matrix.astype(jnp.float32)
    diff = (cdist(pred, pred) - cdist(target, target)) * adj
    return jnp.sum(diff**2) / jnp.maximum(jnp.sum(adj), 1.0)


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch axes (transport/utils.py mean_flat)."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def cross_entropy(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Unmasked mean CE (torch.nn.CrossEntropyLoss default reduction)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per_item = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    return jnp.mean(per_item)


def ade_fde(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
):
    """Average / final displacement error over predicted frames.

    pred/target: [B, T, N, D]; mask: [B, T, N] (optional). Returns per-sample
    (ade[B], fde[B]) matching second_stage/md17.py:163-164 semantics.
    """
    err = safe_norm(pred - target, axis=-1)  # [B, T, N]
    if mask is None:
        ade = jnp.mean(err, axis=(1, 2))
        fde = jnp.mean(err[:, -1], axis=1)
    else:
        m = mask.astype(err.dtype)
        ade = jnp.sum(err * m, axis=(1, 2)) / jnp.maximum(jnp.sum(m, axis=(1, 2)), 1.0)
        fde = jnp.sum(err[:, -1] * m[:, -1], axis=1) / jnp.maximum(jnp.sum(m[:, -1], axis=1), 1.0)
    return ade, fde
