"""Packed-lane multi-head ops: attention without unpacking heads.

The DiT's factorized axes put TPU-hostile shapes on the fast path: the
spatial axis is L=2..8 tokens with head_dim 16–24, so the standard
[B, H, L, dh] layout turns into thousands of tiny attention problems whose
last dimension wastes 80% of the 128-lane VPU/MXU width (measured: ~1.4 ms
per layer for microscopic FLOPs).

This module keeps activations packed as [N, L, D] with heads as contiguous
D-segments and reformulates every per-head operation as lane-parallel math:

* per-head reductions (QK RMS-norm statistics, attention logits) become a
  matmul with a constant block-diagonal segment matrix  S ∈ {0,1}^{D×H};
* per-head broadcasts (norm factors, softmax weights) become ``@ Sᵀ``;
* RoPE's adjacent-pair rotation becomes one constant permutation-sign
  matmul (P swaps even/odd lanes with sign) plus elementwise cos/sin.

Everything lowers to a few small MXU matmuls + fused elementwise VPU ops on
[N, ·, 384]-shaped tensors — no reshapes through the head axis, no padding
of a 24-wide trailing dim to 128. Redundant FLOPs (D vs dh per head) are
~16x but amount to microseconds; the win is layout.
"""

import functools
from typing import Optional, Tuple

import jax
import numpy as np
from jax import numpy as jnp


@functools.lru_cache(maxsize=None)
def _segment_matrix(d: int, n_heads: int) -> np.ndarray:
    """S [D, H]: S[i, h] = 1 iff lane i belongs to head h."""
    dh = d // n_heads
    s = np.zeros((d, n_heads), np.float32)
    for h in range(n_heads):
        s[h * dh : (h + 1) * dh, h] = 1.0
    return s


@functools.lru_cache(maxsize=None)
def _pair_swap_matrix(d: int) -> np.ndarray:
    """P [D, D]: x @ P gives (-x_odd, x_even) interleaved — the RoPE partner."""
    p = np.zeros((d, d), np.float32)
    for i in range(0, d, 2):
        p[i + 1, i] = -1.0  # even output lane ← -odd input
        p[i, i + 1] = 1.0   # odd output lane ← +even input
    return p


def lane_rope_tables(
    cos: jnp.ndarray, sin: jnp.ndarray, n_heads: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand per-position [n, dh/2] RoPE tables to packed lanes [n, D].

    Lane layout per head: pairs (even, odd) share an angle — repeat each
    angle twice, tile over heads.
    """
    rep = jnp.repeat(cos, 2, axis=-1)  # [n, dh]
    cos_l = jnp.tile(rep, (1, n_heads))
    rep = jnp.repeat(sin, 2, axis=-1)
    sin_l = jnp.tile(rep, (1, n_heads))
    return cos_l, sin_l


def packed_rope(x: jnp.ndarray, cos_l: jnp.ndarray, sin_l: jnp.ndarray) -> jnp.ndarray:
    """RoPE in packed lanes: x [..., n, D]; cos_l/sin_l [n, D] (fp32 math)."""
    d = x.shape[-1]
    p = jnp.asarray(_pair_swap_matrix(d))
    x32 = x.astype(jnp.float32)
    partner = x32 @ p
    return (x32 * cos_l + partner * sin_l).astype(x.dtype)


def packed_rmsnorm(
    x: jnp.ndarray, n_heads: int, scale: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """Per-head RMSNorm in packed lanes (QKNorm semantics, fp32 stats).

    x: [..., D]; scale: [dh] learned per-lane scale shared across heads,
    or an already-tiled [D] lane scale.
    """
    d = x.shape[-1]
    dh = d // n_heads
    s = jnp.asarray(_segment_matrix(d, n_heads))
    x32 = x.astype(jnp.float32)
    ms = (x32 * x32) @ s / dh  # [..., H]
    rr = jax.lax.rsqrt(ms + eps) @ s.T  # broadcast back to lanes
    scale = scale.astype(jnp.float32)
    scale_l = scale if scale.shape[-1] == d else jnp.tile(scale, (n_heads,))
    return (x32 * rr * scale_l).astype(x.dtype)


def packed_small_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_heads: int,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Multi-head attention over a tiny token axis, heads packed in lanes.

    q, k, v: [N, L, D]; returns [N, L, D] (same packing). Intended for
    L ≤ ~8: materializes [N, L, L, ·] intermediates.
    """
    n, l, d = q.shape
    dh = d // n_heads
    scale = dh**-0.5 if scale is None else scale
    s = jnp.asarray(_segment_matrix(d, n_heads), q.dtype)

    # Unrolled L x L pairs: every intermediate is [N, D] or [N, H] — nothing
    # of shape [N, L, L, D] ever hits HBM (matters once N = B*T is large).
    logits = [
        [
            jax.lax.dot_general(
                q[:, i] * k[:, j], s, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
            for j in range(l)
        ]
        for i in range(l)
    ]
    out_rows = []
    for i in range(l):
        row = jnp.stack(logits[i], axis=-1)  # [N, H, L]
        wgt = jax.nn.softmax(row, axis=-1)
        acc = None
        for j in range(l):
            w_lanes = jax.lax.dot_general(
                wgt[..., j].astype(v.dtype), s.T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            term = w_lanes * v[:, j].astype(jnp.float32)
            acc = term if acc is None else acc + term
        out_rows.append(acc)
    return jnp.stack(out_rows, axis=1).astype(v.dtype)


def headmajor_rmsnorm(
    x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """Per-head RMSNorm in head-major layout: x [..., T, dh], scale [dh].

    Same math (fp32 stats, same rounding points) as ``packed_rmsnorm`` on
    the packed layout, but expressed as a pure last-axis reduction +
    elementwise ops — no segment-matrix matmul, so XLA can fuse it into the
    surrounding pack→head-major transpose copy instead of running separate
    HBM passes (the packed version's ``(x*x) @ S`` dot blocks that fusion).
    """
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    rr = jax.lax.rsqrt(ms + eps)
    return (x32 * rr * scale.astype(jnp.float32)).astype(x.dtype)


def headmajor_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """RoPE in head-major layout: x [..., T, dh]; cos/sin [T, dh/2] fp32.

    Pair convention identical to ``packed_rope``/``_pair_swap_matrix``:
    partner lane pairs are (-x_odd, x_even) interleaved, each angle repeated
    for both lanes of its pair. Elementwise (no pair-swap matmul) so it
    fuses with adjacent copies.
    """
    dh = x.shape[-1]
    x32 = x.astype(jnp.float32)
    x2 = x32.reshape(*x.shape[:-1], dh // 2, 2)
    partner = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(x32.shape)
    rep_cos = jnp.repeat(cos, 2, axis=-1)  # [T, dh]
    rep_sin = jnp.repeat(sin, 2, axis=-1)
    return (x32 * rep_cos + partner * rep_sin).astype(x.dtype)
