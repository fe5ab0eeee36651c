"""Fused packed-layout flash attention: QK-norm + RoPE + attention in one kernel.

The DiT's temporal blocks spent more time relaying out data than computing:
projecting to the head-major [N, H, T, dh] layout flash wants costs three
~0.8ms strided copies per layer (profiled), and the packed QK RMS-norm +
RoPE prework adds several full HBM passes. This kernel takes q/k/v exactly
as ``linear1`` produces them — packed [N, T, D] with heads as contiguous
lane segments — and does everything on-chip:

* per-head RMS statistics via a block-diagonal segment matmul (S ∈ {0,1}),
* RoPE pair rotation via two lane-rolls + a parity select (no permutation
  matrix, no HBM partner tensor),
* per-head flash attention with an unrolled head loop, K/V resident in
  VMEM once per (n, q-block) program — heads reuse them for free.

Gradients: custom VJP recomputes through the equivalent packed XLA ops
(ops.packed_attention + ops.attention), so training paths use it too.
No mask support — the factorized DiT axes are never padded (static T/L).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lam_slide_tpu.ops.packed_attention import (
    _segment_matrix,
    lane_rope_tables,
    packed_rmsnorm,
    packed_rope,
)

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _rope_partner(x):
    """(-x_odd, x_even) interleaved, via two lane rolls + parity select.

    pltpu.roll requires non-negative shifts: roll by d-1 ≡ roll by -1.
    """
    d = x.shape[1]
    left = pltpu.roll(x, d - 1, axis=1)  # lane i -> value of lane i+1
    right = pltpu.roll(x, 1, axis=1)     # lane i -> value of lane i-1
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    return jnp.where(lane % 2 == 0, -left, right)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, n_heads, scale):
    """Attention over the packed [bq, D] / [t, D] layout, head loop unrolled.

    Inputs arrive already QK-normed and RoPE'd (the packed prework is one
    XLA-fused HBM pass); this kernel only avoids the head-major relayout.
    """
    _, bq, d = q_ref.shape
    t = k_ref.shape[1]
    dh = d // n_heads
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [bq, t]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(p, v[:, sl], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (out / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_heads", "scale", "eps", "block_q")
)
def _fused_forward(q, k, v, cos_l, sin_l, q_scale_l, k_scale_l,
                   n_heads, scale, eps=1e-6, block_q=128):
    """q/k/v: [N, T, D] packed; cos_l/sin_l: [T, D] lane tables;
    q/k_scale_l: [1, D]. -> [N, T, D]."""
    n, t, d = q.shape
    if t <= block_q:
        block_q = t
        grid_q = 1
    else:
        while t % block_q != 0:  # find a divisor block (T is static per model)
            block_q //= 2
        grid_q = t // block_q
    # packed prework (one fused XLA pass each for q and k)
    qn = packed_rope(packed_rmsnorm(q, n_heads, q_scale_l[0], eps), cos_l, sin_l)
    kn = packed_rope(packed_rmsnorm(k, n_heads, k_scale_l[0], eps), cos_l, sin_l)
    return pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((n, t, d), q.dtype),
        grid=(n, grid_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        interpret=jax.default_backend() != "tpu",
    )(qn, kn, v)


def _reference_packed(q, k, v, cos_l, sin_l, q_scale_l, k_scale_l, n_heads, scale, eps):
    """Equivalent XLA path for the backward pass (and numerics tests)."""
    from lam_slide_tpu.ops.attention import xla_attention

    # full [D] lane scales: gradients must flow into every head's lanes
    qn = packed_rope(packed_rmsnorm(q, n_heads, q_scale_l[0], eps), cos_l, sin_l)
    kn = packed_rope(packed_rmsnorm(k, n_heads, k_scale_l[0], eps), cos_l, sin_l)
    n, t, d = q.shape
    dh = d // n_heads

    def heads(x):
        return x.reshape(n, t, n_heads, dh).transpose(0, 2, 1, 3)

    out = xla_attention(heads(qn), heads(kn), heads(v), scale=scale)
    return out.transpose(0, 2, 1, 3).reshape(n, t, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_temporal_attention(q, k, v, cos_l, sin_l, q_scale_l, k_scale_l,
                             n_heads, scale, eps=1e-6):
    """Public fused op. q/k/v [N, T, D] packed; scale tables [1, D]."""
    return _fused_forward(q, k, v, cos_l, sin_l, q_scale_l, k_scale_l,
                          n_heads, scale, eps)


def _fwd(q, k, v, cos_l, sin_l, q_scale_l, k_scale_l, n_heads, scale, eps):
    out = _fused_forward(q, k, v, cos_l, sin_l, q_scale_l, k_scale_l,
                         n_heads, scale, eps)
    return out, (q, k, v, cos_l, sin_l, q_scale_l, k_scale_l)


def _bwd(n_heads, scale, eps, res, g):
    q, k, v, cos_l, sin_l, q_scale_l, k_scale_l = res
    f = lambda q_, k_, v_, qs_, ks_: _reference_packed(
        q_, k_, v_, cos_l, sin_l, qs_, ks_, n_heads, scale, eps)
    _, vjp = jax.vjp(f, q, k, v, q_scale_l, k_scale_l)
    dq, dk, dv, dqs, dks = vjp(g)
    return dq, dk, dv, None, None, dqs, dks


fused_temporal_attention.defvjp(_fwd, _bwd)
