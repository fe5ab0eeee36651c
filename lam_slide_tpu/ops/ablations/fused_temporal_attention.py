"""Fused packed-layout flash attention: QK-norm + RoPE + attention in one kernel.

The DiT's temporal blocks spend as much time relaying data out as computing:
projecting to the head-major [N, H, T, dh] layout flash wants costs four
HBM relayout copies per layer (q/k/v in, attention out — profiled 0.46 ms
of the 1.6 ms temporal block at the 4AA shapes: the copies gather 48-byte
row fragments, ~6% DMA efficiency). This kernel takes q/k/v exactly as
``linear1`` produces them — packed [N, T, D] with heads as contiguous lane
segments — and does everything on-chip:

* per-head RMS statistics via a block-diagonal segment matmul (S ∈ {0,1}),
* RoPE pair rotation via two lane-rolls + a parity select (no permutation
  matrix, no HBM partner tensor),
* per-head flash attention with an unrolled head loop: K/V live in VMEM
  once per program, per-head views are VMEM lane slices instead of HBM
  transposes.

Status: measured SLOWER than the head-major flash path at the 4AA shapes
(dh=24): Mosaic lowers lane slices at non-128-aligned offsets to expensive
shuffle sequences, and they run per (head x q-block) — the avoided HBM
copies cost less than the added VPU work. Kept as an opt-in
(ParallelMLPAttention.fused_temporal) for configurations with 128-aligned
head segments, and as the measured record of why the main path accepts the
transposes (see docs/PERF.md).

Matmul numerics match ops.flash_attention: bf16 (input dtype) MXU operands
with fp32 accumulation, fp32 logits/softmax statistics, attention weights
cast to the value dtype for the AV matmul.

Gradients: custom VJP recomputes through the equivalent packed XLA ops
(ops.packed_attention + ops.attention), so training paths use it too.
No mask support — the factorized DiT axes are never padded (static T/L).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lam_slide_tpu.ops.packed_attention import packed_rmsnorm, packed_rope

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


def _norm_rope(x, seg, seg_t, scale_l, cos_ref, sin_ref, eps, out_dtype):
    """Packed per-head RMSNorm + RoPE on a [t, D] VMEM tile, fp32 math."""
    dh = x.shape[1] // seg.shape[1]
    x32 = x.astype(jnp.float32)
    ms = jax.lax.dot_general(
        x32 * x32, seg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / dh  # [t, H]
    rr = jax.lax.dot_general(
        jax.lax.rsqrt(ms + eps), seg_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [t, D]
    xn = x32 * rr * scale_l
    return (xn * cos_ref[...] + _rope_partner(xn) * sin_ref[...]).astype(out_dtype)


def _kernel(q_ref, k_ref, v_ref, qcos_ref, qsin_ref, cos_ref, sin_ref,
            qs_ref, ks_ref, o_ref, *, n_heads, scale, eps):
    """One (batch row, q-block) program: norm + rope + per-head flash in VMEM.

    q_ref: [1, bq, D] packed bf16; k/v_ref: [1, t, D] (fetched once per batch
    row — the q-block grid axis is inner, so their index map is constant
    along it and Mosaic's pipeline doesn't refetch); qcos/qsin_ref: [bq, D]
    RoPE tables for this q block; cos/sin_ref: [t, D] tables for keys;
    qs/ks_ref: [1, D] fp32 lane scales; o_ref: [1, bq, D].

    The head loop is unrolled and Mosaic allocates each head's [bq, t] score
    matrix its own stack slot, so bq bounds VMEM: 16 heads x bq x t x 4B
    must stay within the ~16MB scoped budget (bq=128 at t=1000 → 8MB).
    """
    _, t, d = k_ref.shape
    dh = d // n_heads
    # segment matrix built in-kernel from iotas (constants can't be captured)
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, n_heads), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (d, n_heads), 1)
    seg = (lane // dh == head).astype(jnp.float32)
    seg_t = seg.T
    dtype = v_ref.dtype

    qn = _norm_rope(q_ref[0], seg, seg_t, qs_ref[0], qcos_ref, qsin_ref, eps, dtype)
    kn = _norm_rope(k_ref[0], seg, seg_t, ks_ref[0], cos_ref, sin_ref, eps, dtype)
    v = v_ref[0]

    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(
            qn[:, sl], kn[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [t, t] fp32
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
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
    else:
        while t % block_q != 0:  # find a divisor block (T is static per model)
            block_q //= 2
    grid_q = t // block_q
    return pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads, scale=scale, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, t, d), q.dtype),
        grid=(n, grid_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((block_q, d), lambda b, i: (i, 0)),
            pl.BlockSpec((block_q, d), lambda b, i: (i, 0)),
            pl.BlockSpec((t, d), lambda b, i: (0, 0)),
            pl.BlockSpec((t, d), lambda b, i: (0, 0)),
            pl.BlockSpec((1, d), lambda b, i: (0, 0)),
            pl.BlockSpec((1, d), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, cos_l.astype(jnp.float32), sin_l.astype(jnp.float32),
      cos_l.astype(jnp.float32), sin_l.astype(jnp.float32),
      q_scale_l.astype(jnp.float32), k_scale_l.astype(jnp.float32))


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
