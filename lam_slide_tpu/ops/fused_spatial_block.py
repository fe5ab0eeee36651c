"""One-pass Pallas kernel for the DiT's small-L spatial block.

The spatial axis of the factorized DiT is L = 2..8 latent tokens
(4AA: L=2), so the whole ParallelMLPAttention block —

    linear1 (QKV ∥ MLP-up) → per-head QK RMS-norm → RoPE →
    L×L packed-lane attention → concat(attn, gelu(mlp)) → linear2

— is HBM-bound: at bench shapes the [B·T·L, 3D+M] linear1 output alone
is ~61 MB of intermediate traffic per layer, written and re-read between
XLA fusions (docs/PERF.md "other fusions"). This kernel runs the entire
chain on a row-block of frames in VMEM: x is read once, the output
written once, and both weight matrices stay resident across the grid
(constant index_map). The packed-lane formulation (segment matrix S,
pair-swap matrix P — ops/packed_attention.py) is kept: every per-head op
is a small MXU matmul, nothing 24-wide ever needs a 128-lane pad.

Numerics mirror the unfused path op-for-op (bf16 per-op rounding, fp32
statistics/softmax/accumulation) — parity pinned at ulp level by
tests/test_fused_spatial.py. Backward: custom VJP = jax.vjp of the
reference composition, so gradients equal the unfused path's.

Reference semantics: mmdit.py:215-249 (ParallelMLPAttentionV2) +
mmdit.py:127-148 (QKNorm) + mmdit.py:75-90 (RoPE).
"""

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from lam_slide_tpu.ops.packed_attention import (
    _pair_swap_matrix,
    _segment_matrix,
    packed_rmsnorm,
    packed_rope,
    packed_small_attention,
)

# Tests flip this to exercise the kernel through the interpreter off-TPU.
FORCE_KERNEL = False


def _use_kernel() -> bool:
    # OPT-IN (measured on-chip 2026-08-17, tools/measure_fused_ab.py): with
    # both fused families active the bench headline is 0.95x the XLA
    # composition (515 vs 539 steps/s at B=8) — XLA's own elementwise
    # fusion beats the hand kernel at these shapes, so the kernels are off
    # by default. Enable with LAM_SLIDE_FUSED=1 (A/B, other shape regimes);
    # LAM_SLIDE_NO_FUSED_SPATIAL=1 vetoes just this family within an
    # LAM_SLIDE_FUSED=1 session.
    if os.environ.get("LAM_SLIDE_NO_FUSED") == "1":
        return False
    if os.environ.get("LAM_SLIDE_NO_FUSED_SPATIAL") == "1":
        return False
    if FORCE_KERNEL:
        return True
    return (os.environ.get("LAM_SLIDE_FUSED") == "1"
            and jax.default_backend() == "tpu")


def _reference_spatial_block(x, w1, b1, q_scale, k_scale, w2, b2, cos_l,
                             sin_l, n_heads, scale, eps=1e-6):
    """The unfused composition (exactly ParallelMLPAttention's small-axis
    path, models/latent_dit.py); also the VJP primal."""
    d = w2.shape[1]
    dtype = x.dtype
    w1 = w1.astype(dtype)
    b1 = b1.astype(dtype)
    xw = jax.lax.dot_general(x, w1, (((x.ndim - 1,), (0,)), ((), ()))) + b1
    q, k, v, mlp = (xw[..., :d], xw[..., d:2 * d], xw[..., 2 * d:3 * d],
                    xw[..., 3 * d:])
    q = packed_rmsnorm(q, n_heads, q_scale, eps)
    k = packed_rmsnorm(k, n_heads, k_scale, eps)
    q = packed_rope(q, cos_l, sin_l)
    k = packed_rope(k, cos_l, sin_l)
    attn = packed_small_attention(q, k, v, n_heads, scale=scale)
    out = jnp.concatenate([attn, jax.nn.gelu(mlp, approximate=False)], axis=-1)
    return jax.lax.dot_general(
        out, w2.astype(dtype), (((out.ndim - 1,), (0,)), ((), ()))
    ) + b2.astype(dtype)


def _erf_fp32(x):
    """fp32 erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7).

    Mosaic has no erf/erfc lowering, so the kernel's exact-GELU uses this
    polynomial; the ~1e-7 deviation from lax.erf is far below bf16 output
    rounding and inside the test parity tolerances.
    """
    sign = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    """Exact (erf-based) GELU, matching jax.nn.gelu(approximate=False)."""
    x32 = x.astype(jnp.float32)
    return (0.5 * x32 * (1.0 + _erf_fp32(x32 * (2.0 ** -0.5)))).astype(x.dtype)


def _kernel(x_ref, w1_ref, b1_ref, qs_ref, ks_ref, w2_ref, b2_ref, cos_ref,
            sin_ref, s_ref, p_ref, o_ref, *, l_len, n_heads, scale, eps):
    d = w2_ref.shape[1]
    dh = d // n_heads
    dtype = x_ref.dtype
    w1 = w1_ref[...]
    b1 = b1_ref[0]
    s32 = s_ref[...]
    s_low = s32.astype(dtype)
    p32 = p_ref[...]

    def norm_rope(t, lane_scale, pos):
        t32 = t.astype(jnp.float32)
        ms = jax.lax.dot_general(t32 * t32, s32, (((1,), (0,)), ((), ()))) / dh
        rr = jax.lax.dot_general(
            jax.lax.rsqrt(ms + eps), s32.T, (((1,), (0,)), ((), ())))
        t = (t32 * rr * lane_scale).astype(dtype)
        t32 = t.astype(jnp.float32)
        partner = jax.lax.dot_general(t32, p32, (((1,), (0,)), ((), ())))
        cos = cos_ref[pos:pos + 1, :]
        sin = sin_ref[pos:pos + 1, :]
        return (t32 * cos + partner * sin).astype(dtype)

    qs, ks, vs, mlps = [], [], [], []
    for pos in range(l_len):
        xp = x_ref[:, pos, :]
        xw = jax.lax.dot_general(
            xp, w1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype) + b1
        qs.append(norm_rope(xw[:, :d], qs_ref[0], pos))
        ks.append(norm_rope(xw[:, d:2 * d], ks_ref[0], pos))
        vs.append(xw[:, 2 * d:3 * d])
        mlps.append(xw[:, 3 * d:])

    # L x L packed-lane attention, softmax on [bn, H] planes
    logits = [[jax.lax.dot_general(
        qs[i] * ks[j], s_low, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
        for j in range(l_len)] for i in range(l_len)]

    w2 = w2_ref[...].astype(dtype)
    b2 = b2_ref[0].astype(dtype)
    for i in range(l_len):
        m = logits[i][0]
        for j in range(1, l_len):
            m = jnp.maximum(m, logits[i][j])
        exps = [jnp.exp(logits[i][j] - m) for j in range(l_len)]
        denom = exps[0]
        for j in range(1, l_len):
            denom = denom + exps[j]
        acc = None
        for j in range(l_len):
            w_lanes = jax.lax.dot_general(
                (exps[j] / denom).astype(dtype), s_low.T,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            term = w_lanes * vs[j].astype(jnp.float32)
            acc = term if acc is None else acc + term
        attn_i = acc.astype(dtype)
        gmlp_i = _gelu_exact(mlps[i])
        out32 = jax.lax.dot_general(
            attn_i, w2[:d], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out32 = out32 + jax.lax.dot_general(
            gmlp_i, w2[d:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:, i, :] = out32.astype(dtype) + b2


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _fused_vjp(x, w1, b1, q_scale, k_scale, w2, b2, cos_l, sin_l,
               n_heads, scale, eps):
    n, l_len, din = x.shape
    d = w2.shape[1]
    dh = d // n_heads
    block_n = max(1, 128)
    grid = (pl.cdiv(n, block_n),)
    qs_l = jnp.tile(q_scale.astype(jnp.float32), (n_heads,))[None] \
        if q_scale.shape[-1] == dh else q_scale.astype(jnp.float32)[None]
    ks_l = jnp.tile(k_scale.astype(jnp.float32), (n_heads,))[None] \
        if k_scale.shape[-1] == dh else k_scale.astype(jnp.float32)[None]
    s = jnp.asarray(_segment_matrix(d, n_heads))
    p = jnp.asarray(_pair_swap_matrix(d))

    row = pl.BlockSpec((block_n, l_len, din), lambda i: (i, 0, 0))
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    out = pl.pallas_call(
        functools.partial(_kernel, l_len=l_len, n_heads=n_heads,
                          scale=scale, eps=eps),
        grid=grid,
        in_specs=[
            row,
            full(w1.shape),
            full((1, b1.shape[0])),
            full(qs_l.shape),
            full(ks_l.shape),
            full(w2.shape),
            full((1, b2.shape[0])),
            full(cos_l.shape),
            full(sin_l.shape),
            full(s.shape),
            full(p.shape),
        ],
        out_specs=pl.BlockSpec((block_n, l_len, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, l_len, d), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x, w1.astype(x.dtype), b1.astype(x.dtype)[None], qs_l, ks_l,
      w2, b2[None], cos_l, sin_l, s, p)
    return out


def _fused_fwd(x, w1, b1, q_scale, k_scale, w2, b2, cos_l, sin_l,
               n_heads, scale, eps):
    out = _fused_vjp(x, w1, b1, q_scale, k_scale, w2, b2, cos_l, sin_l,
                     n_heads, scale, eps)
    return out, (x, w1, b1, q_scale, k_scale, w2, b2, cos_l, sin_l)


def _fused_bwd(n_heads, scale, eps, res, g):
    x, w1, b1, q_scale, k_scale, w2, b2, cos_l, sin_l = res
    _, vjp = jax.vjp(
        lambda *a: _reference_spatial_block(*a, n_heads, scale, eps),
        x, w1, b1, q_scale, k_scale, w2, b2, cos_l, sin_l)
    return vjp(g)


_fused_vjp.defvjp(_fused_fwd, _fused_bwd)


def fused_spatial_block(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    q_scale: jnp.ndarray,
    k_scale: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    cos_l: jnp.ndarray,
    sin_l: jnp.ndarray,
    n_heads: int,
    scale: Optional[float] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Full spatial ParallelMLPAttention block in one kernel.

    x: [N, L, din]; w1: [din, 3D+M]; w2: [D+M, D]; cos_l/sin_l: packed
    [L, D] lane tables (lane_rope_tables); q/k_scale: [dh] or [D].
    """
    d = w2.shape[1]
    scale = (d // n_heads) ** -0.5 if scale is None else scale
    if not _use_kernel():
        return _reference_spatial_block(x, w1, b1, q_scale, k_scale, w2, b2,
                                        cos_l, sin_l, n_heads, scale, eps)
    return _fused_vjp(x, w1, b1, q_scale, k_scale, w2, b2, cos_l, sin_l,
                      n_heads, scale, eps)
