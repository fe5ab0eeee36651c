"""Fused MLP branch kernel: gelu(x @ w1 + b1) @ w2 in one HBM pass.

The DiT layer's parallel-MLP branch (reference ParallelMLPAttentionV2,
mmdit.py:215-249: linear1's MLP slice -> gelu -> linear2's MLP slice) is a
pure per-row chain that never feeds the attention — yet the XLA
composition materializes the [rows, mlp_hidden] gelu intermediate in HBM
between the two matmuls (write + read ~50 MB/layer at the 4AA bench
shapes, B=8: rows = B·L·T = 16k, mlp_hidden = 768 bf16). This kernel
keeps the intermediate in VMEM: one row-block program loads the x block
plus BOTH weight slices (384x768 + 768x384 bf16 ≈ 1.1 MB) and emits the
fp32 partial that latent_dit adds to the attention partial before the
single bf16 rounding — numerics identical to the unfused two-dot tail
(fp32 MXU accumulation, gelu on the bf16-rounded mid, fp32 output).

This is the first fusion lever aimed at the dh=128 packed layout's
remaining glue (docs/PERF.md round-5: the dh=24 negative-result set never
targeted the MLP chain; fused_spatial_block covers only the small-L
spatial axis). Opt-in until the on-chip A/B lands: LAM_SLIDE_FUSED_MLP=1.

Differentiation: custom VJP whose backward is jax.vjp of the reference
composition — gradients identical to the unfused path; the kernel serves
the forward (the sampler's entire cost) and the remat re-forward.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Off-TPU the public entry point uses the reference composition directly;
# tests flip this to exercise the kernel through the interpreter.
FORCE_KERNEL = False


def use_kernel() -> bool:
    # DEFAULT ON on TPU (measured 2026-08-21, tools/measure_fused_ab.py):
    # +10.6% at the 3x128 split (B=8) and +5.6% at the reference 16x24
    # split (B=2) — the only fusion lever that wins at BOTH layouts.
    # LAM_SLIDE_NO_FUSED_MLP=1 vetoes; LAM_SLIDE_FUSED_MLP=1 force-enables
    # (A/B arms pin every knob explicitly via tools/_subproc.py).
    if FORCE_KERNEL:
        return True
    if os.environ.get("LAM_SLIDE_FUSED_MLP") == "1":  # explicit beats veto
        return jax.default_backend() == "tpu"
    if os.environ.get("LAM_SLIDE_NO_FUSED_MLP") == "1":
        return False
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def reference_mlp(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                  w2: jnp.ndarray) -> jnp.ndarray:
    """The unfused tail exactly as latent_dit composes it: bf16 mid (one
    rounding after the fp32-accumulated dot + bias), exact gelu, fp32 out."""
    mid = jax.lax.dot_general(
        x, w1, (((x.ndim - 1,), (0,)), ((), ()))) + b1
    gmid = jax.nn.gelu(mid, approximate=False)
    return jax.lax.dot_general(
        gmid, w2, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, o_ref):
    # exact GELU via the polynomial erf — Mosaic has no erf lowering
    # (same helper contract as ops/fused_spatial_block._gelu_exact; the
    # ~1.5e-7 erf deviation is far below bf16 rounding)
    from lam_slide_tpu.ops.fused_spatial_block import _gelu_exact

    x = x_ref[...]
    mid = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    mid = (mid + b1_ref[...].astype(jnp.float32)).astype(x.dtype)
    gmid = _gelu_exact(mid)
    o_ref[...] = jnp.dot(gmid, w2_ref[...],
                         preferred_element_type=jnp.float32)


def fused_mlp(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
              w2: jnp.ndarray, block_r: int = 512) -> jnp.ndarray:
    """gelu(x @ w1 + b1) @ w2 -> fp32, intermediate VMEM-resident.

    x: [..., d_in]; w1: [d_in, d_mid]; b1: [d_mid]; w2: [d_mid, d_out].
    """
    if not use_kernel():
        return reference_mlp(x, w1, b1, w2)
    return _fused_mlp_vjp(x, w1, b1, w2, block_r)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_mlp_vjp(x, w1, b1, w2, block_r):
    d_in, d_mid = w1.shape
    d_out = w2.shape[1]
    lead = x.shape[:-1]
    r = 1
    for s in lead:
        r *= s
    x2 = x.reshape(r, d_in)
    block_r = min(block_r, r)
    grid = (pl.cdiv(r, block_r),)
    out = pl.pallas_call(
        _mlp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, d_in), lambda i: (i, 0)),
            pl.BlockSpec((d_in, d_mid), lambda i: (0, 0)),
            pl.BlockSpec((1, d_mid), lambda i: (0, 0)),
            pl.BlockSpec((d_mid, d_out), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_r, d_out), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, d_out), jnp.float32),
        interpret=_interpret(),
    )(x2, w1, b1.reshape(1, d_mid), w2)
    return out.reshape(*lead, d_out)


def _fused_mlp_fwd(x, w1, b1, w2, block_r):
    return _fused_mlp_vjp(x, w1, b1, w2, block_r), (x, w1, b1, w2)


def _fused_mlp_bwd(block_r, res, g):
    x, w1, b1, w2 = res
    _, vjp = jax.vjp(reference_mlp, x, w1, b1, w2)
    return vjp(g)


_fused_mlp_vjp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
