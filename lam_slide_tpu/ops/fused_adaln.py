"""Fused residual-add + LayerNorm + AdaLN-modulate Pallas kernels.

The DiT layer's glue between attention blocks is HBM-bound elementwise
work (docs/PERF.md: 1.14 ms/eval of separate fp32 LN-stat reduce passes
plus the residual and modulate passes at the 4AA shapes). XLA emits the
residual add, the LN statistics reduction, and the LN-apply+modulate as
separate HBM passes over the [B, T, L, D] stream; these kernels do each
chain in ONE read/write pass per tensor:

    adaln_modulate(x, shift, scale)          = modulate(LN(x))
    residual_adaln_modulate(x, h, gate, s,c) = (x + g·h, modulate(LN(x+g·h)))

replacing the layer-entry LN+modulate and the mid-layer residual→LN→
modulate chain of LatentDiTLayer (models/latent_dit.py; reference
latent_si_v31.py:45-61 — LayerNorm(elementwise_affine=False) + the
mmdit.py:21-22 modulate).

Numerics: same op sequence as the unfused composition — the residual
rounds per-op in the activation dtype, LN statistics run in fp32, the
normalized value rounds to the activation dtype before the modulate.
Bit-parity is pinned through the interpreter (tests/test_fused_adaln.py);
on the real chip the *unfused* XLA path may reassociate its fusions, so
kernel-vs-XLA differs by ≤1 ulp of the activation dtype (measured
0.0625 max abs in bf16 at 4AA shapes — 1 ulp at magnitude ~16).

Differentiation: custom VJP whose backward is ``jax.vjp`` of the
reference composition — training gradients are identical to the unfused
path while the forward (and the forward recompute under remat) takes the
fused kernel. Off-TPU the reference composition runs directly.
"""

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from lam_slide_tpu.nn.norms import layer_norm

# Off-TPU the public entry points use the reference composition directly
# (interpreted Pallas would slow every CPU test train); tests flip this to
# exercise the kernels through the interpreter.
FORCE_KERNEL = False


def _use_kernel() -> bool:
    # OPT-IN (measured on-chip 2026-08-17, tools/measure_fused_ab.py): with
    # both fused families active the bench headline is 0.95x the XLA
    # composition (515 vs 539 steps/s at B=8) — XLA's own elementwise
    # fusion beats the hand kernel at these shapes, so the kernels are off
    # by default. Enable with LAM_SLIDE_FUSED=1 (A/B, other shape regimes);
    # LAM_SLIDE_NO_FUSED_ADALN=1 vetoes just this family within an
    # LAM_SLIDE_FUSED=1 session.
    if os.environ.get("LAM_SLIDE_NO_FUSED") == "1":
        return False
    if os.environ.get("LAM_SLIDE_NO_FUSED_ADALN") == "1":
        return False
    if FORCE_KERNEL:
        return True
    return (os.environ.get("LAM_SLIDE_FUSED") == "1"
            and jax.default_backend() == "tpu")


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _modulate(xn: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return xn * (1.0 + scale.astype(xn.dtype)) + shift.astype(xn.dtype)


def _reference_adaln(x, shift, scale, eps):
    return _modulate(layer_norm(x, eps=eps), shift, scale)


def _reference_residual_adaln(x, h, gate, shift, scale, eps):
    x_new = x + gate.astype(x.dtype) * h
    return x_new, _modulate(layer_norm(x_new, eps=eps), shift, scale)


def _ln_mod(x32: jnp.ndarray, shift32, scale32, eps: float, out_dtype):
    """fp32 rows -> LN -> round to out_dtype -> modulate (reference order)."""
    # identical op sequence to nn.norms.layer_norm (bit-parity contract)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    xn = ((x32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))).astype(out_dtype)
    return xn * (1.0 + scale32.astype(out_dtype)) + shift32.astype(out_dtype)


def _adaln_kernel(x_ref, shift_ref, scale_ref, y_ref, *, eps):
    x = x_ref[0]
    y_ref[0] = _ln_mod(x.astype(jnp.float32), shift_ref[0], scale_ref[0],
                       eps, x.dtype)


def _residual_adaln_kernel(x_ref, h_ref, gate_ref, shift_ref, scale_ref,
                           xout_ref, y_ref, *, eps):
    x = x_ref[0]
    # per-op rounding in the activation dtype, as XLA emits it
    x_new = x + gate_ref[0].astype(x.dtype) * h_ref[0]
    xout_ref[0] = x_new
    y_ref[0] = _ln_mod(x_new.astype(jnp.float32), shift_ref[0], scale_ref[0],
                       eps, x.dtype)


def _row_layout(x, *mods):
    """[B, ..., D] -> ([B, R, D], [[B, 1, D] fp32 mods], block_r, grid)."""
    b, d = x.shape[0], x.shape[-1]
    r = 1
    for s in x.shape[1:-1]:
        r *= s
    x3 = x.reshape(b, r, d)
    # Mods are carried as [B, 1, D] so the per-program block (1, 1, D) has
    # its second-to-last dim equal to the full dim — Mosaic rejects a 1-row
    # block over a B-row array (sublane tiling rule).
    flat_mods = [m.reshape(b, 1, d).astype(jnp.float32) for m in mods]
    block_r = min(r, 512)
    grid = (b, pl.cdiv(r, block_r))
    return x3, flat_mods, block_r, grid


def _specs(block_r, d):
    row = pl.BlockSpec((1, block_r, d), lambda b, i: (b, i, 0))
    vec = pl.BlockSpec((1, 1, d), lambda b, i: (b, 0, 0))
    return row, vec


def adaln_modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray,
                   eps: float = 1e-6) -> jnp.ndarray:
    """modulate(layer_norm(x), shift, scale) in one HBM pass.

    x: [B, ..., D]; shift/scale broadcastable [B, 1.., D].
    """
    if not _use_kernel():
        return _reference_adaln(x, shift, scale, eps)
    return _adaln_vjp(x, shift, scale, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _adaln_vjp(x, shift, scale, eps):
    x3, (sh, sc), block_r, grid = _row_layout(x, shift, scale)
    row, vec = _specs(block_r, x.shape[-1])
    y = pl.pallas_call(
        functools.partial(_adaln_kernel, eps=eps),
        grid=grid,
        in_specs=[row, vec, vec],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct(x3.shape, x.dtype),
        interpret=_interpret(),
    )(x3, sh, sc)
    return y.reshape(x.shape)


def _adaln_fwd(x, shift, scale, eps):
    return _adaln_vjp(x, shift, scale, eps), (x, shift, scale)


def _adaln_bwd(eps, res, g):
    x, shift, scale = res
    _, vjp = jax.vjp(lambda *a: _reference_adaln(*a, eps), x, shift, scale)
    return vjp(g)


_adaln_vjp.defvjp(_adaln_fwd, _adaln_bwd)


def residual_adaln_modulate(
    x: jnp.ndarray, h: jnp.ndarray, gate: jnp.ndarray, shift: jnp.ndarray,
    scale: jnp.ndarray, eps: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(x + gate·h, modulate(layer_norm(x + gate·h))) in one HBM pass."""
    if not _use_kernel():
        return _reference_residual_adaln(x, h, gate, shift, scale, eps)
    return _residual_adaln_vjp(x, h, gate, shift, scale, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _residual_adaln_vjp(x, h, gate, shift, scale, eps):
    x3, (gt, sh, sc), block_r, grid = _row_layout(x, gate, shift, scale)
    h3 = h.reshape(x3.shape)
    row, vec = _specs(block_r, x.shape[-1])
    x_new, y = pl.pallas_call(
        functools.partial(_residual_adaln_kernel, eps=eps),
        grid=grid,
        in_specs=[row, row, vec, vec, vec],
        out_specs=(row, row),
        out_shape=(jax.ShapeDtypeStruct(x3.shape, x.dtype),
                   jax.ShapeDtypeStruct(x3.shape, x.dtype)),
        interpret=_interpret(),
    )(x3, h3, gt, sh, sc)
    return x_new.reshape(x.shape), y.reshape(x.shape)


def _residual_adaln_fwd(x, h, gate, shift, scale, eps):
    out = _residual_adaln_vjp(x, h, gate, shift, scale, eps)
    return out, (x, h, gate, shift, scale)


def _residual_adaln_bwd(eps, res, g):
    x, h, gate, shift, scale = res
    _, vjp = jax.vjp(lambda *a: _reference_residual_adaln(*a, eps),
                     x, h, gate, shift, scale)
    return vjp(g)


_residual_adaln_vjp.defvjp(_residual_adaln_fwd, _residual_adaln_bwd)
