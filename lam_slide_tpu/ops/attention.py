"""Attention primitives with pluggable TPU backends.

The reference reaches flash attention through torch SDPA
(torch_modules.py:184, mmdit.py:51) and offers an O(N) linear-attention mode
(mmdit.py:58-72). Here the same surface is a single functional API:

    dot_product_attention(q, k, v, mask=..., scale=..., backend=...)

* ``backend="xla"``    — einsum + fp32 softmax; XLA fuses this into an MXU
  pipeline and is the fastest choice for the short sequences this model
  family actually runs (L = 2..192 latents, T = 10..1000 frames).
* ``backend="pallas"`` — Pallas flash-attention kernel (ops/flash_attention.py)
  for long temporal axes; falls back to XLA off-TPU or for tiny shapes.
* ``backend="auto"``   — size/platform-based dispatch.

Shapes: q [B, H, Lq, Dh]; k, v [B, H, Lk, Dh]; mask is a boolean key-padding
mask [B, Lk] (True = attend) or a broadcastable [B, 1, Lq, Lk] tensor.
"""

import os
from typing import Optional

import jax
from jax import numpy as jnp

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

# Session-level override of the "auto" dispatch. Tensor parallelism sets
# this to "xla" (train/cli.py --model-axis): the Pallas flash custom call
# does not partition under GSPMD, so a model-sharded train step must route
# attention through the partitionable XLA path. Also settable via
# LAM_SLIDE_ATTN_BACKEND for A/B runs.
FORCE_BACKEND: Optional[str] = None


def _expand_mask(mask: jnp.ndarray, q_len: int) -> jnp.ndarray:
    if mask.ndim == 2:  # [B, Lk] key padding mask
        return mask[:, None, None, :]
    if mask.ndim == 4:
        return mask
    raise ValueError(f"mask must be rank 2 or 4, got rank {mask.ndim}")


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Reference attention path: fp32 softmax, bf16-friendly matmuls."""
    head_dim = q.shape[-1]
    scale = head_dim**-0.5 if scale is None else scale
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * jnp.asarray(scale, dtype=jnp.float32)
    if mask is not None:
        logits = jnp.where(_expand_mask(mask, q.shape[-2]), logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def linear_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """O(N) linear attention (reference mmdit.py:58-72).

    softmax(q) over features, softmax(k) over sequence, then two matmuls.
    """
    dim = q.shape[-1]
    q = jax.nn.softmax(q.astype(jnp.float32), axis=-1)
    k = jax.nn.softmax(k.astype(jnp.float32), axis=-2)
    q = q * dim**-0.5
    context = jnp.einsum("bhnd,bhne->bhde", k, v.astype(jnp.float32))
    out = jnp.einsum("bhnd,bhde->bhne", q, context)
    return out.astype(v.dtype)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    backend: str = "auto",
) -> jnp.ndarray:
    """Masked multi-head attention with backend dispatch (see module docstring)."""
    if backend == "auto":
        backend = _pick_backend(q, mask)
    if backend == "pallas":
        from lam_slide_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, mask=mask, scale=scale)
    if backend == "xla":
        return xla_attention(q, k, v, mask=mask, scale=scale)
    raise ValueError(f"unknown attention backend: {backend}")


def dot_product_attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    backend: str = "auto",
) -> jnp.ndarray:
    """Attention over packed [B, N, H·dh] inputs -> packed output.

    On the Pallas backend the head-major relayouts disappear into the flash
    kernel's strided block DMAs (ops/flash_attention.py
    ``flash_attention_packed``); on the XLA backend (off-TPU, forced via
    FORCE_BACKEND/LAM_SLIDE_ATTN_BACKEND, or tiny axes) this transposes and
    runs ``xla_attention`` — byte-identical behavior to the caller doing the
    head-major dance itself.
    """
    b, n, d_all = q.shape
    dh = d_all // num_heads
    if backend == "auto":
        backend = _pick_backend_packed(q, k, mask)
    if backend == "pallas":
        from lam_slide_tpu.ops.flash_attention import flash_attention_packed

        return flash_attention_packed(q, k, v, num_heads, mask=mask, scale=scale)
    if backend == "short":
        # Grouped VMEM-resident kernel for short unmasked self-attention
        # axes (ops/short_attention.py); masked calls have no short path.
        if mask is not None:
            return dot_product_attention_packed(
                q, k, v, num_heads, mask=mask, scale=scale, backend="xla")
        from lam_slide_tpu.ops.short_attention import short_attention

        return short_attention(q, k, v, num_heads, scale=scale)
    to_heads = lambda t: t.reshape(b, -1, num_heads, dh).transpose(0, 2, 1, 3)
    out = xla_attention(to_heads(q), to_heads(k), to_heads(v), mask=mask,
                        scale=scale)
    return out.transpose(0, 2, 1, 3).reshape(b, n, d_all)


def _pick_backend_packed(q: jnp.ndarray, k: jnp.ndarray,
                         mask: Optional[jnp.ndarray]) -> str:
    """Mirror of ``_pick_backend`` for packed [B, N, H·dh] operands."""
    forced = FORCE_BACKEND or os.environ.get("LAM_SLIDE_ATTN_BACKEND")
    if forced:
        return forced
    on_tpu = jax.default_backend() == "tpu"
    rank4_mask = mask is not None and mask.ndim == 4
    if on_tpu and q.shape[1] >= 128 and not rank4_mask:
        return "pallas"
    # Short unmasked self-attention axes (the stage-2 temporal axis for
    # MD17/pedestrian/NBA): grouped VMEM-resident kernel — A/B-gated until
    # the on-chip number lands (tools/measure_short_attention.py).
    if (on_tpu and mask is None and 8 < q.shape[1] < 128
            and k is not None and q.shape == k.shape
            and os.environ.get("LAM_SLIDE_SHORT_ATTN") == "1"):
        return "short"
    return "xla"


def _pick_backend(q: jnp.ndarray, mask: Optional[jnp.ndarray]) -> str:
    # Measured on v5e (tests/test_flash_attention.py drive): the Pallas
    # kernel matches or beats the XLA path from ~128 keys up and is the only
    # option beyond ~2k (XLA materializes the [B,H,N,N] logits and OOMs at
    # 4k+). Below that, XLA's fused softmax wins on dispatch overhead.
    # Rank-4 masks (full attention bias) stay on XLA — flash takes only
    # key-padding masks.
    forced = FORCE_BACKEND or os.environ.get("LAM_SLIDE_ATTN_BACKEND")
    if forced:
        return forced
    on_tpu = jax.default_backend() == "tpu"
    seq = max(q.shape[-2], 1)
    rank4_mask = mask is not None and mask.ndim == 4
    if on_tpu and seq >= 128 and not rank4_mask:
        return "pallas"
    return "xla"
