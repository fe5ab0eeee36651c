"""Perceiver-style attention blocks (UPT encoder/decoder building blocks).

Functional re-design of the reference block library
(src/modules/torch_modules.py:108-273): PreNorm cross/self attention with
residuals and a GELU feed-forward. All matmuls run through ``nn.Dense`` with
a configurable compute dtype (bf16 on TPU), while softmax/norm statistics
stay fp32 (see lam_slide_tpu.ops.attention / nn.norms).
"""

import math
from typing import Callable, Optional

import jax
from flax import linen as nn
from jax import numpy as jnp

from lam_slide_tpu.nn import initializers as inits
from lam_slide_tpu.nn.norms import LayerNorm, QKNorm
from lam_slide_tpu.ops.attention import dot_product_attention


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — the act the reference configs select (torch_modules.py:36-50)."""
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


# torch.nn.Linear default init (kaiming uniform, a=sqrt(5)): U(+-1/sqrt(fan_in)).
torch_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class FeedForward(nn.Module):
    """MLP: (in -> dim, act) x depth -> out (torch_modules.py:125-144)."""

    dim: int
    depth: int = 1
    out_dim: Optional[int] = None
    act: Callable = gelu_exact
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.depth):
            x = nn.Dense(self.dim, kernel_init=torch_linear_init, dtype=self.dtype, name=f"fc{i}")(
                x
            )
            x = self.act(x)
        out_dim = self.out_dim if self.out_dim is not None else self.dim
        return nn.Dense(out_dim, kernel_init=torch_linear_init, dtype=self.dtype, name="out")(x)


def dropout_seq(rng, x: jnp.ndarray, mask: Optional[jnp.ndarray], dropout: float):
    """Random sequence-element dropout with mask/index compaction
    (reference torch_modules.dropout_seq): keeps a random (1-dropout)
    fraction of the sequence axis per batch element. Returns (x, mask).
    Static output length = ceil(n * (1 - dropout)) — TPU-safe."""
    b, n = x.shape[:2]
    keep = max(1, int(n * (1.0 - dropout)))
    scores = jax.random.uniform(rng, (b, n))
    if mask is not None:
        scores = jnp.where(mask, scores, -1.0)  # drop padding first
    idx = jnp.argsort(-scores, axis=1)[:, :keep]
    batch_idx = jnp.arange(b)[:, None]
    new_x = x[batch_idx, idx]
    new_mask = mask[batch_idx, idx] if mask is not None else None
    return new_x, new_mask


class Attention(nn.Module):
    """Multi-head attention; queries from x, keys/values from context.

    Mirrors torch_modules.Attention/SelfAttention (147-253): biasless q/kv
    projections with xavier(1/sqrt(2)) init, optional per-head QKNorm, output
    projection with xavier(1) + zero bias. ``mask`` is a [B, Lk] boolean
    key-padding mask.
    """

    heads: int
    dim_head: int
    qk_norm: bool = False
    scale: Optional[float] = None
    backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        context = x if context is None else context
        h, dh = self.heads, self.dim_head
        inner = h * dh
        out_dim = x.shape[-1]

        q = nn.Dense(
            inner, use_bias=False, kernel_init=inits.attn_kernel_init, dtype=self.dtype, name="to_q"
        )(x)
        kv = nn.Dense(
            2 * inner,
            use_bias=False,
            kernel_init=inits.attn_kernel_init,
            dtype=self.dtype,
            name="to_kv",
        )(context)
        k, v = jnp.split(kv, 2, axis=-1)

        def to_heads(t):
            return t.reshape(*t.shape[:-1], h, dh).swapaxes(-3, -2)  # [B, H, L, Dh]

        q, k, v = map(to_heads, (q, k, v))
        if self.qk_norm:
            q, k = QKNorm(name="norm")(q, k)
            q = q.astype(v.dtype)
            k = k.astype(v.dtype)

        scale = self.scale if self.scale is not None else dh**-0.5
        out = dot_product_attention(q, k, v, mask=mask, scale=scale, backend=self.backend)
        out = out.swapaxes(-3, -2).reshape(*x.shape[:-1], inner)
        return nn.Dense(
            out_dim,
            kernel_init=inits.xavier_uniform(1.0),
            bias_init=inits.zeros,
            dtype=self.dtype,
            name="to_out",
        )(out)


class CrossAttentionBlock(nn.Module):
    """PreNorm cross-attention + PreNorm FF, both residual (torch_modules.py:189-218)."""

    heads: int
    dim_head: int
    qk_norm: bool = False
    act: Callable = gelu_exact
    scale: Optional[float] = None
    backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        attn = Attention(
            heads=self.heads,
            dim_head=self.dim_head,
            qk_norm=self.qk_norm,
            scale=self.scale,
            backend=self.backend,
            dtype=self.dtype,
            name="attn",
        )
        x = attn(LayerNorm(name="norm")(x), context=LayerNorm(name="norm_context")(context), mask=mask) + x
        ff = FeedForward(dim=x.shape[-1], act=self.act, dtype=self.dtype, name="ff")
        return ff(LayerNorm(name="norm_ff")(x)) + x


class SelfAttentionBlock(nn.Module):
    """PreNorm self-attention + PreNorm FF, both residual (torch_modules.py:256-273)."""

    heads: int
    dim_head: int
    qk_norm: bool = False
    act: Callable = gelu_exact
    scale: Optional[float] = None
    backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        attn = Attention(
            heads=self.heads,
            dim_head=self.dim_head,
            qk_norm=self.qk_norm,
            scale=self.scale,
            backend=self.backend,
            dtype=self.dtype,
            name="attn",
        )
        x = attn(LayerNorm(name="norm")(x), mask=mask) + x
        ff = FeedForward(dim=x.shape[-1], act=self.act, dtype=self.dtype, name="ff")
        return ff(LayerNorm(name="norm_ff")(x)) + x
