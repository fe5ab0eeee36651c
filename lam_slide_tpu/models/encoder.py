"""Entity-linked UPT/Perceiver encoder.

Compresses a single frame of a spatial system — N entities with arbitrary
per-entity features — into a fixed-size set of ``num_latents`` latent tokens
via cross-attention from learned latent queries onto the input set, then
self-attention among the latents. Capability-parity target:
reference ``src/models/components/encoder.py:11-162``.

TPU-first design notes
----------------------
* The entity embedding lookup is hoisted out: callers pass the already
  embedded entity codes (``entity_emb``), so a backbone sharing the frozen
  orthogonal table between encoder and decoder performs exactly one gather.
* Static shapes: variable entity counts are handled by padding N to a
  per-dataset constant and masking the cross-attention keys — one XLA
  compilation per dataset, everything batched onto the MXU.
* ``num_latents`` is tiny (2–192); the cross/self attention here runs on the
  fused XLA path (see lam_slide_tpu.ops.attention) since flash tiling has
  nothing to win at these lengths.
"""

from typing import Callable, Optional

from flax import linen as nn
from jax import numpy as jnp

from lam_slide_tpu.nn.blocks import (
    CrossAttentionBlock,
    FeedForward,
    SelfAttentionBlock,
    gelu_tanh,
    torch_linear_init,
)


class _EncoderBase(nn.Module):
    """Shared input pipeline (reference encoder.py:11-41).

    Per-entity features are concatenated with the entity code, mixed by a
    bottleneck MLP (ctx -> dim_latent -> ctx), and serve as cross-attention
    context. Learned latent queries are broadcast over the batch.
    """

    dim_latent: int
    num_latents: int
    dropout_latent: float = 0.0
    act: Callable = gelu_tanh
    dtype: jnp.dtype = jnp.float32

    def prepare_inputs(self, x, entity_emb, deterministic: bool):
        ctx = jnp.concatenate([x, entity_emb.astype(x.dtype)], axis=-1)
        dim_context = ctx.shape[-1]
        ctx = nn.Dense(
            self.dim_latent, kernel_init=torch_linear_init, dtype=self.dtype, name="mlp_in"
        )(ctx)
        ctx = self.act(ctx)
        ctx = nn.Dense(
            dim_context, kernel_init=torch_linear_init, dtype=self.dtype, name="mlp_out"
        )(ctx)

        latents = self.param(
            "latents",
            nn.initializers.normal(stddev=1.0),
            (self.num_latents, self.dim_latent),
            jnp.float32,
        )
        latents = jnp.broadcast_to(
            latents[None].astype(self.dtype), (x.shape[0], self.num_latents, self.dim_latent)
        )
        if self.dropout_latent > 0.0 and not deterministic:
            # Token dropout (torch Dropout2d over the latent axis): whole
            # latent rows are zeroed, matching encoder.py:24.
            latents = nn.Dropout(
                rate=self.dropout_latent, broadcast_dims=(2,), name="dropout_latent"
            )(latents, deterministic=False)
        return ctx, latents


class Encoder(_EncoderBase):
    """Blocked variant: all cross-attention first, then all self-attention
    (reference encoder.py:44-103)."""

    dim_head_cross: int = 16
    dim_head_latent: int = 16
    num_head_cross: int = 8
    num_head_latent: int = 2
    num_block_cross: int = 1
    num_block_attn: int = 1
    qk_norm: bool = True
    backend: str = "auto"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        entity_emb: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """x: [B, N, F]; entity_emb: [B, N, E]; mask: [B, N] bool (True=valid).

        Returns latents [B, num_latents, dim_latent].
        """
        ctx, latents = self.prepare_inputs(x, entity_emb, deterministic)
        for i in range(self.num_block_cross):
            latents = CrossAttentionBlock(
                heads=self.num_head_cross,
                dim_head=self.dim_head_cross,
                qk_norm=self.qk_norm,
                act=self.act,
                backend=self.backend,
                dtype=self.dtype,
                name=f"cross_{i}",
            )(latents, context=ctx, mask=mask)
        for i in range(self.num_block_attn):
            latents = SelfAttentionBlock(
                heads=self.num_head_latent,
                dim_head=self.dim_head_latent,
                qk_norm=self.qk_norm,
                act=self.act,
                backend=self.backend,
                dtype=self.dtype,
                name=f"self_{i}",
            )(latents)
        return latents


class Encoder2(_EncoderBase):
    """Interleaved variant: (cross, self) x num_block (reference encoder.py:106-162)."""

    dim_head_cross: int = 16
    dim_head_latent: int = 16
    num_head_cross: int = 8
    num_head_latent: int = 2
    num_block: int = 1
    qk_norm: bool = True
    backend: str = "auto"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        entity_emb: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        ctx, latents = self.prepare_inputs(x, entity_emb, deterministic)
        for i in range(self.num_block):
            latents = CrossAttentionBlock(
                heads=self.num_head_cross,
                dim_head=self.dim_head_cross,
                qk_norm=self.qk_norm,
                act=self.act,
                backend=self.backend,
                dtype=self.dtype,
                name=f"cross_{i}",
            )(latents, context=ctx, mask=mask)
            latents = SelfAttentionBlock(
                heads=self.num_head_latent,
                dim_head=self.dim_head_latent,
                qk_norm=self.qk_norm,
                act=self.act,
                backend=self.backend,
                dtype=self.dtype,
                name=f"self_{i}",
            )(latents)
        return latents
