"""Query-based entity-linked decoders.

Reconstruct per-entity outputs from the latent set by querying it with the
(frozen, orthogonal) entity codes — the other half of the "linked entities"
trick. Capability-parity target: reference
``src/models/components/decoder.py:12-411`` (Decoder / DecoderFE / Decoder2 /
DecoderQuerySplitter).

Pipeline (all variants): entity codes -> query MLP; self-attention over the
latent set; optional cross-attention latents <- queries; a final
cross-attention queries <- latents (the ``output_block``); per-output-head
MLPs returning a dict of named tensors.

TPU-first notes: callers pass pre-embedded entity codes (single gather,
shared with the encoder); every head MLP is a pair of Dense layers that XLA
fuses with the surrounding block; the QuerySplitter's Conv1d(kernel=1) is
expressed as a Dense + reshape, which lowers to one MXU matmul.
"""

from typing import Callable, Mapping, Optional

from flax import linen as nn
from jax import numpy as jnp

from lam_slide_tpu.nn.blocks import (
    CrossAttentionBlock,
    SelfAttentionBlock,
    gelu_tanh,
    torch_linear_init,
)


class _DecoderCore(nn.Module):
    """Shared trunk + heads for all decoder variants."""

    outputs: Mapping[str, int]
    dim_query: int
    dim_head_cross: int = 64
    dim_head_latent: int = 64
    num_head_cross: int = 1
    num_head_latent: int = 4
    num_block_cross: int = 2
    num_block_attn: int = 4
    dropout_query: float = 0.1
    dropout_latent: float = 0.0
    qk_norm: bool = False
    act: Callable = gelu_tanh
    backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def queries_from(self, entity_emb: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        q = entity_emb.astype(self.dtype)
        if self.dropout_query > 0.0:
            q = nn.Dropout(rate=self.dropout_query, name="dropout_query")(
                q, deterministic=deterministic
            )
        return nn.Dense(
            self.dim_query, kernel_init=torch_linear_init, dtype=self.dtype, name="query_mlp"
        )(q)

    def trunk(
        self, latent: jnp.ndarray, queries: jnp.ndarray, deterministic: bool
    ) -> jnp.ndarray:
        """Self-attn over latents, then optional cross latents <- queries."""
        if self.dropout_latent > 0.0:
            latent = nn.Dropout(rate=self.dropout_latent, name="dropout_latent")(
                latent, deterministic=deterministic
            )
        for i in range(self.num_block_attn):
            latent = SelfAttentionBlock(
                heads=self.num_head_latent,
                dim_head=self.dim_head_latent,
                qk_norm=self.qk_norm,
                act=self.act,
                backend=self.backend,
                dtype=self.dtype,
                name=f"self_{i}",
            )(latent)
        for i in range(self.num_block_cross):
            latent = CrossAttentionBlock(
                heads=self.num_head_cross,
                dim_head=self.dim_head_cross,
                qk_norm=self.qk_norm,
                act=self.act,
                backend=self.backend,
                dtype=self.dtype,
                name=f"cross_{i}",
            )(latent, context=queries)
        return latent

    def output_block(self, queries: jnp.ndarray, latent: jnp.ndarray) -> jnp.ndarray:
        return CrossAttentionBlock(
            heads=self.num_head_cross,
            dim_head=self.dim_head_cross,
            qk_norm=self.qk_norm,
            act=self.act,
            backend=self.backend,
            dtype=self.dtype,
            name="output_block",
        )(queries, context=latent)

    def heads(self, h: jnp.ndarray):
        out = {}
        for name, out_dim in self.outputs.items():
            y = nn.Dense(
                self.dim_query,
                kernel_init=torch_linear_init,
                dtype=self.dtype,
                name=f"head_{name}_fc",
            )(h)
            y = self.act(y)
            out[name] = nn.Dense(
                out_dim, kernel_init=torch_linear_init, dtype=self.dtype, name=f"head_{name}_out"
            )(y)
        return out


class Decoder(_DecoderCore):
    """Standard decoder (reference decoder.py:12-102)."""

    @nn.compact
    def __call__(
        self, latent: jnp.ndarray, entity_emb: jnp.ndarray, deterministic: bool = True
    ):
        """latent: [B, L, D]; entity_emb: [B, N, E] -> dict of [B, N, out_dim]."""
        queries = self.queries_from(entity_emb, deterministic)
        latent = self.trunk(latent, queries, deterministic)
        h = self.output_block(queries, latent)
        return self.heads(h)


class DecoderFE(_DecoderCore):
    """Decoder + a learned global energy query (reference decoder.py:105-216).

    An extra single learned query cross-attends onto the processed latent set
    and maps to a scalar per sample under the ``"energy"`` key.
    """

    @nn.compact
    def __call__(
        self, latent: jnp.ndarray, entity_emb: jnp.ndarray, deterministic: bool = True
    ):
        queries = self.queries_from(entity_emb, deterministic)
        latent = self.trunk(latent, queries, deterministic)
        h = self.output_block(queries, latent)
        out = self.heads(h)

        energy_query = self.param(
            "energy_query", nn.initializers.normal(stddev=1.0), (self.dim_query,), jnp.float32
        )
        eq = jnp.broadcast_to(
            energy_query[None, None].astype(self.dtype), (latent.shape[0], 1, self.dim_query)
        )
        e = CrossAttentionBlock(
            heads=self.num_head_cross,
            dim_head=self.dim_head_cross,
            qk_norm=self.qk_norm,
            act=self.act,
            backend=self.backend,
            dtype=self.dtype,
            name="energy_block",
        )(eq, context=latent)
        e = nn.Dense(
            self.dim_query, kernel_init=torch_linear_init, dtype=self.dtype, name="energy_fc"
        )(e)
        e = self.act(e)
        e = nn.Dense(1, kernel_init=torch_linear_init, dtype=self.dtype, name="energy_out")(e)
        out["energy"] = e[..., 0]
        return out


class Decoder2(_DecoderCore):
    """Decoder with a learned query bias shared across entities
    (reference decoder.py:219-310): queries = query_mlp(entity_emb) + q_shared."""

    @nn.compact
    def __call__(
        self, latent: jnp.ndarray, entity_emb: jnp.ndarray, deterministic: bool = True
    ):
        shared = self.param(
            "query", nn.initializers.normal(stddev=1.0), (self.dim_query,), jnp.float32
        )
        queries = self.queries_from(entity_emb, deterministic) + shared.astype(self.dtype)
        latent = self.trunk(latent, queries, deterministic)
        h = self.output_block(queries, latent)
        return self.heads(h)


class DecoderQuerySplitter(_DecoderCore):
    """Decoder that widens the latent set L -> L*num_split before the output
    cross-attention (reference decoder.py:313-411; used for peptides).

    The reference's Conv1d(dim, dim*num_split, 1) + channel-major rearrange is
    one Dense producing [B, L, num_split, D] tokens (feature index major in the
    flattened output channel, matching ``(D N)`` ordering) flattened to
    [B, L*num_split, D].
    """

    num_split: int = 8

    @nn.compact
    def __call__(
        self, latent: jnp.ndarray, entity_emb: jnp.ndarray, deterministic: bool = True
    ):
        queries = self.queries_from(entity_emb, deterministic)
        latent = self.trunk(latent, queries, deterministic)

        b, l, d = latent.shape
        ext = nn.Dense(
            d * self.num_split, kernel_init=torch_linear_init, dtype=self.dtype, name="extender"
        )(latent)
        # output channel (d_out, n) with d_out major == reference "B (D N) L -> B (L N) D"
        ext = ext.reshape(b, l, d, self.num_split).transpose(0, 1, 3, 2).reshape(b, l * self.num_split, d)

        h = self.output_block(queries, ext)
        return self.heads(h)
