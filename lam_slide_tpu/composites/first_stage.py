"""Generic first-stage backbone: input embedder → encoder → quant bottleneck
→ decoder.

Functional re-design of the reference's ``BackboneBase``
(src/models/composites/lightning_base.py:17-48): the latent bottleneck is
``quant = Dense + non-affine LayerNorm`` after encoding and ``post_quant =
non-affine LayerNorm + Dense`` before decoding. Domain specifics enter as a
pluggable ``input_embedder`` module that maps the raw batch dict to
per-entity features (reference ``prepare_inputs`` overrides).

The frozen orthogonal entity table is created *here* and shared by encoder
and decoder — one gather per forward, same linkage semantics as the
reference passing one ``embed_entity`` module to both.
"""

from typing import Callable, Dict, Optional

from flax import linen as nn
from jax import numpy as jnp

from lam_slide_tpu.nn.blocks import torch_linear_init
from lam_slide_tpu.nn.embeddings import EntityEmbedding
from lam_slide_tpu.nn.norms import layer_norm


class FirstStageBackbone(nn.Module):
    """encode/decode pair around the latent bottleneck.

    input_embedder: nn.Module, batch_dict -> [B, N, F]
    encoder:        nn.Module, (x, entity_emb, mask) -> [B, L, D]
    decoder:        nn.Module, (latents, entity_emb) -> {name: [B, N, out]}
    """

    dim_latent: int
    n_entities: int
    dim_entity: int
    input_embedder: nn.Module
    encoder: nn.Module
    decoder: nn.Module
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.entity_embedding = EntityEmbedding(
            n_entities=self.n_entities, embedding_dim=self.dim_entity, dtype=self.dtype,
            name="embed_entity",
        )
        self.quant_dense = nn.Dense(
            self.dim_latent, kernel_init=torch_linear_init, dtype=self.dtype, name="quant"
        )
        self.post_quant_dense = nn.Dense(
            self.dim_latent, kernel_init=torch_linear_init, dtype=self.dtype, name="post_quant"
        )

    def encode(
        self, batch: Dict[str, jnp.ndarray], deterministic: bool = True
    ) -> jnp.ndarray:
        """batch -> latent z [B, L, dim_latent] (lightning_base.py:36-40)."""
        x = self.input_embedder(batch)
        entity_emb = self.entity_embedding(batch["entities"])
        mask = batch.get("attention_mask")
        latents = self.encoder(x, entity_emb, mask=mask, deterministic=deterministic)
        return layer_norm(self.quant_dense(latents), eps=1e-5)

    def decode(
        self, z: jnp.ndarray, entities: jnp.ndarray, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        """z [B, L, dim_latent] -> named output heads (lightning_base.py:42-44)."""
        latents = self.post_quant_dense(layer_norm(z, eps=1e-5))
        entity_emb = self.entity_embedding(entities)
        return self.decoder(latents, entity_emb, deterministic=deterministic)

    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True):
        z = self.encode(batch, deterministic=deterministic)
        return self.decode(z, batch["entities"], deterministic=deterministic)
