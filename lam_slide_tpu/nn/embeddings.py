"""Feature / positional / entity embeddings.

Ports the semantics of the reference embedding zoo
(src/modules/embeddings.py, src/modules/entity_embeddings.py,
src/models/components/latent/mmdit.py:93-113) into stateless JAX + linen.
The "linked entities" trick lives here: every entity index maps to a frozen,
unit-norm, mutually-orthogonal code vector that is identical across all
frames of a trajectory, so entity identity survives compression into an
unordered latent set.
"""

import math
from typing import Optional

import numpy as np
from flax import linen as nn
from jax import numpy as jnp

from lam_slide_tpu.nn import initializers as inits


def timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: float = 10_000.0, time_factor: float = 1000.0
) -> jnp.ndarray:
    """Sinusoidal diffusion-time embedding (reference mmdit.py:93-113).

    t: [B] fractional timesteps in [0, 1]; returns [B, dim] = [cos | sin].
    """
    t = time_factor * t.astype(jnp.float32)
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def sincos_position_table(n_positions: int, embed_dim: int) -> np.ndarray:
    """1D sin-cos position table (reference embeddings.py:6-26): [sin | cos]."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10_000**omega
    pos = np.arange(n_positions, dtype=np.float64)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1).astype(np.float32)


def fourier_encode_dist(
    x: jnp.ndarray, num_encodings: int = 4, include_self: bool = True
) -> jnp.ndarray:
    """Multi-scale sin/cos encoding of scalar distances (embeddings.py:29-38)."""
    if num_encodings == 0:
        return x
    orig_x = x[..., None]
    scales = 2 ** jnp.arange(num_encodings, dtype=x.dtype)
    scaled = orig_x / scales
    out = jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
    if include_self:
        out = jnp.concatenate([out, orig_x], axis=-1)
    return out


def mask_rows(rng, x: jnp.ndarray, p: float = 0.1, train: bool = True) -> jnp.ndarray:
    """Row dropout without rescaling (reference embeddings.py mask_emb)."""
    if not train or p == 0:
        return x
    import jax

    keep = jax.random.bernoulli(rng, 1.0 - p, shape=(*x.shape[:-1], 1))
    return x * keep.astype(x.dtype)


class SinCosPositionalEmbedding1D(nn.Module):
    """Adds a fixed sin-cos table to x[:, :S] (embeddings.py:41-47)."""

    n_positions: int
    embed_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        table = jnp.asarray(sincos_position_table(self.n_positions, self.embed_dim))
        s = x.shape[-2]
        return x + table[:s][None].astype(x.dtype)


class PointEmbed(nn.Module):
    """3D Fourier point embedding (reference embeddings.py:50-88).

    Projects xyz onto a fixed power-of-two frequency basis, takes sin/cos,
    concatenates the raw coordinates and maps through a linear layer.
    """

    hidden_dim: int = 48
    embedding_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.hidden_dim % 6 == 0
        k = self.hidden_dim // 6
        e = (2.0 ** np.arange(k, dtype=np.float64)) * np.pi
        zeros = np.zeros(k)
        basis = np.stack(
            [
                np.concatenate([e, zeros, zeros]),
                np.concatenate([zeros, e, zeros]),
                np.concatenate([zeros, zeros, e]),
            ]
        ).astype(np.float32)
        self.basis = jnp.asarray(basis)  # [3, hidden_dim/2]
        self.mlp = nn.Dense(self.embedding_dim, dtype=self.dtype, name="mlp")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        proj = jnp.einsum("...nd,de->...ne", x.astype(jnp.float32), self.basis)
        feats = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        feats = jnp.concatenate([feats.astype(x.dtype), x], axis=-1)
        return self.mlp(feats)


def _clamp_rows(table: jnp.ndarray, max_norm: Optional[float]) -> jnp.ndarray:
    if max_norm is None:
        return table
    norms = jnp.linalg.norm(table.astype(jnp.float32), axis=-1, keepdims=True)
    factor = jnp.minimum(1.0, max_norm / jnp.maximum(norms, 1e-12))
    return table * factor.astype(table.dtype)


class Embed(nn.Module):
    """Trainable embedding with torch-style max_norm row clamping at lookup."""

    num_embeddings: int
    embedding_dim: int
    max_norm: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=1.0),
            (self.num_embeddings, self.embedding_dim),
            jnp.float32,
        )
        table = _clamp_rows(table, self.max_norm)
        return jnp.take(table, ids, axis=0).astype(self.dtype)


class EntityEmbedding(nn.Module):
    """Frozen orthogonal entity codes (reference entity_embeddings.py:7-30).

    Stored in the non-trainable ``constants`` collection so neither gradients
    nor AdamW weight decay ever touch it — the functional equivalent of
    ``requires_grad=False``. Rows are orthonormal (n_entities <= embed_dim),
    so the reference's max_norm=1 clamp is a no-op and is skipped.
    """

    n_entities: int
    embedding_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, entities: jnp.ndarray) -> jnp.ndarray:
        table = self.variable(
            "constants",
            "embedding",
            lambda: inits.orthogonal_rows()(
                self.make_rng("params"), (self.n_entities, self.embedding_dim), jnp.float32
            ),
        )
        return jnp.take(table.value, entities, axis=0).astype(self.dtype)
