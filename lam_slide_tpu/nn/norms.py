"""Normalization layers.

RMSNorm/QKNorm follow the reference semantics (torch_modules.py:84-105,
mmdit.py:127-148): statistics in float32, output cast back to the input
dtype, learned per-channel scale. This matters on TPU where activations are
bfloat16 — fp32 statistics keep the norm stable while the surrounding
matmuls stay on the MXU in bf16.
"""

from flax import linen as nn
from jax import numpy as jnp


def rms_normalize(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Scale-free RMS normalization computed in fp32, cast back to x.dtype."""
    x32 = x.astype(jnp.float32)
    rrms = jnp.reciprocal(jnp.sqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps))
    return (x32 * rrms).astype(x.dtype)


def layer_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Non-affine LayerNorm in fp32 (reference: nn.LayerNorm(elementwise_affine=False))."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    out = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    return out.astype(x.dtype)


class RMSNorm(nn.Module):
    """RMSNorm with learned scale (reference mmdit.py:127-136)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        return rms_normalize(x, self.eps) * scale.astype(x.dtype)


class QKNorm(nn.Module):
    """Per-head RMSNorm of queries and keys before attention (mmdit.py:139-148)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray):
        q = RMSNorm(eps=self.eps, name="query_norm")(q)
        k = RMSNorm(eps=self.eps, name="key_norm")(k)
        return q, k


class LayerNorm(nn.Module):
    """Affine LayerNorm (torch nn.LayerNorm default: weight+bias), fp32 stats."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        out = layer_norm(x, self.eps)
        return out * weight.astype(out.dtype) + bias.astype(out.dtype)
