"""Fused packed flash attention: parity with the separate packed-ops path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lam_slide_tpu.models.latent_dit import rope_cos_sin
from lam_slide_tpu.ops.ablations.fused_temporal_attention import (
    _reference_packed,
    fused_temporal_attention,
)
from lam_slide_tpu.ops.packed_attention import lane_rope_tables

N, T, H, DH = 3, 64, 4, 16
D = H * DH


def _setup(dtype=jnp.float32, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(keys[0], (N, T, D), dtype)
    k = jax.random.normal(keys[1], (N, T, D), dtype)
    v = jax.random.normal(keys[2], (N, T, D), dtype)
    cos, sin = rope_cos_sin(T, DH)
    cos_l, sin_l = lane_rope_tables(cos, sin, H)
    qs = (jax.random.uniform(keys[3], (1, D)) + 0.5)
    # per-head scale must repeat across heads (QKNorm shares [dh])
    qs = jnp.tile(qs[:, :DH], (1, H))
    ks = jnp.tile((jax.random.uniform(keys[4], (1, DH)) + 0.5), (1, H))
    return q, k, v, cos_l, sin_l, qs, ks


def test_matches_reference_path():
    q, k, v, cos_l, sin_l, qs, ks = _setup()
    out = fused_temporal_attention(q, k, v, cos_l, sin_l, qs, ks, H, DH**-0.5)
    ref = _reference_packed(q, k, v, cos_l, sin_l, qs, ks, H, DH**-0.5, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_bf16():
    q, k, v, cos_l, sin_l, qs, ks = _setup(jnp.bfloat16)
    out = fused_temporal_attention(q, k, v, cos_l, sin_l, qs, ks, H, DH**-0.5)
    ref = _reference_packed(q, k, v, cos_l, sin_l, qs, ks, H, DH**-0.5, 1e-6)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               atol=5e-2)


def test_gradients_match():
    q, k, v, cos_l, sin_l, qs, ks = _setup()

    def loss_fused(q, k, v, qs, ks):
        return jnp.sum(fused_temporal_attention(q, k, v, cos_l, sin_l, qs, ks,
                                                H, DH**-0.5) ** 2)

    def loss_ref(q, k, v, qs, ks):
        return jnp.sum(_reference_packed(q, k, v, cos_l, sin_l, qs, ks,
                                         H, DH**-0.5, 1e-6) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, qs, ks)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, qs, ks)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
