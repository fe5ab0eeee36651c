"""Unit tests for the core nn library (norms, attention, blocks, embeddings, losses)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lam_slide_tpu.nn import blocks, embeddings, ema, losses, norms, schedules
from lam_slide_tpu.ops.attention import linear_attention, xla_attention


def test_rms_normalize_matches_formula():
    x = jax.random.normal(jax.random.key(0), (4, 16))
    out = norms.rms_normalize(x)
    expected = x / np.sqrt(np.mean(np.asarray(x) ** 2, axis=-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_layer_norm_zero_mean_unit_var():
    x = jax.random.normal(jax.random.key(1), (3, 32)) * 5 + 2
    out = norms.layer_norm(x)
    np.testing.assert_allclose(np.asarray(out.mean(-1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.std(-1)), 1.0, atol=1e-3)


def test_xla_attention_uniform_when_logits_equal():
    # identical keys -> attention output = mean of values
    q = jnp.ones((1, 2, 3, 8))
    k = jnp.ones((1, 2, 5, 8))
    v = jnp.arange(5, dtype=jnp.float32).reshape(1, 1, 5, 1) * jnp.ones((1, 2, 5, 8))
    out = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-5)


def test_xla_attention_key_padding_mask():
    key = jax.random.key(2)
    q = jax.random.normal(key, (2, 2, 3, 8))
    k = jax.random.normal(jax.random.key(3), (2, 2, 5, 8))
    v = jax.random.normal(jax.random.key(4), (2, 2, 5, 8))
    mask = jnp.array([[True, True, True, False, False], [True] * 5])
    out = xla_attention(q, k, v, mask=mask)
    # masked result must equal attention over only the first 3 keys for batch 0
    out_trunc = xla_attention(q[:1, :, :, :], k[:1, :, :3], v[:1, :, :3])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out_trunc[0]), rtol=2e-4, atol=1e-5)


def test_linear_attention_shape_and_finite():
    q = jax.random.normal(jax.random.key(5), (2, 4, 10, 16))
    out = linear_attention(q, q, q)
    assert out.shape == (2, 4, 10, 16)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_self_attention_block_mask_invariance():
    """Padding entries must not affect outputs of valid queries (SURVEY §4)."""
    block = blocks.CrossAttentionBlock(heads=2, dim_head=8, qk_norm=True)
    lat = jax.random.normal(jax.random.key(6), (1, 4, 32))
    ctx = jax.random.normal(jax.random.key(7), (1, 6, 16))
    mask = jnp.array([[True, True, True, True, False, False]])
    params = block.init(jax.random.key(8), lat, ctx, mask)
    out1 = block.apply(params, lat, ctx, mask)
    # perturb masked context rows: output must be identical
    ctx2 = ctx.at[:, 4:].set(123.0)
    out2 = block.apply(params, lat, ctx2, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_entity_embedding_orthonormal_and_frozen_collection():
    mod = embeddings.EntityEmbedding(n_entities=32, embedding_dim=128)
    variables = mod.init(jax.random.key(0), jnp.arange(32))
    assert "constants" in variables and "params" not in variables
    table = np.asarray(variables["constants"]["embedding"])
    gram = table @ table.T
    np.testing.assert_allclose(gram, np.eye(32), atol=1e-5)


def test_point_embed_shapes():
    mod = embeddings.PointEmbed(hidden_dim=126, embedding_dim=128)
    x = jax.random.normal(jax.random.key(1), (2, 7, 3))
    variables = mod.init(jax.random.key(2), x)
    out = mod.apply(variables, x)
    assert out.shape == (2, 7, 128)


def test_timestep_embedding_matches_reference_formula():
    t = jnp.array([0.25, 0.5])
    emb = embeddings.timestep_embedding(t, 8)
    half = 4
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * 1000.0 * freqs[None]
    expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    np.testing.assert_allclose(np.asarray(emb), expected, rtol=1e-4)


def test_masked_mse_ignores_masked_items():
    pred = jnp.array([[1.0, 1.0], [5.0, 5.0]])
    target = jnp.zeros((2, 2))
    mask = jnp.array([1.0, 0.0])
    assert float(losses.masked_mse(pred, target, mask)) == pytest.approx(1.0)


def test_masked_cross_entropy_perfect_prediction():
    logits = jnp.array([[100.0, 0.0], [0.0, 100.0]])
    target = jnp.array([0, 1])
    mask = jnp.ones(2)
    assert float(losses.masked_cross_entropy(logits, target, mask)) == pytest.approx(0.0, abs=1e-5)


def test_inter_distance_zero_for_rigid_translation():
    x = jax.random.normal(jax.random.key(3), (2, 5, 3))
    shifted = x + 7.0
    mask = jnp.ones((2, 5))
    assert float(losses.inter_distance(shifted, x, mask)) == pytest.approx(0.0, abs=1e-8)


def test_cdist_gradient_finite_at_zero():
    x = jnp.zeros((1, 3, 2))
    g = jax.grad(lambda a: losses.inter_distance(a, a + 1.0, jnp.ones((1, 3))))(x)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_ade_fde():
    pred = jnp.zeros((1, 4, 2, 3))
    target = jnp.ones((1, 4, 2, 3))
    ade, fde = losses.ade_fde(pred, target)
    np.testing.assert_allclose(np.asarray(ade), np.sqrt(3.0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fde), np.sqrt(3.0), rtol=1e-6)


def test_ema_update_moves_toward_params():
    ema_p = {"w": jnp.zeros(3)}
    params = {"w": jnp.ones(3)}
    out = ema.ema_update(ema_p, params, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)


def test_schedule_warmup_and_cosine_endpoints():
    sched = schedules.linear_warmup_cosine(
        base_lr=1e-3, warmup_epochs=2, max_epochs=10, steps_per_epoch=100, min_lr=1e-7
    )
    assert float(sched(0)) == pytest.approx(1e-3 / 200)
    assert float(sched(199)) == pytest.approx(1e-3)
    assert float(sched(999)) == pytest.approx(1e-7, rel=1e-2)


def test_schedule_no_warmup_starts_at_base():
    sched = schedules.linear_warmup_cosine(
        base_lr=4e-4, warmup_epochs=0, max_epochs=100, steps_per_epoch=10, min_lr=1e-7
    )
    assert float(sched(0)) == pytest.approx(4e-4, rel=1e-4)


class TestExtraLossVariants:
    def test_masked_cosine_v3_clamps(self):
        import jax.numpy as jnp
        from lam_slide_tpu.nn.losses import masked_cosine_v3

        pred = jnp.zeros((4, 3))
        target = jnp.zeros((4, 3))
        mask = jnp.ones(4)
        # identical inputs still pay the 1e-3 clamp floor
        v = float(masked_cosine_v3(pred, target, mask))
        assert v == pytest.approx(3 * 1e-6, rel=1e-3)

    def test_inter_distance_signed_and_adjacent(self):
        import jax.numpy as jnp
        from lam_slide_tpu.nn.losses import (
            inter_distance_adjacent,
            inter_distance_signed,
        )

        pred = jnp.asarray([[[0.0, 0, 0], [2.0, 0, 0], [4.0, 0, 0]]])
        target = jnp.asarray([[[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]]])
        mask = jnp.ones((1, 3))
        signed = float(inter_distance_signed(pred, target, mask))
        assert signed > 0  # predictions uniformly stretched
        adj = jnp.asarray([[[0, 1, 0], [1, 0, 1], [0, 1, 0]]], jnp.float32)
        v = float(inter_distance_adjacent(pred, target, adj))
        assert v == pytest.approx(1.0)  # each bonded pair off by exactly 1
