"""Packed-lane attention ops: numerical parity with the head-major path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lam_slide_tpu.models.latent_dit import apply_rope, rope_cos_sin
from lam_slide_tpu.nn.norms import rms_normalize
from lam_slide_tpu.ops.attention import xla_attention
from lam_slide_tpu.ops.packed_attention import (
    lane_rope_tables,
    packed_rmsnorm,
    packed_rope,
    packed_small_attention,
)

N, L, H, DH = 6, 3, 4, 16
D = H * DH


def _pack(x_heads):
    """[N, H, L, dh] -> [N, L, D] packed."""
    return x_heads.transpose(0, 2, 1, 3).reshape(N, L, D)


def _unpack(x_packed):
    return x_packed.reshape(N, L, H, DH).transpose(0, 2, 1, 3)


def test_packed_rmsnorm_matches_per_head():
    x = jax.random.normal(jax.random.PRNGKey(0), (N, H, L, DH))
    scale = jax.random.uniform(jax.random.PRNGKey(1), (DH,)) + 0.5
    ref = rms_normalize(x) * scale
    out = packed_rmsnorm(_pack(x), H, scale)
    np.testing.assert_allclose(np.asarray(_unpack(out)), np.asarray(ref), atol=1e-5)


def test_packed_rope_matches_apply_rope():
    x = jax.random.normal(jax.random.PRNGKey(2), (N, H, L, DH))
    cos, sin = rope_cos_sin(L, DH)
    ref = apply_rope(x, cos, sin)
    cos_l, sin_l = lane_rope_tables(cos, sin, H)
    out = packed_rope(_pack(x), cos_l, sin_l)
    np.testing.assert_allclose(np.asarray(_unpack(out)), np.asarray(ref), atol=1e-5)


def test_packed_small_attention_matches_xla():
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (N, H, L, DH))
    k = jax.random.normal(jax.random.PRNGKey(4), (N, H, L, DH))
    v = jax.random.normal(jax.random.PRNGKey(5), (N, H, L, DH))
    ref = xla_attention(q, k, v)
    out = packed_small_attention(_pack(q), _pack(k), _pack(v), H)
    np.testing.assert_allclose(np.asarray(_unpack(out)), np.asarray(ref), atol=1e-5)


def test_packed_pipeline_full_parity():
    """norm → rope → attention chained in both layouts."""
    key = jax.random.PRNGKey(6)
    q = jax.random.normal(key, (N, H, L, DH))
    k = jax.random.normal(jax.random.PRNGKey(7), (N, H, L, DH))
    v = jax.random.normal(jax.random.PRNGKey(8), (N, H, L, DH))
    scale = jnp.ones((DH,))
    cos, sin = rope_cos_sin(L, DH)

    qr = apply_rope(rms_normalize(q) * scale, cos, sin)
    kr = apply_rope(rms_normalize(k) * scale, cos, sin)
    ref = xla_attention(qr, kr, v)

    cos_l, sin_l = lane_rope_tables(cos, sin, H)
    qp = packed_rope(packed_rmsnorm(_pack(q), H, scale), cos_l, sin_l)
    kp = packed_rope(packed_rmsnorm(_pack(k), H, scale), cos_l, sin_l)
    out = packed_small_attention(qp, kp, _pack(v), H)
    np.testing.assert_allclose(np.asarray(_unpack(out)), np.asarray(ref), atol=1e-5)


def test_bf16_packed_attention():
    q = jax.random.normal(jax.random.PRNGKey(9), (N, L, D), jnp.bfloat16)
    out = packed_small_attention(q, q, q, H)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


class TestHeadMajorNormRope:
    """Head-major elementwise QKNorm/RoPE (the fuse-into-transpose A/B
    path, LAM_SLIDE_HEADMAJOR_NORMROPE=1) must match the packed-layout
    ops bit-for-bit in fp32 and to bf16 rounding end-to-end."""

    def test_headmajor_rmsnorm_matches_packed(self):
        from lam_slide_tpu.ops.packed_attention import headmajor_rmsnorm

        x = jax.random.normal(jax.random.PRNGKey(10), (N, H, L, DH))
        scale = jax.random.uniform(jax.random.PRNGKey(11), (DH,)) + 0.5
        ref = _unpack(packed_rmsnorm(_pack(x), H, scale))
        out = headmajor_rmsnorm(x, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_headmajor_rope_matches_packed(self):
        from lam_slide_tpu.ops.packed_attention import headmajor_rope

        x = jax.random.normal(jax.random.PRNGKey(12), (N, H, L, DH))
        cos, sin = rope_cos_sin(L, DH)
        cos_l, sin_l = lane_rope_tables(cos, sin, H)
        ref = _unpack(packed_rope(_pack(x), cos_l, sin_l))
        out = headmajor_rope(x, cos, sin)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_model_knob_parity(self, monkeypatch):
        """Full DiT forward with the knob on == knob off (fp32)."""
        from lam_slide_tpu.models import LatentDiT

        model = LatentDiT(depth=2, in_dim=8, hidden_size=32, num_heads=4,
                          mlp_ratio=2, n_timesteps=12)
        key = jax.random.PRNGKey(13)
        x = jax.random.normal(key, (2, 12, 2, 8))
        x_cond = jnp.zeros_like(x)
        mask = jnp.zeros((2, 12, 2), jnp.int32).at[:, :1].set(1)
        t = jnp.full((2,), 0.3)
        variables = model.init(key, x, t, x_cond, mask)

        monkeypatch.delenv("LAM_SLIDE_HEADMAJOR_NORMROPE", raising=False)
        ref = model.apply(variables, x, t, x_cond, mask)
        monkeypatch.setenv("LAM_SLIDE_HEADMAJOR_NORMROPE", "1")
        out = model.apply(variables, x, t, x_cond, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_model_knob_grad_parity(self, monkeypatch):
        """Gradients agree too (the knob must be training-safe)."""
        from lam_slide_tpu.models import LatentDiT

        model = LatentDiT(depth=1, in_dim=8, hidden_size=32, num_heads=4,
                          mlp_ratio=2, n_timesteps=12)
        key = jax.random.PRNGKey(14)
        x = jax.random.normal(key, (2, 12, 2, 8))
        x_cond = jnp.zeros_like(x)
        mask = jnp.zeros((2, 12, 2), jnp.int32).at[:, :1].set(1)
        t = jnp.full((2,), 0.3)
        variables = model.init(key, x, t, x_cond, mask)

        def loss(v):
            return jnp.sum(model.apply(v, x, t, x_cond, mask) ** 2)

        monkeypatch.delenv("LAM_SLIDE_HEADMAJOR_NORMROPE", raising=False)
        g_ref = jax.grad(loss)(variables)
        monkeypatch.setenv("LAM_SLIDE_HEADMAJOR_NORMROPE", "1")
        g_out = jax.grad(loss)(variables)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
            g_ref, g_out)


class TestEmitHeadMajor:
    """linear1-emits-head-major A/B path (LAM_SLIDE_EMIT_HEADMAJOR=1,
    VERDICT r2 levers a+b): the 3D-weight einsum projection + head-major
    norm/rope + 4D linear2 contraction must match the packed default."""

    def _model_io(self, depth=2):
        from lam_slide_tpu.models import LatentDiT

        model = LatentDiT(depth=depth, in_dim=8, hidden_size=32, num_heads=4,
                          mlp_ratio=2, n_timesteps=12)
        key = jax.random.PRNGKey(21)
        x = jax.random.normal(key, (2, 12, 2, 8))
        x_cond = jnp.zeros_like(x)
        mask = jnp.zeros((2, 12, 2), jnp.int32).at[:, :1].set(1)
        t = jnp.full((2,), 0.3)
        variables = model.init(key, x, t, x_cond, mask)
        return model, variables, (x, t, x_cond, mask)

    def test_model_knob_parity(self, monkeypatch):
        model, variables, args = self._model_io()
        monkeypatch.delenv("LAM_SLIDE_EMIT_HEADMAJOR", raising=False)
        ref = model.apply(variables, *args)
        monkeypatch.setenv("LAM_SLIDE_EMIT_HEADMAJOR", "1")
        out = model.apply(variables, *args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_model_knob_grad_parity(self, monkeypatch):
        model, variables, args = self._model_io(depth=1)

        def loss(v):
            return jnp.sum(model.apply(v, *args) ** 2)

        monkeypatch.delenv("LAM_SLIDE_EMIT_HEADMAJOR", raising=False)
        g_ref = jax.grad(loss)(variables)
        monkeypatch.setenv("LAM_SLIDE_EMIT_HEADMAJOR", "1")
        g_out = jax.grad(loss)(variables)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
            g_ref, g_out)
