"""Parity tests for the norm+rope-fused flash kernel (ops/flash_normrope.py).

The fused kernel must equal the composition
``flash_attention(headmajor_rope(headmajor_rmsnorm(q)), ...)`` to fp32
exactness (identical rounding points), including gradients w.r.t. q, k, v
and the learned per-head norm scales. Kernels run through the Pallas
interpreter on CPU — same program as the chip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lam_slide_tpu.models.latent_dit import rope_cos_sin
from lam_slide_tpu.ops.flash_attention import flash_attention
from lam_slide_tpu.ops.flash_normrope import (
    _nr_core,
    _pre_transform,
    flash_attention_normrope,
)
from lam_slide_tpu.ops.attention import xla_attention


def _inputs(b=2, h=3, nq=40, nk=40, d=8, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(ks[0], (b, h, nq, d), dtype)
    k = jax.random.normal(ks[1], (b, h, nk, d), dtype)
    v = jax.random.normal(ks[2], (b, h, nk, d), dtype)
    qs = 1.0 + 0.1 * jax.random.normal(ks[3], (d,), jnp.float32)
    kss = 1.0 + 0.1 * jax.random.normal(ks[4], (d,), jnp.float32)
    cos, sin = rope_cos_sin(max(nq, nk), d)
    return q, k, v, qs, kss, cos[:nq], sin[:nq]


def _reference(q, k, v, qs, ks, cos, sin, scale=None):
    q_t, k_t = _pre_transform(q, k, qs, ks, cos, sin)
    return xla_attention(q_t, k_t, v, scale=scale)


class TestForwardParity:
    def test_single_block_fp32_exact(self):
        q, k, v, qs, ks, cos, sin = _inputs()
        got = flash_attention_normrope(q, k, v, qs, ks, cos, sin)
        want = _reference(q, k, v, qs, ks, cos, sin)
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)

    def test_multi_block_and_padding(self):
        # nq=70 with block 32 -> padded q blocks; nk=90 with block 32 ->
        # masked final key block exercises the padding-key path.
        q, k, v, qs, ks, cos, sin = _inputs(nq=70, nk=70)
        got = _nr_core(q, k, v, qs, ks, cos, sin, float(q.shape[-1] ** -0.5),
                       32, 32)
        want = _reference(q, k, v, qs, ks, cos, sin)
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)

    def test_bf16(self):
        q, k, v, qs, ks, cos, sin = _inputs(dtype=jnp.bfloat16, seed=1)
        got = flash_attention_normrope(q, k, v, qs, ks, cos, sin)
        want = _reference(q, k, v, qs, ks, cos, sin)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=0.02, atol=0.02,
        )

    def test_explicit_scale(self):
        q, k, v, qs, ks, cos, sin = _inputs(seed=2)
        got = flash_attention_normrope(q, k, v, qs, ks, cos, sin, scale=0.31)
        want = _reference(q, k, v, qs, ks, cos, sin, scale=0.31)
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)

    def test_mask_falls_back_to_composition(self):
        q, k, v, qs, ks, cos, sin = _inputs(seed=3)
        mask = jnp.ones((q.shape[0], k.shape[2]), bool).at[:, -5:].set(False)
        got = flash_attention_normrope(q, k, v, qs, ks, cos, sin, mask=mask)
        q_t, k_t = _pre_transform(q, k, qs, ks, cos, sin)
        want = xla_attention(q_t, k_t, v, mask=mask)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


class TestGradientParity:
    def _grads(self, fn, args):
        def loss(q, k, v, qs, ks):
            out = fn(q, k, v, qs, ks)
            return jnp.sum(out * jnp.cos(out.astype(jnp.float32)))

        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)

    def test_grads_match_composition(self):
        q, k, v, qs, ks, cos, sin = _inputs(seed=4)
        got = self._grads(
            lambda q_, k_, v_, qs_, ks_: flash_attention_normrope(
                q_, k_, v_, qs_, ks_, cos, sin),
            (q, k, v, qs, ks),
        )
        want = self._grads(
            lambda q_, k_, v_, qs_, ks_: _reference(q_, k_, v_, qs_, ks_, cos, sin),
            (q, k, v, qs, ks),
        )
        for g, w, name in zip(got, want, ["dq", "dk", "dv", "dqs", "dks"]):
            np.testing.assert_allclose(g, w, rtol=5e-5, atol=5e-5, err_msg=name)

    def test_grads_multi_block(self):
        q, k, v, qs, ks, cos, sin = _inputs(nq=70, nk=70, seed=5)
        scale = float(q.shape[-1] ** -0.5)
        got = self._grads(
            lambda q_, k_, v_, qs_, ks_: _nr_core(
                q_, k_, v_, qs_, ks_, cos, sin, scale, 32, 32),
            (q, k, v, qs, ks),
        )
        want = self._grads(
            lambda q_, k_, v_, qs_, ks_: _reference(q_, k_, v_, qs_, ks_, cos, sin),
            (q, k, v, qs, ks),
        )
        for g, w, name in zip(got, want, ["dq", "dk", "dv", "dqs", "dks"]):
            np.testing.assert_allclose(g, w, rtol=5e-5, atol=5e-5, err_msg=name)


class TestModelPathParity:
    def test_dit_block_knob_matches_default(self, monkeypatch):
        """The model's temporal branch with LAM_SLIDE_KERNEL_NORMROPE=1
        equals the default packed-lane path to fp32 tolerance."""
        from lam_slide_tpu.models.latent_dit import ParallelMLPAttention

        x = jax.random.normal(jax.random.PRNGKey(7), (2, 40, 48))
        cos, sin = rope_cos_sin(40, 48 // 4)
        mod = ParallelMLPAttention(hidden_size=48, num_heads=4,
                                   packed_threshold=8)
        params = mod.init(jax.random.PRNGKey(8), x, cos, sin)
        base = mod.apply(params, x, cos, sin)
        monkeypatch.setenv("LAM_SLIDE_KERNEL_NORMROPE", "1")
        fused = mod.apply(params, x, cos, sin)
        np.testing.assert_allclose(fused, base, rtol=2e-5, atol=2e-5)

    def test_knob_respects_forced_xla_backend(self, monkeypatch):
        """Tensor parallelism forces the XLA attention path; the fused
        kernel (a GSPMD-opaque custom call) must not engage."""
        from lam_slide_tpu.models import latent_dit as ld
        from lam_slide_tpu.models.latent_dit import ParallelMLPAttention

        x = jax.random.normal(jax.random.PRNGKey(9), (1, 33, 24))
        cos, sin = rope_cos_sin(33, 24 // 2)
        mod = ParallelMLPAttention(hidden_size=24, num_heads=2,
                                   packed_threshold=8)
        params = mod.init(jax.random.PRNGKey(10), x, cos, sin)
        monkeypatch.setenv("LAM_SLIDE_KERNEL_NORMROPE", "1")
        monkeypatch.setenv("LAM_SLIDE_ATTN_BACKEND", "xla")
        calls = []
        from lam_slide_tpu.ops import attention as am

        real_hm = ld.dot_product_attention
        real_pk = am.dot_product_attention_packed

        def spy_hm(*a, **kw):
            calls.append("headmajor")
            return real_hm(*a, **kw)

        def spy_pk(*a, **kw):
            calls.append("packed")
            return real_pk(*a, **kw)

        monkeypatch.setattr(ld, "dot_product_attention", spy_hm)
        # the default long-axis route is the packed dispatcher (which honors
        # the forced backend internally) — either dispatcher satisfies the
        # invariant that the normrope kernel does not engage
        monkeypatch.setattr(am, "dot_product_attention_packed", spy_pk)
        mod.apply(params, x, cos, sin)
        assert calls, "forced-xla run must use a dispatcher, not the kernel"
