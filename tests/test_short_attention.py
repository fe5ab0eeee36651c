"""Short-axis grouped attention kernel: numerics, grads, dispatch.

On CPU the kernels run through the Pallas interpreter; the on-chip timing
that justifies the dispatch threshold lives in docs/PERF.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lam_slide_tpu.ops.attention import (
    dot_product_attention_packed,
    xla_attention,
)
from lam_slide_tpu.ops.short_attention import short_attention


def _inputs(key, b, n, d_all, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, n, d_all), dtype)
    k = jax.random.normal(kk, (b, n, d_all), dtype)
    v = jax.random.normal(kv, (b, n, d_all), dtype)
    return q, k, v


def _headmajor_ref(q, k, v, h, scale=None):
    b, n, d_all = q.shape
    dh = d_all // h
    to_h = lambda t: t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
    out = xla_attention(to_h(q), to_h(k), to_h(v), scale=scale)
    return out.transpose(0, 2, 1, 3).reshape(b, n, d_all)


@pytest.mark.parametrize(
    "b,n,h,dh",
    [
        (6, 30, 8, 32),    # MD17 temporal stage-2 shape (scaled batch)
        (5, 30, 8, 32),    # bh not a multiple of the program panel (padding)
        (3, 20, 16, 24),   # pedestrian-ish, odd head dim
        (4, 127, 4, 16),   # top of the short range, odd length
        (2, 9, 4, 16),     # bottom of the short range
    ],
)
def test_matches_headmajor_xla(b, n, h, dh):
    q, k, v = _inputs(jax.random.PRNGKey(0), b, n, h * dh)
    out = short_attention(q, k, v, h)
    ref = _headmajor_ref(q, k, v, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_scale_override():
    q, k, v = _inputs(jax.random.PRNGKey(1), 4, 30, 256)
    out = short_attention(q, k, v, 8, scale=0.5)
    ref = _headmajor_ref(q, k, v, 8, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_bf16_runs_fp32_stats():
    q, k, v = _inputs(jax.random.PRNGKey(2), 4, 30, 256, jnp.bfloat16)
    out = short_attention(q, k, v, 8)
    assert out.dtype == jnp.bfloat16
    ref = _headmajor_ref(q, k, v, 8)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("b,n,h,dh", [(4, 30, 8, 32), (3, 20, 16, 24)])
def test_gradients_match_xla(b, n, h, dh):
    q, k, v = _inputs(jax.random.PRNGKey(3), b, n, h * dh)
    g = jax.random.normal(jax.random.PRNGKey(4), q.shape)

    def loss(fn):
        return lambda q_, k_, v_: jnp.sum(fn(q_, k_, v_) * g)

    got = jax.grad(loss(lambda *a: short_attention(*a, h)), argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(loss(lambda *a: _headmajor_ref(*a, h)), argnums=(0, 1, 2))(q, k, v)
    for gs, gr in zip(got, ref):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                                   atol=2e-4, rtol=2e-4)


def test_grad_under_jit_and_vmap_free_shapes():
    # the train step jits the whole loss; the kernel's custom VJP must trace
    q, k, v = _inputs(jax.random.PRNGKey(5), 4, 30, 256)

    @jax.jit
    def step(q, k, v):
        return jax.grad(lambda q_: jnp.sum(short_attention(q_, k, v, 8) ** 2))(q)

    out = step(q, k, v)
    assert out.shape == q.shape and bool(jnp.all(jnp.isfinite(out)))


class TestDispatch:
    def test_backend_short_routes_to_kernel(self):
        q, k, v = _inputs(jax.random.PRNGKey(6), 4, 30, 256)
        out = dot_product_attention_packed(q, k, v, 8, backend="short")
        ref = _headmajor_ref(q, k, v, 8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_masked_backend_short_falls_back_to_xla(self):
        q, k, v = _inputs(jax.random.PRNGKey(7), 4, 30, 256)
        mask = jnp.arange(30)[None, :] < jnp.array([30, 20, 10, 5])[:, None]
        out = dot_product_attention_packed(q, k, v, 8, mask=mask,
                                           backend="short")
        ref = dot_product_attention_packed(q, k, v, 8, mask=mask,
                                           backend="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)

    def test_auto_pick_off_tpu_is_xla(self):
        from lam_slide_tpu.ops.attention import _pick_backend_packed

        q = jnp.zeros((4, 30, 256))
        assert _pick_backend_packed(q, q, None) == "xla"

    def test_auto_pick_knob_requires_tpu(self, monkeypatch):
        # LAM_SLIDE_SHORT_ATTN only engages on a real TPU backend; on CPU
        # the pick must stay xla even with the knob set.
        from lam_slide_tpu.ops.attention import _pick_backend_packed

        monkeypatch.setenv("LAM_SLIDE_SHORT_ATTN", "1")
        q = jnp.zeros((4, 30, 256))
        assert _pick_backend_packed(q, q, None) == "xla"
