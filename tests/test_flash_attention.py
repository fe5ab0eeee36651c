"""Flash attention: numerics vs XLA reference, masking, gradients.

On CPU the Pallas kernel runs in interpret-compatible lowering via the
Mosaic CPU path; the same tests execute on real TPU through the verify
drive script.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lam_slide_tpu.ops.attention import xla_attention
from lam_slide_tpu.ops.flash_attention import flash_attention


def _inputs(key, b=2, h=4, nq=100, nk=100, d=24, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, nq, d), dtype)
    k = jax.random.normal(kk, (b, h, nk, d), dtype)
    v = jax.random.normal(kv, (b, h, nk, d), dtype)
    return q, k, v


@pytest.mark.parametrize("nq,nk,d", [(100, 100, 24), (256, 256, 64), (33, 257, 16)])
def test_matches_xla(nq, nk, d):
    q, k, v = _inputs(jax.random.PRNGKey(0), nq=nq, nk=nk, d=d)
    out = flash_attention(q, k, v)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_mask_matches_xla():
    q, k, v = _inputs(jax.random.PRNGKey(1), nk=64, nq=32)
    mask = jnp.ones((2, 64), bool).at[:, 40:].set(False)
    out = flash_attention(q, k, v, mask=mask)
    ref = xla_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
    # masked keys must not influence the output
    k2 = k.at[:, :, 40:].set(999.0)
    v2 = v.at[:, :, 40:].set(-999.0)
    out2 = flash_attention(q, k2, v2, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_bf16_runs_fp32_stats():
    q, k, v = _inputs(jax.random.PRNGKey(2), nq=128, nk=128, dtype=jnp.bfloat16)
    out = flash_attention(q, k, v)
    ref = xla_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_gradients_match_xla():
    q, k, v = _inputs(jax.random.PRNGKey(3), nq=64, nk=64, d=16)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_scale_override():
    q, k, v = _inputs(jax.random.PRNGKey(4), nq=32, nk=32)
    out = flash_attention(q, k, v, scale=0.5)
    ref = xla_attention(q, k, v, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_chunked_backward_matches_direct():
    """Force the batch-chunked backward path and compare to the XLA grads."""
    import lam_slide_tpu.ops.flash_attention as fa

    q, k, v = _inputs(jax.random.PRNGKey(10), b=5, nq=40, nk=40, d=16)
    old = fa._BWD_LOGITS_BUDGET
    try:
        fa._BWD_LOGITS_BUDGET = 4 * 40 * 40 * 2  # chunk = 2 (with b=5 → padding)
        gf = jax.grad(lambda q, k, v: jnp.sum(flash_attention(q, k, v) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
    finally:
        fa._BWD_LOGITS_BUDGET = old
    gx = jax.grad(lambda q, k, v: jnp.sum(xla_attention(q, k, v) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4)


class TestPallasBackward:
    """The TPU backward kernels, run here through the Pallas interpreter —
    exact fp32 parity with jax.grad of the XLA attention."""

    @pytest.mark.parametrize(
        "nq,nk,d,use_mask,blk",
        [
            (64, 64, 16, False, 512),    # single block
            (100, 100, 24, True, 512),   # odd length + mask, single block
            (300, 300, 32, True, 128),   # multi-block both axes
            (260, 260, 16, False, 128),  # padded final block, no mask
        ],
    )
    def test_matches_xla_grads(self, nq, nk, d, use_mask, blk):
        from lam_slide_tpu.ops.flash_attention import (
            _flash_backward, _flash_forward, _mask_to_bias)

        key = jax.random.PRNGKey(0)
        b, h = 2, 3
        q = jax.random.normal(key, (b, h, nq, d))
        k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, nk, d))
        v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, nk, d))
        g = jax.random.normal(jax.random.fold_in(key, 3), (b, h, nq, d))
        mask = None
        if use_mask:
            mask = jax.random.uniform(jax.random.fold_in(key, 4), (b, nk)) > 0.3
            mask = mask.at[:, 0].set(True)
        bias = _mask_to_bias(mask, b, nk)
        scale = float(d**-0.5)
        out, lse = _flash_forward(q, k, v, bias, scale, block_q=blk,
                                  block_k=blk, with_lse=True)
        dq, dk, dv = _flash_backward(q, k, v, bias, out, lse, g, scale,
                                     block_q=blk, block_k=blk)
        f = lambda q_, k_, v_: jnp.sum(xla_attention(q_, k_, v_, mask=mask) * g)
        rq, rk, rv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(dq, rq, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(dk, rk, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(dv, rv, rtol=1e-4, atol=1e-5)

    def test_forward_lse_is_logsumexp(self):
        from lam_slide_tpu.ops.flash_attention import _flash_forward

        key = jax.random.PRNGKey(1)
        q = jax.random.normal(key, (1, 2, 70, 16))
        scale = 0.25
        out, lse = _flash_forward(q, q, q, None, scale, with_lse=True)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, q) * scale
        ref = jax.scipy.special.logsumexp(logits, axis=-1)
        np.testing.assert_allclose(lse, ref, rtol=1e-5, atol=1e-5)


class TestShortGroupedBackward:
    """The grouped whole-attention-in-VMEM backward (retired ablation,
    ops/ablations/short_backward.py — OOMed on-chip at its target shape),
    interpreter-run: exact fp32 parity with jax.grad of the XLA attention."""

    @pytest.mark.parametrize(
        "bh,n,d,group",
        [
            (6, 64, 16, 8),     # bh not a multiple of group (padding)
            (16, 192, 24, 8),   # the MD17 spatial shape (odd head dim)
            (4, 33, 16, 4),     # odd sequence length
        ],
    )
    def test_matches_xla_grads(self, bh, n, d, group):
        from lam_slide_tpu.ops.ablations.short_backward import (
            _flash_backward_short)
        from lam_slide_tpu.ops.flash_attention import _flash_forward

        key = jax.random.PRNGKey(7)
        b, h = 2, bh // 2
        q = jax.random.normal(key, (b, h, n, d))
        k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, n, d))
        v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, n, d))
        g = jax.random.normal(jax.random.fold_in(key, 3), (b, h, n, d))
        scale = float(d**-0.5)
        out, lse = _flash_forward(q, k, v, None, scale, with_lse=True)
        dq, dk, dv = _flash_backward_short(q, k, v, out, lse, g, scale,
                                           group=group)
        f = lambda q_, k_, v_: jnp.sum(xla_attention(q_, k_, v_) * g)
        rq, rk, rv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(dq, rq, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(dk, rk, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(dv, rv, rtol=1e-4, atol=1e-5)


class TestPackedLayout:
    """flash_attention_packed: the strided-DMA packed-layout entry must be
    byte-equivalent math to head-major flash_attention (the relayout moves
    into the kernel's block DMAs, nothing else changes)."""

    @staticmethod
    def _packed(key, b=2, h=8, n=100, nk=None, dh=24, dtype=jnp.float32):
        nk = n if nk is None else nk
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, n, h * dh), dtype)
        k = jax.random.normal(kk, (b, nk, h * dh), dtype)
        v = jax.random.normal(kv, (b, nk, h * dh), dtype)
        return q, k, v

    @staticmethod
    def _ref(q, k, v, h, mask=None, scale=None):
        b, n, d_all = q.shape
        dh = d_all // h
        hm = lambda t: t.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)
        out = flash_attention(hm(q), hm(k), hm(v), mask=mask, scale=scale)
        return out.transpose(0, 2, 1, 3).reshape(b, n, d_all)

    @pytest.mark.parametrize("n,nk,dh", [(100, 100, 24), (33, 257, 16),
                                         (1000, 1000, 24)])
    def test_matches_headmajor(self, n, nk, dh):
        from lam_slide_tpu.ops.flash_attention import flash_attention_packed

        q, k, v = self._packed(jax.random.PRNGKey(0), n=n, nk=nk, dh=dh)
        out = flash_attention_packed(q, k, v, 8)
        ref = self._ref(q, k, v, 8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_masked_falls_back_correctly(self):
        # the manual kernel carries no bias row; masked calls must route to
        # the head-major path with identical mask semantics
        from lam_slide_tpu.ops.flash_attention import flash_attention_packed

        q, k, v = self._packed(jax.random.PRNGKey(1), n=300, nk=300, dh=16)
        mask = jnp.ones((2, 300), bool).at[:, 250:].set(False)
        k2 = k.at[:, 250:].set(999.0)
        v2 = v.at[:, 250:].set(-999.0)
        out2 = flash_attention_packed(q, k2, v2, 4, mask=mask)
        ref2 = self._ref(q, k2, v2, 4, mask=mask)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                                   atol=2e-5)

    def test_grads_match_headmajor(self):
        from lam_slide_tpu.ops.flash_attention import flash_attention_packed

        q, k, v = self._packed(jax.random.PRNGKey(2), n=64, dh=16)

        def loss_packed(q, k, v):
            return jnp.sum(flash_attention_packed(q, k, v, 8) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(self._ref(q, k, v, 8) ** 2)

        gp = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_dispatcher_xla_fallback_identical(self, monkeypatch):
        from lam_slide_tpu.ops import attention as am

        q, k, v = self._packed(jax.random.PRNGKey(3), n=48, dh=8)
        out_auto = am.dot_product_attention_packed(q, k, v, 8)
        monkeypatch.setattr(am, "FORCE_BACKEND", "xla")
        out_xla = am.dot_product_attention_packed(q, k, v, 8)
        np.testing.assert_allclose(np.asarray(out_auto), np.asarray(out_xla),
                                   atol=2e-5, rtol=2e-5)

    def test_bf16(self):
        from lam_slide_tpu.ops.flash_attention import flash_attention_packed

        q, k, v = self._packed(jax.random.PRNGKey(4), n=128, dh=24,
                               dtype=jnp.bfloat16)
        out = flash_attention_packed(q, k, v, 8)
        ref = self._ref(q, k, v, 8)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32), atol=3e-2)
