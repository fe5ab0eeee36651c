"""Parity of the fused MLP-branch kernel (ops/fused_mlp.py) vs the
unfused two-dot composition it replaces, through the Pallas interpreter
(the kernel itself ships opt-in for the on-chip A/B)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lam_slide_tpu.ops import fused_mlp as fm


@pytest.fixture(autouse=True)
def force_kernel(monkeypatch):
    monkeypatch.setattr(fm, "FORCE_KERNEL", True)


def _case(shape, d_in, d_mid, d_out, dtype, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, (*shape, d_in), dtype)
    w1 = jax.random.normal(k2, (d_in, d_mid), dtype) * 0.05
    b1 = jax.random.normal(k3, (d_mid,), dtype)
    w2 = jax.random.normal(k4, (d_mid, d_out), dtype) * 0.05
    return x, w1, b1, w2


@pytest.mark.parametrize("shape,dims", [
    ((16, 40), (384, 768, 384)),      # bench-like dims, blocked rows
    ((3, 5, 7), (64, 128, 32)),       # odd rows (block padding path)
    ((2, 1000), (384, 768, 384)),     # temporal-axis shape (block_r=512)
])
def test_fused_mlp_matches_reference(shape, dims):
    x, w1, b1, w2 = _case(shape, *dims, jnp.float32)
    got = fm.fused_mlp(x, w1, b1, w2)
    want = fm.reference_mlp(x, w1, b1, w2)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_mlp_bf16():
    x, w1, b1, w2 = _case((8, 64), 384, 768, 384, jnp.bfloat16)
    got = np.asarray(fm.fused_mlp(x, w1, b1, w2), np.float32)
    want = np.asarray(fm.reference_mlp(x, w1, b1, w2), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_fused_mlp_grads_match_reference():
    x, w1, b1, w2 = _case((4, 16), 64, 128, 64, jnp.float32)

    def loss_fused(*a):
        return jnp.sum(jnp.square(fm.fused_mlp(*a)))

    def loss_ref(*a):
        return jnp.sum(jnp.square(fm.reference_mlp(*a)))

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w1, b1, w2)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w1, b1, w2)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_latent_dit_fused_mlp_path_parity(monkeypatch):
    """The full DiT forward with LAM_SLIDE_FUSED_MLP routing must match the
    default composition (interpreter kernel on CPU)."""
    from lam_slide_tpu.models import LatentDiT

    model = LatentDiT(depth=2, in_dim=8, hidden_size=64, num_heads=4,
                      mlp_ratio=2, n_timesteps=24, packed_threshold=4)
    b, t, l = 2, 24, 2
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, t, l, 8))
    tt = jnp.linspace(0.1, 0.9, b)
    x_cond = jnp.zeros_like(x)
    mask = jnp.zeros((b, t, l), jnp.int32).at[:, :1].set(1)
    variables = model.init(key, x, tt, x_cond, mask)
    monkeypatch.setattr(fm, "FORCE_KERNEL", False)
    base = model.apply(variables, x, tt, x_cond, mask)
    monkeypatch.setattr(fm, "FORCE_KERNEL", True)
    fused = model.apply(variables, x, tt, x_cond, mask)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               rtol=3e-5, atol=3e-5)
