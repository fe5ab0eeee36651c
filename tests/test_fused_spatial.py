"""One-pass spatial-block kernel vs the unfused packed-lane composition.

Kernel runs through the Pallas interpreter here (CPU). Contract: ulp-level
in fp32, per-op-rounding level in bf16; gradients equal the unfused path
(custom VJP backward is jax.vjp of the reference composition).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lam_slide_tpu.models.latent_dit import rope_cos_sin
from lam_slide_tpu.ops import fused_spatial_block as fs
from lam_slide_tpu.ops.packed_attention import lane_rope_tables


@pytest.fixture(autouse=True)
def force_kernel(monkeypatch):
    monkeypatch.setattr(fs, "FORCE_KERNEL", True)


def _setup(dtype, n=37, l=2, d=128, heads=4, mlp=256, seed=0):
    dh = d // heads
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    x = jax.random.normal(ks[0], (n, l, d), dtype)
    w1 = jax.random.normal(ks[1], (d, 3 * d + mlp), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[2], (3 * d + mlp,), jnp.float32) * 0.02
    q_scale = jnp.abs(jax.random.normal(ks[3], (dh,), jnp.float32)) + 0.5
    k_scale = jnp.abs(jax.random.normal(ks[4], (dh,), jnp.float32)) + 0.5
    w2 = jax.random.normal(ks[5], (d + mlp, d), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[6], (d,), jnp.float32) * 0.02
    cos, sin = rope_cos_sin(l, dh)
    cos_l, sin_l = lane_rope_tables(cos, sin, heads)
    return (x, w1, b1, q_scale, k_scale, w2, b2, cos_l, sin_l), heads


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5), (jnp.bfloat16, 2e-2)])
@pytest.mark.parametrize("l", [2, 3, 8])
def test_forward_parity(dtype, tol, l):
    args, heads = _setup(dtype, l=l)
    got = fs.fused_spatial_block(*args, heads)
    want = fs._reference_spatial_block(*args, heads, (128 // heads) ** -0.5)
    assert got.shape == want.shape and got.dtype == want.dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


def test_ragged_grid():
    """N not a multiple of the 128-frame block."""
    args, heads = _setup(jnp.float32, n=301, l=2)
    got = fs.fused_spatial_block(*args, heads)
    want = fs._reference_spatial_block(*args, heads, (128 // heads) ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_unfused():
    args, heads = _setup(jnp.float32, n=9, l=2)
    scale = (128 // heads) ** -0.5

    def fused(a):
        return jnp.sum(fs.fused_spatial_block(*a, heads) ** 2)

    def unfused(a):
        return jnp.sum(fs._reference_spatial_block(*a, heads, scale) ** 2)

    g_f = jax.grad(fused)(args)
    g_u = jax.grad(unfused)(args)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dit_spatial_path_uses_fused_and_matches():
    """Full LatentDiT forward: kernel-forced (interpreted) output equals
    the reference-composition output."""
    from lam_slide_tpu.models import LatentDiT

    model = LatentDiT(depth=2, in_dim=16, hidden_size=128, num_heads=4,
                      n_timesteps=6)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 6, 3, 16))
    t = jax.random.uniform(key, (2,))
    x_cond = jnp.zeros_like(x)
    mask = jnp.zeros((2, 6, 3), jnp.int32).at[:, :2].set(1)
    variables = model.init(key, x, t, x_cond, mask)
    out_kernel = model.apply(variables, x, t, x_cond, mask)

    fs.FORCE_KERNEL = False
    try:
        out_ref = model.apply(variables, x, t, x_cond, mask)
    finally:
        fs.FORCE_KERNEL = True
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)
