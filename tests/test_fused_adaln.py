"""Fused residual+AdaLN kernels vs the unfused reference composition.

The kernels run through the Pallas interpreter here (CPU); numerics
contract: ulp-level in fp32 (reduction order over the kernel's 2D row
blocks differs from XLA's 4D reduce), bf16 within per-op rounding.
Gradients match the unfused path to the same ulp level (the custom VJP
backward is jax.vjp of the reference composition; only the primal values
flowing into downstream cotangents differ).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lam_slide_tpu.ops import fused_adaln as fa


@pytest.fixture(autouse=True)
def force_kernel(monkeypatch):
    monkeypatch.setattr(fa, "FORCE_KERNEL", True)


def _inputs(dtype, b=2, t=7, l=3, d=128, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (b, t, l, d), dtype)
    h = jax.random.normal(ks[1], (b, t, l, d), dtype)
    gate = jax.random.normal(ks[2], (b, 1, 1, d), jnp.float32)
    shift = jax.random.normal(ks[3], (b, 1, 1, d), jnp.float32)
    scale = jax.random.normal(ks[4], (b, 1, 1, d), jnp.float32)
    return x, h, gate, shift, scale


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5), (jnp.bfloat16, 1e-2)])
def test_adaln_modulate_parity(dtype, tol):
    x, _, _, shift, scale = _inputs(dtype)
    got = fa.adaln_modulate(x, shift, scale)
    want = fa._reference_adaln(x, shift, scale, 1e-6)
    assert got.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5), (jnp.bfloat16, 8e-2)])
def test_residual_adaln_parity(dtype, tol):
    # bf16 tol: a one-ulp residual flip amplified by (1+scale)~2.5 and
    # re-rounded can move y by a few bf16 ulps on <0.1% of elements
    x, h, gate, shift, scale = _inputs(dtype)
    xn, y = fa.residual_adaln_modulate(x, h, gate, shift, scale)
    xn_ref, y_ref = fa._reference_residual_adaln(x, h, gate, shift, scale, 1e-6)
    # the residual has no reduction but the compiler may contract mul+add
    # into a single-rounding FMA on either side; under cancellation the
    # difference is bounded by one ulp of the OPERANDS (gate·h), not of the
    # (possibly tiny) result — so compare with operand-scaled atol
    operand = np.abs(np.asarray(x, np.float32)) + np.abs(
        np.asarray(gate, np.float32) * np.asarray(h, np.float32))
    eps = 0.008 if dtype == jnp.bfloat16 else 1.2e-7
    diff = np.abs(np.asarray(xn, np.float32) - np.asarray(xn_ref, np.float32))
    assert (diff <= eps * operand + 1e-9).all()
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=tol, atol=tol)


def test_ragged_rows_and_small_dim():
    """Row count not a multiple of the block and a narrow (but lane-legal)
    feature dim: edge-block masking must not corrupt in-range rows."""
    x, _, _, shift, scale = _inputs(jnp.float32, b=3, t=11, l=5, d=128, seed=3)
    got = fa.adaln_modulate(x, shift, scale)
    want = fa._reference_adaln(x, shift, scale, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_unfused():
    x, h, gate, shift, scale = _inputs(jnp.float32, d=128, seed=1)

    def fused(args):
        x, h, gate, shift, scale = args
        xn, y = fa.residual_adaln_modulate(x, h, gate, shift, scale)
        return jnp.sum(jnp.sin(xn) + y ** 2)

    def unfused(args):
        x, h, gate, shift, scale = args
        xn, y = fa._reference_residual_adaln(x, h, gate, shift, scale, 1e-6)
        return jnp.sum(jnp.sin(xn) + y ** 2)

    args = (x, h, gate, shift, scale)
    g_f = jax.grad(fused)(args)
    g_u = jax.grad(unfused)(args)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dit_layer_uses_fused_path_and_matches():
    """A full LatentDiT forward with the kernel forced through the
    interpreter equals the forward with the reference composition."""
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

    fa.FORCE_KERNEL = False
    try:
        out_ref = model.apply(variables, x, t, x_cond, mask)
    finally:
        fa.FORCE_KERNEL = True
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)
