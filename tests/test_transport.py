"""Transport math tests: closed-form interpolant coefficients, integrator
convergence, and end-to-end noise→data sampling with oracle models."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lam_slide_tpu.transport import (
    GVPCPlan,
    ICPlan,
    ModelType,
    PathType,
    Sampler,
    VPCPlan,
    create_transport,
)
from lam_slide_tpu.transport import integrators
from lam_slide_tpu.transport.path import expand_t


def test_ic_plan_closed_form():
    plan = ICPlan()
    t = jnp.array([0.3])
    a, da = plan.compute_alpha_t(t)
    s, ds = plan.compute_sigma_t(t)
    assert float(a[0]) == pytest.approx(0.3)
    assert float(s[0]) == pytest.approx(0.7)
    assert float(da[0]) == 1.0 and float(ds[0]) == -1.0


def test_gvp_plan_closed_form():
    plan = GVPCPlan()
    t = jnp.array([0.25])
    a, da = plan.compute_alpha_t(t)
    s, ds = plan.compute_sigma_t(t)
    assert float(a[0]) == pytest.approx(math.sin(math.pi / 8))
    assert float(s[0]) == pytest.approx(math.cos(math.pi / 8))
    assert float(da[0]) == pytest.approx(math.pi / 2 * math.cos(math.pi / 8))
    assert float(ds[0]) == pytest.approx(-math.pi / 2 * math.sin(math.pi / 8))
    # alpha^2 + sigma^2 == 1 everywhere (variance preserving)
    ts = jnp.linspace(0.01, 0.99, 23)
    a, _ = plan.compute_alpha_t(ts)
    s, _ = plan.compute_sigma_t(ts)
    np.testing.assert_allclose(np.asarray(a**2 + s**2), 1.0, rtol=1e-6)


def test_vp_plan_alpha_sigma_consistency():
    plan = VPCPlan()
    ts = jnp.linspace(0.1, 0.95, 9)
    a, _ = plan.compute_alpha_t(ts)
    s, _ = plan.compute_sigma_t(ts)
    np.testing.assert_allclose(np.asarray(a**2 + s**2), 1.0, rtol=1e-5)


def test_plan_xt_ut_consistency():
    """ut must be d/dt xt for fixed (x0, x1)."""
    plan = GVPCPlan()
    x0 = jnp.ones((1, 4)) * 0.7
    x1 = -jnp.ones((1, 4)) * 1.3
    t = jnp.array([0.4])
    eps = 1e-4
    _, xt_p, _ = plan.plan(t + eps, x0, x1)
    _, xt_m, _ = plan.plan(t - eps, x0, x1)
    _, _, ut = plan.plan(t, x0, x1)
    fd = (xt_p - xt_m) / (2 * eps)
    np.testing.assert_allclose(np.asarray(ut), np.asarray(fd), rtol=1e-3)


def test_create_transport_eps_defaults():
    tr = create_transport(path_type="GVP", prediction="data")
    assert tr.model_type == ModelType.DATA
    assert tr.path_type == PathType.GVP
    assert tr.train_eps == 1e-3 and tr.sample_eps == 1e-3
    t0, t1 = tr.check_interval(tr.train_eps, tr.sample_eps)
    assert t0 == pytest.approx(1e-3) and t1 == pytest.approx(1 - 1e-3)
    tv = create_transport(path_type="GVP", prediction="velocity")
    assert tv.train_eps == 0.0
    t0, t1 = tv.check_interval(tv.train_eps, tv.sample_eps)
    assert (t0, t1) == (0.0, 1.0)


def test_training_losses_zero_for_oracle():
    tr = create_transport(path_type="GVP", prediction="data")
    x1 = jax.random.normal(jax.random.key(0), (8, 3, 5))
    oracle = lambda xt, t: jnp.broadcast_to(x1, xt.shape)
    out = tr.training_losses(jax.random.key(1), oracle, x1)
    assert out["loss"].shape == (8,)
    np.testing.assert_allclose(np.asarray(out["loss"]), 0.0, atol=1e-10)


def test_training_losses_velocity_shape():
    tr = create_transport(path_type="GVP", prediction="velocity")
    x1 = jax.random.normal(jax.random.key(0), (4, 7))
    model = lambda xt, t: jnp.zeros_like(xt)
    out = tr.training_losses(jax.random.key(1), model, x1)
    assert out["loss"].shape == (4,)
    assert bool(jnp.all(out["loss"] > 0))


def test_ode_fixed_euler_linear_decay():
    f = lambda x, t: -x
    x0 = jnp.ones((2, 3))
    x = integrators.ode_fixed(f, x0, 0.0, 1.0, 2001, method="euler")
    np.testing.assert_allclose(np.asarray(x), math.exp(-1.0), rtol=1e-3)


def test_ode_heun_more_accurate_than_euler():
    f = lambda x, t: -x
    x0 = jnp.ones((1, 1))
    xe = integrators.ode_fixed(f, x0, 0.0, 1.0, 11, method="euler")
    xh = integrators.ode_fixed(f, x0, 0.0, 1.0, 11, method="heun")
    exact = math.exp(-1.0)
    assert abs(float(xh[0, 0]) - exact) < abs(float(xe[0, 0]) - exact)
    assert abs(float(xh[0, 0]) - exact) < 1e-3


def test_dopri5_accuracy_and_jit():
    f = lambda x, t: -x

    @jax.jit
    def solve(x0):
        return integrators.ode_dopri5(f, x0, 0.0, 1.0, rtol=1e-6, atol=1e-8)

    x = solve(jnp.ones((2, 4)))
    np.testing.assert_allclose(np.asarray(x), math.exp(-1.0), rtol=1e-5)


def test_dopri5_time_dependent():
    # dx/dt = cos(pi t) -> x(1) - x(0) = 0
    f = lambda x, t: jnp.cos(math.pi * expand_t(t, x)) * jnp.ones_like(x)
    x = integrators.ode_dopri5(f, jnp.zeros((1, 2)), 0.0, 1.0, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(x), 0.0, atol=1e-5)


MU = 1.7


def _oracle_data_model(xt, t, **kw):
    """Optimal DATA predictor when the data distribution is a point mass."""
    return jnp.full_like(xt, MU)


def test_ode_sampler_euler_recovers_point_mass():
    tr = create_transport(path_type="GVP", prediction="data")
    sample_fn = Sampler(tr).get_sample_fn(
        "ODE", {"sampling_method": "euler", "num_steps": 100}
    )
    init = jax.random.normal(jax.random.key(2), (16, 3))
    out = sample_fn(None, init, _oracle_data_model)
    np.testing.assert_allclose(np.asarray(out), MU, atol=0.05)


def test_ode_sampler_dopri5_recovers_point_mass_jitted():
    tr = create_transport(path_type="GVP", prediction="data")
    sample_fn = Sampler(tr).get_sample_fn("ODE", {})  # default dopri5 1e-6/1e-3

    @jax.jit
    def run(init):
        return sample_fn(None, init, _oracle_data_model)

    out = run(jax.random.normal(jax.random.key(3), (8, 2)))
    np.testing.assert_allclose(np.asarray(out), MU, atol=0.02)


def test_velocity_oracle_sampling():
    tr = create_transport(path_type="GVP", prediction="velocity")
    plan = GVPCPlan()

    def velocity_oracle(xt, t, **kw):
        te = expand_t(t, xt)
        a, da = plan.compute_alpha_t(te)
        s, ds = plan.compute_sigma_t(te)
        # clamp sigma: the true field is singular at t=1 (velocity-mode
        # integrates over [0, 1] exactly); a trained model is smooth there.
        x0 = (xt - a * MU) / jnp.maximum(s, 1e-3)
        return da * MU + ds * x0

    sample_fn = Sampler(tr).get_sample_fn("ODE", {"sampling_method": "heun", "num_steps": 50})
    out = sample_fn(None, jax.random.normal(jax.random.key(4), (16, 3)), velocity_oracle)
    np.testing.assert_allclose(np.asarray(out), MU, atol=0.06)


def test_sde_sampler_mean_recovers_point_mass():
    tr = create_transport(path_type="GVP", prediction="data")
    sample_fn = Sampler(tr).get_sample_fn("SDE", {"num_steps": 200})
    init = jax.random.normal(jax.random.key(5), (64, 2))
    out = sample_fn(jax.random.key(6), init, _oracle_data_model)
    assert float(jnp.abs(jnp.mean(out) - MU)) < 0.1


def test_likelihood_sampler_standard_normal():
    """For an identity-ish flow on N(0,I) data with a velocity oracle for
    N(0,I): velocity field is u = E[d_a x1 + d_s x0 | xt]; for x1,x0 ~ N(0,I)
    and GVP (a^2+s^2=1), xt ~ N(0,I) at every t and E[logp] ≈ prior."""
    tr = create_transport(path_type="GVP", prediction="velocity")
    plan = GVPCPlan()

    def velocity_oracle(xt, t, **kw):
        te = expand_t(t, xt)
        a, da = plan.compute_alpha_t(te)
        s, ds = plan.compute_sigma_t(te)
        # E[x1|xt] = a*xt, E[x0|xt] = s*xt for standard normal endpoints
        return da * a * xt + ds * s * xt

    like_fn = Sampler(tr).sample_ode_likelihood(num_steps=101)
    x = jax.random.normal(jax.random.key(7), (256, 4))
    logp, _ = like_fn(jax.random.key(8), x, velocity_oracle)
    # true E[log N(x;0,I)] for d=4 is -0.5*d*(1+log 2pi) ≈ -4.676
    expected = -0.5 * 4 * (1 + math.log(2 * math.pi))
    assert float(jnp.mean(logp)) == pytest.approx(expected, rel=0.05)


def test_dopri5_matches_scipy_rk45():
    """Cross-check the jitted adaptive RK45 against scipy.integrate at the
    reference eval tolerances (atol 1e-6, rtol 1e-3; configs/eval_peptide.yaml)
    on a stiff-ish nonlinear system."""
    from scipy.integrate import solve_ivp

    from lam_slide_tpu.transport.integrators import ode_dopri5

    def drift_np(t, y):
        return np.array([-2.0 * y[0] + np.sin(5 * t), y[0] * y[1] - 0.5 * y[1]])

    def drift_jax(x, tvec):
        t = tvec.reshape(-1)[0]
        return jnp.stack([-2.0 * x[0] + jnp.sin(5 * t),
                          x[0] * x[1] - 0.5 * x[1]])

    y0 = np.array([1.0, 0.5])
    ref = solve_ivp(drift_np, (0.0, 1.0), y0, method="RK45",
                    rtol=1e-6, atol=1e-9).y[:, -1]
    out = jax.jit(lambda x: ode_dopri5(drift_jax, x, 0.0, 1.0,
                                       rtol=1e-3, atol=1e-6))(jnp.asarray(y0))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-5)


def test_dopri5_matches_scipy_on_dit_drift():
    """Pin the bounded-while dopri5 against scipy RK45 on the ACTUAL 4AA
    stage-2 DiT drift (GVP path, data prediction, in_dim 96 / hidden 384 /
    16 heads x dh=24 — configs/model/peptide/second-stage.yaml shapes, at
    reduced depth/T for CPU feasibility), not just toy ODEs. Also pins the
    return_stats NFE plumbing the bench protocol arm uses."""
    from scipy.integrate import solve_ivp

    from lam_slide_tpu.models import LatentDiT
    from lam_slide_tpu.transport import Sampler

    t_, l_, din = 24, 2, 96
    model = LatentDiT(depth=2, in_dim=din, hidden_size=384, num_heads=16,
                      mlp_ratio=2, n_timesteps=t_)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1, t_, l_, din))
    x_cond = jnp.zeros_like(x0)
    mask = jnp.zeros((1, t_, l_), jnp.int32).at[:, :1].set(1)
    variables = model.init(key, x0, jnp.zeros((1,)), x_cond, mask)
    # perturb the zero-init output layers so the drift is non-trivial
    rng = np.random.default_rng(3)
    variables = jax.tree.map(
        lambda p: p + jnp.asarray(0.02 * rng.standard_normal(p.shape),
                                  p.dtype), variables)

    def model_fn(xt, t, **kw):
        return model.apply(variables, xt, t, **kw)

    transport = create_transport(path_type="GVP", prediction="data")
    sampler = Sampler(transport)
    t0, t1 = transport.check_interval(transport.train_eps,
                                      transport.sample_eps, sde=False,
                                      eval=True, reverse=False,
                                      last_step_size=0.0)
    drift = jax.jit(lambda x, tv: sampler.drift(x, tv, model_fn,
                                                x_cond=x_cond,
                                                x_cond_mask=mask))

    # scipy reference at tighter tolerance on the flattened system
    shape = x0.shape

    def drift_np(t, y):
        x = jnp.asarray(y.reshape(shape), jnp.float32)
        tv = jnp.full((shape[0],), t, jnp.float32)
        return np.asarray(drift(x, tv), np.float64).ravel()

    ref = solve_ivp(drift_np, (float(t0), float(t1)),
                    np.asarray(x0, np.float64).ravel(), method="RK45",
                    rtol=1e-6, atol=1e-9).y[:, -1].reshape(shape)

    sample_fn = sampler.sample_ode(sampling_method="dopri5", atol=1e-6,
                                   rtol=1e-3, return_stats=True)
    out, (n_iters, n_accepted) = jax.jit(
        lambda x: sample_fn(None, x, model_fn, x_cond=x_cond,
                            x_cond_mask=mask))(x0)
    # the NFE/steps-accepted counters the bench arm + trained-NFE tool report
    assert int(n_iters) >= int(n_accepted) > 0
    np.testing.assert_allclose(np.asarray(out, np.float64), ref,
                               rtol=5e-3, atol=5e-4)
    # stats off -> same trajectory endpoint, plain array return
    plain_fn = sampler.sample_ode(sampling_method="dopri5", atol=1e-6,
                                  rtol=1e-3)
    plain = jax.jit(
        lambda x: plain_fn(None, x, model_fn, x_cond=x_cond,
                           x_cond_mask=mask))(x0)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(out), atol=0)
