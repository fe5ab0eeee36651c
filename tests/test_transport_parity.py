"""Transport math parity vs the reference SiT implementation.

tests/golden/transport_golden.npz was produced by running the reference's
Transport/path code (torch, float64) on fixed inputs: interpolant plans,
drift decompositions, score conversions, diffusion forms, and the
DATA-prediction training loss + probability-flow drift.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lam_slide_tpu.transport import GVPCPlan, ICPlan, VPCPlan, create_transport

G = np.load(os.path.join(os.path.dirname(__file__), "golden", "transport_golden.npz"))

PLANS = {"gvp": GVPCPlan(), "linear": ICPlan(), "vp": VPCPlan()}


@pytest.mark.parametrize("name", ["gvp", "linear", "vp"])
def test_plan_matches_reference(name):
    plan = PLANS[name]
    t = jnp.asarray(G["t"], jnp.float64) if jax.config.jax_enable_x64 else jnp.asarray(G["t"])
    x0, x1 = jnp.asarray(G["x0"]), jnp.asarray(G["x1"])
    _, xt, ut = plan.plan(jnp.asarray(G["t"]), x0, x1)
    # goldens are float64; our path math runs fp32 → 1e-5 tolerance
    np.testing.assert_allclose(np.asarray(xt), G[f"{name}.xt"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ut), G[f"{name}.ut"], atol=1e-5)

    drift_m, drift_v = plan.compute_drift(jnp.asarray(G[f"{name}.xt"]), jnp.asarray(G["t"]))
    np.testing.assert_allclose(np.asarray(drift_m), G[f"{name}.drift_mean"], atol=1e-5)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(drift_v), G[f"{name}.drift_var"].shape),
        G[f"{name}.drift_var"], atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(plan.get_score_from_velocity(
            jnp.asarray(G[f"{name}.ut"]), jnp.asarray(G[f"{name}.xt"]), jnp.asarray(G["t"]))),
        G[f"{name}.score_from_velocity"], atol=1e-4,
    )
    if name != "vp":
        np.testing.assert_allclose(
            np.asarray(plan.get_score_from_data(
                jnp.asarray(G["x1"]), jnp.asarray(G[f"{name}.xt"]), jnp.asarray(G["t"]))),
            G[f"{name}.score_from_data"], atol=1e-4,
        )


@pytest.mark.parametrize("name", ["gvp", "linear", "vp"])
@pytest.mark.parametrize("form", ["constant", "SBDM", "sigma", "linear", "decreasing"])
def test_diffusion_forms(name, form):
    plan = PLANS[name]
    diff = plan.compute_diffusion(jnp.asarray(G[f"{name}.xt"]), jnp.asarray(G["t"]),
                                  form=form, norm=1.7)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(diff), G[f"{name}.diff.{form}"].shape),
        G[f"{name}.diff.{form}"], atol=1e-5,
    )


def test_data_training_loss_and_drift():
    tr = create_transport(path_type="GVP", prediction="data")
    assert tr.train_eps == 1e-3 and tr.sample_eps == 1e-3  # factory eps defaults

    model_fn = lambda x, t, **kw: 0.5 * x + 0.1
    # bypass RNG draw: use the golden's fixed (t, x0)
    t, x0, x1 = jnp.asarray(G["t"]), jnp.asarray(G["x0"]), jnp.asarray(G["x1"])
    _, xt, ut = tr.path_sampler.plan(t, x0, x1)
    pred = model_fn(xt, t)
    loss = jnp.mean((pred - x1) ** 2, axis=tuple(range(1, x1.ndim)))
    np.testing.assert_allclose(np.asarray(loss), G["data_loss"], atol=1e-6)

    drift = tr.get_drift()
    out = drift(jnp.asarray(G["xt_test"]), t, model_fn)
    np.testing.assert_allclose(np.asarray(out), G["data_drift"], atol=1e-4)
