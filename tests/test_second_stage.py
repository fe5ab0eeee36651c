"""Stage-2 tests: conditioning semantics, SI training, jitted sampling, K-protocols."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lam_slide_tpu.composites.evaluation import (
    masked_ade_fde,
    mean_over_k_ade_fde,
    min_over_k_ade_fde,
    zero_target_frames,
)
from lam_slide_tpu.composites.md17 import (
    MD17FirstStageConfig,
    MD17SecondStageConfig,
    build_md17_first_stage,
    build_md17_second_stage,
)
from lam_slide_tpu.composites.second_stage import setup_conditioning
from lam_slide_tpu.data import Loader, pad_collate_temporal
from lam_slide_tpu.data.md17 import MD17Dataset
from lam_slide_tpu.train import create_train_state, make_train_step

SPAN, NE = 8, 16
COND = (0, 3)


def _fs():
    cfg = MD17FirstStageConfig(
        num_entities=NE, dim_input=32, dim_latent=8, dim_entity=32, num_latents=8,
        dim_head_cross=8, dim_head_latent=8, num_head_cross=2, num_head_latent=2,
        dropout_query=0.0,
    )
    model = build_md17_first_stage(cfg)
    return cfg, model


def _batch():
    ds = MD17Dataset(molecule="benzene", mode="val", span=SPAN, first_stage=False,
                     num_entities=NE, force_length=8, rand_rotation=False,
                     synthetic_frames=1500)
    loader = Loader(ds, batch_size=4, collate_fn=lambda b: pad_collate_temporal(b, NE),
                    shuffle=False, seed=0)
    return jax.tree.map(jnp.asarray, next(iter(loader)))


def _ss(class_conditional=False):
    fs_cfg, fs_model = _fs()
    batch = _batch()
    frame0 = {k: v[:, 0] for k, v in batch.items() if k != "cond_molecule"}
    fs_vars = fs_model.init(jax.random.PRNGKey(0), frame0)
    cfg2 = MD17SecondStageConfig(
        depth=2, in_dim=fs_cfg.dim_latent, hidden_size=32, num_heads=4,
        cond_idx=COND, num_timesteps=SPAN, class_conditional=class_conditional,
        sampling_kwargs=(("sampling_method", "euler"), ("num_steps", 4)),
    )
    ss = build_md17_second_stage(cfg2, fs_model, fs_vars)
    return cfg2, ss, fs_vars, batch


def test_setup_conditioning_semantics():
    lat = jnp.arange(2 * 6 * 3 * 4, dtype=jnp.float32).reshape(2, 6, 3, 4)
    x_cond, mask = setup_conditioning(lat, (0, 2), mask_cond_mean=True)
    assert mask.shape == (2, 6, 3)
    np.testing.assert_array_equal(np.asarray(mask[:, :2]), 1)
    np.testing.assert_array_equal(np.asarray(mask[:, 2:]), 0)
    # visible frames pass through
    np.testing.assert_allclose(np.asarray(x_cond[:, :2]), np.asarray(lat[:, :2]))
    # hidden frames = mean of visible
    expect = np.asarray(lat[:, :2].mean(axis=1))
    np.testing.assert_allclose(np.asarray(x_cond[:, 3]), expect)

    x0, m0 = setup_conditioning(lat, (0, 2), mask_cond_mean=False)
    np.testing.assert_allclose(np.asarray(x0[:, 2:]), 0.0)


def test_second_stage_train_and_grads_skip_first_stage():
    cfg2, ss, fs_vars, batch = _ss()
    x1, mk = ss.prepare_batch(fs_vars, batch)
    assert x1.shape == (4, SPAN, 8, 8)

    params = ss.backbone.init(
        jax.random.PRNGKey(1), x1, jnp.zeros((4,)), mk["x_cond"], mk["x_cond_mask"]
    )["params"]
    loss_fn = ss.make_loss(
        weight_pos_loss=0.25, weight_inter_dist_loss=0.25, calc_additional_losses=True
    )
    tx = optax.adamw(1e-3)
    fs_vars_ref = jax.tree.map(lambda a: np.array(a), fs_vars)  # step() donates buffers
    state = create_train_state({"params": params}, tx)
    state = state.replace(constants={"first_stage": fs_vars})
    step = make_train_step(loss_fn, tx)

    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(25):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # frozen first-stage variables must be untouched
    for a, b in zip(jax.tree.leaves(fs_vars_ref), jax.tree.leaves(state.constants["first_stage"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sampling_shapes_and_determinism():
    cfg2, ss, fs_vars, batch = _ss()
    x1, mk = ss.prepare_batch(fs_vars, batch)
    params = ss.backbone.init(
        jax.random.PRNGKey(1), x1, jnp.zeros((4,)), mk["x_cond"], mk["x_cond_mask"]
    )["params"]
    sample = jax.jit(
        ss.make_sample_fn(
            sampling_method="ODE",
            sampling_kwargs={"sampling_method": "euler", "num_steps": 4},
        )
    )
    out = sample(params, fs_vars, batch, jax.random.PRNGKey(3))
    assert out["pos"].shape == (4, SPAN, NE, 3)
    assert np.isfinite(np.asarray(out["pos"])).all()
    out2 = sample(params, fs_vars, batch, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(out["pos"]), np.asarray(out2["pos"]), atol=1e-6)
    out3 = sample(params, fs_vars, batch, jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(out["pos"]), np.asarray(out3["pos"]))


def test_class_conditional_and_k_sampling():
    cfg2, ss, fs_vars, batch = _ss(class_conditional=True)
    x1, mk = ss.prepare_batch(fs_vars, batch)
    assert "y_class" in mk
    params = ss.backbone.init(
        jax.random.PRNGKey(1), x1, jnp.zeros((4,)), mk["x_cond"], mk["x_cond_mask"],
        mk["y_class"],
    )["params"]
    assert "vec_in_embedding" in params

    sample_k = jax.jit(
        ss.make_k_sample_fn(
            k=3, sampling_method="ODE",
            sampling_kwargs={"sampling_method": "euler", "num_steps": 2},
        )
    )
    out = sample_k(params, fs_vars, batch, jax.random.PRNGKey(0))
    assert out["pos"].shape == (3, 4, SPAN, NE, 3)

    # test protocol: zero target frames, compute K-mean ADE/FDE
    zb = zero_target_frames(batch, COND[1])
    assert float(jnp.abs(zb["pos"][:, COND[1]:]).sum()) == 0.0
    pred_k = out["pos"][:, :, COND[1]:]
    true = batch["pos"][:, COND[1]:]
    mask = batch["attention_mask"][:, COND[1]:]
    ade, fde = mean_over_k_ade_fde(pred_k, true, mask)
    assert ade.shape == (4,) and np.isfinite(np.asarray(ade)).all()
    ade_min, _ = min_over_k_ade_fde(pred_k, true, mask)
    assert np.all(np.asarray(ade_min) <= np.asarray(ade) + 1e-6)


def test_masked_ade_fde_ignores_padding():
    pred = jnp.ones((2, 3, 4, 3))
    true = jnp.zeros((2, 3, 4, 3))
    mask = jnp.ones((2, 3, 4), bool).at[:, :, 2:].set(False)
    # corrupt padded entities wildly — metric must not change
    pred2 = pred.at[:, :, 2:].set(1e6)
    a1, f1 = masked_ade_fde(pred, true, mask)
    a2, f2 = masked_ade_fde(pred2, true, mask)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2))
    np.testing.assert_allclose(np.asarray(a1), np.sqrt(3.0), rtol=1e-6)


def test_k_chunk_matches_vmapped():
    """make_k_sample_fn(k_chunk=1) must produce the same K samples as the
    vmapped form — only the memory profile differs (sequential lax.map; the
    fp32 test protocol's OOM fix)."""
    import jax
    import numpy as np

    cfg2, ss, fs_vars, batch = _ss()
    x1, mk = ss.prepare_batch(fs_vars, batch)
    params = ss.backbone.init(
        jax.random.PRNGKey(1), x1, jnp.zeros((4,)), mk["x_cond"],
        mk["x_cond_mask"])["params"]
    rng = jax.random.PRNGKey(3)
    full = ss.make_k_sample_fn(k=4, sampling_method="ODE",
                               sampling_kwargs={"sampling_method": "euler",
                                                "num_steps": 3})
    seq = ss.make_k_sample_fn(k=4, k_chunk=1, sampling_method="ODE",
                              sampling_kwargs={"sampling_method": "euler",
                                               "num_steps": 3})
    a = full(params, fs_vars, batch, rng)
    b = seq(params, fs_vars, batch, rng)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                    atol=1e-5)
