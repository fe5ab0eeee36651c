"""End-to-end stage-1 MD17 smoke: the reference's debug-config equivalent
(SURVEY.md §4.3) — synthetic data, few steps, loss must drop, and the full
data-parallel step must run on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lam_slide_tpu.composites.md17 import (
    MD17FirstStageConfig,
    build_md17_first_stage,
    make_md17_first_stage_loss,
)
from lam_slide_tpu.data import Loader, pad_collate
from lam_slide_tpu.data.md17 import MD17Dataset
from lam_slide_tpu.parallel import make_mesh, shard_batch
from lam_slide_tpu.train import create_train_state, make_eval_step, make_train_step


def _tiny_cfg():
    return MD17FirstStageConfig(
        num_entities=16, dim_input=32, dim_latent=8, dim_entity=32, num_latents=8,
        dim_head_cross=8, dim_head_latent=8, num_head_cross=2, num_head_latent=2,
    )


def _init(cfg, batch):
    model = build_md17_first_stage(cfg)
    variables = model.init(jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, batch))
    return model, variables


def test_first_stage_smoke_train():
    cfg = _tiny_cfg()
    ds = MD17Dataset(molecule="ethanol", mode="train", span=10, num_entities=16,
                     force_length=64, synthetic_frames=1500, rand_rotation=False)
    loader = Loader(ds, batch_size=16, collate_fn=lambda b: pad_collate(b, 16), seed=0)
    batch0 = next(iter(loader))
    model, variables = _init(cfg, batch0)
    assert "constants" in variables  # frozen entity table lives outside params

    loss_fn = make_md17_first_stage_loss(model, cfg)
    tx = optax.adamw(3e-3)
    state = create_train_state(variables, tx)
    step = make_train_step(loss_fn, tx)
    rng = jax.random.PRNGKey(0)

    losses = []
    for epoch in range(10):
        for batch in loader:
            state, metrics = step(state, batch, rng)
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < 0.55 * np.mean(losses[:4])

    # eval on EMA weights
    eval_step = make_eval_step(loss_fn)
    m = eval_step(state, batch0, rng)
    assert np.isfinite(float(m["loss"]))


def test_first_stage_data_parallel_mesh():
    cfg = _tiny_cfg()
    ds = MD17Dataset(molecule="ethanol", mode="train", span=10, num_entities=16,
                     force_length=32, synthetic_frames=1500)
    loader = Loader(ds, batch_size=16, collate_fn=lambda b: pad_collate(b, 16), seed=0)
    batch = next(iter(loader))
    model, variables = _init(cfg, batch)
    loss_fn = make_md17_first_stage_loss(model, cfg)
    tx = optax.adamw(1e-3)

    mesh = make_mesh()
    state = create_train_state(variables, tx)
    step = make_train_step(loss_fn, tx, mesh=mesh)
    sharded = shard_batch(batch, mesh)
    state, metrics = step(state, sharded, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
