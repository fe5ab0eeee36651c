"""Fully-sharded data parallelism (parallel/fsdp.py).

Correctness contract: FSDP changes LAYOUT only — an 8-way FSDP training
run must produce the same losses and the same updated parameters as plain
replicated-params DP on the identical batch, while every sizable
param/EMA/moment leaf actually lives sharded over the data axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from lam_slide_tpu.models import LatentDiT
from lam_slide_tpu.parallel import (
    MeshSpec,
    make_mesh,
    shard_batch,
    shard_train_state_fsdp,
    tree_fsdp_shardings,
)
from lam_slide_tpu.parallel.fsdp import fsdp_spec
from lam_slide_tpu.train import create_train_state, make_train_step
from lam_slide_tpu.transport import create_transport

B, T, L, DIN = 8, 12, 2, 8


def _setup():
    model = LatentDiT(depth=2, in_dim=DIN, hidden_size=32, num_heads=4,
                      mlp_ratio=2, n_timesteps=T)
    key = jax.random.PRNGKey(0)
    x1 = jax.random.normal(key, (B, T, L, DIN))
    x_cond = jnp.zeros_like(x1)
    mask = jnp.zeros((B, T, L), jnp.int32).at[:, :1].set(1)
    variables = model.init(key, x1, jnp.zeros((B,)), x_cond, mask)
    transport = create_transport(path_type="GVP", prediction="data")

    def loss_fn(params, constants, batch, rng, train):
        out = transport.training_losses(
            rng,
            lambda xt, t, **kw: model.apply({"params": params}, xt, t, **kw),
            batch["x1"],
            model_kwargs={"x_cond": batch["x_cond"],
                          "x_cond_mask": batch["x_cond_mask"]},
        )
        return out["loss"].mean(), {}

    batch = {"x1": np.asarray(x1), "x_cond": np.asarray(x_cond),
             "x_cond_mask": np.asarray(mask)}
    return variables, loss_fn, batch


def _run(mesh, variables, loss_fn, batch, fsdp: bool, n_steps=2):
    tx = optax.adamw(1e-3)
    state = create_train_state(variables, tx, ema=True)
    if fsdp:
        state = shard_train_state_fsdp(state, mesh)
    step = make_train_step(loss_fn, tx, mesh=mesh, donate_state=False,
                           respect_committed=fsdp)
    sharded = shard_batch(batch, mesh)
    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, sharded, jax.random.PRNGKey(3))
        losses.append(float(metrics["loss"]))
    return losses, state


def test_fsdp_spec_rules():
    # largest divisible dim shards; indivisible leaves replicate; scalars too
    assert fsdp_spec(jnp.zeros((32, 160)), 8) == P(None, "data")
    assert fsdp_spec(jnp.zeros((160, 32)), 8) == P("data", None)
    assert fsdp_spec(jnp.zeros((3, 16, 8)), 8, min_size=0) == \
        P(None, "data", None)
    assert fsdp_spec(jnp.zeros((7, 5)), 8, min_size=0) == P()  # nothing divides
    assert fsdp_spec(jnp.zeros(()), 8) == P()
    assert fsdp_spec(jnp.zeros((64,)), 1) == P()
    # small leaves (norm scales, biases) replicate: sharding them saves no
    # memory and forces activation reshards (SPMD involuntary-remat warnings)
    assert fsdp_spec(jnp.zeros((384,)), 8) == P()
    assert fsdp_spec(jnp.zeros((3, 16, 8)), 8) == P()


def test_fsdp_matches_plain_dp():
    variables, loss_fn, batch = _setup()
    mesh = make_mesh(MeshSpec(data=8, model=1))

    losses_dp, state_dp = _run(mesh, variables, loss_fn, batch, fsdp=False)
    losses_fs, state_fs = _run(mesh, variables, loss_fn, batch, fsdp=True)

    np.testing.assert_allclose(losses_fs, losses_dp, rtol=2e-5, atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        state_fs.params, state_dp.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        state_fs.ema_params, state_dp.ema_params)


def test_fsdp_state_stays_sharded_across_steps():
    """Updated params, EMA and moments must come back in the FSDP layout
    (no silent all-gather back to replicated)."""
    variables, loss_fn, batch = _setup()
    mesh = make_mesh(MeshSpec(data=8, model=1))
    tx = optax.adamw(1e-3)
    state = shard_train_state_fsdp(create_train_state(variables, tx, ema=True),
                                   mesh)
    step = make_train_step(loss_fn, tx, mesh=mesh, donate_state=False,
                           respect_committed=True)
    sharded = shard_batch(batch, mesh)
    state, _ = step(state, sharded, jax.random.PRNGKey(0))
    w1 = state.params["block_0"]["temporal_block"]["linear1"]
    assert "data" in tuple(w1.sharding.spec), w1.sharding
    ema1 = state.ema_params["block_0"]["temporal_block"]["linear1"]
    assert "data" in tuple(ema1.sharding.spec), ema1.sharding
    mu = state.opt_state[0].mu["block_0"]["temporal_block"]["linear1"]
    assert "data" in tuple(mu.sharding.spec), mu.sharding
    # constants/step stay replicated
    assert state.step.sharding.spec == P()


def test_fsdp_shards_every_sizable_leaf():
    from lam_slide_tpu.parallel.fsdp import MIN_SHARD_ELEMENTS

    variables, _, _ = _setup()
    mesh = make_mesh(MeshSpec(data=8, model=1))
    shardings = tree_fsdp_shardings(variables["params"], mesh)
    total_b, sharded_b = 0, 0
    for leaf, sh in zip(jax.tree.leaves(variables["params"]),
                        jax.tree.leaves(shardings)):
        total_b += leaf.nbytes
        if "data" in tuple(sh.spec):
            sharded_b += leaf.nbytes
        else:
            # only small leaves or leaves with no 8-divisible dim replicate
            assert leaf.size < MIN_SHARD_ELEMENTS or all(
                d % 8 or d < 8 for d in leaf.shape), leaf.shape
    assert sharded_b / total_b > 0.5  # the bulk of the bytes actually shard


def test_fsdp_through_trainer(tmp_path):
    """TrainerConfig.fsdp wires through fit(): loss decreases, checkpoints
    save/restore, and the state stays sharded."""
    from lam_slide_tpu.train.trainer import Trainer, TrainerConfig

    variables, loss_fn, batch = _setup()
    mesh = make_mesh(MeshSpec(data=8, model=1))

    class Loader:
        full_batch_feed = False

        def __len__(self):
            return 2

        def __iter__(self):
            yield batch
            yield batch

    cfg = TrainerConfig(max_epochs=3, lr=1e-3, fsdp=True,
                        val_every_n_epochs=100)
    trainer = Trainer(cfg, loss_fn, str(tmp_path / "run"), mesh=mesh,
                      quiet=True)
    state = trainer.fit(variables, Loader())
    assert int(state.step) == 6
    import json
    recs = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    losses = [r["train/loss"] for r in recs if r.get("split") == "train"]
    assert losses[-1] < losses[0]
    w1 = state.params["block_0"]["temporal_block"]["linear1"]
    assert "data" in tuple(w1.sharding.spec), w1.sharding
