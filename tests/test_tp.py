"""Tensor parallelism over the mesh 'model' axis (parallel/tp.py).

Correctness contract: GSPMD sharding changes layout, never semantics —
a (data=4, model=2) training run must produce the same losses and the
same updated parameters as (data=8, model=1) on the identical batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from lam_slide_tpu.models import LatentDiT
from lam_slide_tpu.parallel import (
    MeshSpec,
    make_mesh,
    shard_batch,
    shard_train_state,
    tree_tp_shardings,
)
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


def _run(mesh, variables, loss_fn, batch, tp: bool, n_steps=2):
    tx = optax.adamw(1e-3)
    state = create_train_state(variables, tx)
    if tp:
        state = shard_train_state(state, mesh)
    step = make_train_step(loss_fn, tx, mesh=mesh, donate_state=False,
                           respect_committed=tp)
    sharded = shard_batch(batch, mesh)
    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, sharded, jax.random.PRNGKey(3))
        losses.append(float(metrics["loss"]))
    return losses, jax.tree.map(np.asarray, state.params)


def test_tp_spec_rules():
    variables, _, _ = _setup()
    mesh = make_mesh(MeshSpec(data=4, model=2))
    shardings = tree_tp_shardings(variables["params"], mesh)
    blk = shardings["block_0"]["temporal_block"]
    assert blk["linear1"].spec == P(None, "model")
    assert blk["linear1_bias"].spec == P("model")
    assert blk["linear2"]["kernel"].spec == P("model", None)
    assert blk["linear2"]["bias"].spec == P()
    assert shardings["x_in"]["kernel"].spec == P()
    # modulation is replicated (its 192-wide output is AdaLN glue, not
    # a column-parallel matmul)
    assert shardings["block_0"]["modulation"]["lin"]["kernel"].spec == P()


def test_tp_matches_data_parallel():
    variables, loss_fn, batch = _setup()
    mesh_dp = make_mesh(MeshSpec(data=8, model=1))
    mesh_tp = make_mesh(MeshSpec(data=4, model=2))

    losses_dp, params_dp = _run(mesh_dp, variables, loss_fn, batch, tp=False)
    losses_tp, params_tp = _run(mesh_tp, variables, loss_fn, batch, tp=True)

    np.testing.assert_allclose(losses_tp, losses_dp, rtol=2e-5, atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5),
        params_tp, params_dp)


def test_tp_state_stays_sharded_across_steps():
    """The updated params must come back in the TP layout (no silent
    all-gather back to replicated)."""
    variables, loss_fn, batch = _setup()
    mesh = make_mesh(MeshSpec(data=4, model=2))
    tx = optax.adamw(1e-3)
    state = shard_train_state(create_train_state(variables, tx), mesh)
    step = make_train_step(loss_fn, tx, mesh=mesh, donate_state=False,
                           respect_committed=True)
    sharded = shard_batch(batch, mesh)
    state, _ = step(state, sharded, jax.random.PRNGKey(0))
    w1 = state.params["block_0"]["temporal_block"]["linear1"]
    assert w1.sharding.spec == P(None, "model"), w1.sharding
    mu = state.opt_state[0].mu["block_0"]["temporal_block"]["linear1"]
    assert mu.sharding.spec == P(None, "model"), mu.sharding


def test_indivisible_dims_fall_back_to_replicated():
    from jax.tree_util import DictKey

    from lam_slide_tpu.parallel.tp import dit_tp_spec

    path = (DictKey("block_0"), DictKey("temporal_block"), DictKey("linear1"))
    divisible = jnp.zeros((32, 160))
    indivisible = jnp.zeros((32, 150))  # 150 % 8 != 0
    assert dit_tp_spec(path, divisible, 8) == P(None, "model")
    assert dit_tp_spec(path, indivisible, 8) == P()
    assert dit_tp_spec(path, divisible, 1) == P()  # model axis absent


def test_tp_spec_rules_scan_layers_stacked():
    """scan_layers stacks block params with a leading depth axis
    (blocks/layer/..., kernels ndim 3) — the rules must shard the SAME
    trailing dims and never the depth axis."""
    model = LatentDiT(depth=2, in_dim=DIN, hidden_size=32, num_heads=4,
                      mlp_ratio=2, n_timesteps=T, scan_layers=True)
    key = jax.random.PRNGKey(0)
    x1 = jax.random.normal(key, (2, T, L, DIN))
    mask = jnp.zeros((2, T, L), jnp.int32).at[:, :1].set(1)
    variables = model.init(key, x1, jnp.zeros((2,)), jnp.zeros_like(x1), mask)
    mesh = make_mesh(MeshSpec(data=4, model=2))
    shardings = tree_tp_shardings(variables["params"], mesh)
    blk = shardings["blocks"]["layer"]["temporal_block"]
    assert blk["linear1"].spec == P(None, None, "model")
    assert blk["linear1_bias"].spec == P(None, "model")
    assert blk["linear2"]["kernel"].spec == P(None, "model", None)
    assert blk["linear2"]["bias"].spec == P()


def test_tp_matches_data_parallel_scan_layers():
    """TP equivalence holds for the stacked (nn.scan) parameter layout."""
    model = LatentDiT(depth=2, in_dim=DIN, hidden_size=32, num_heads=4,
                      mlp_ratio=2, n_timesteps=T, scan_layers=True)
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
    mesh_dp = make_mesh(MeshSpec(data=8, model=1))
    mesh_tp = make_mesh(MeshSpec(data=4, model=2))
    losses_dp, _ = _run(mesh_dp, variables, loss_fn, batch, tp=False)
    losses_tp, _ = _run(mesh_tp, variables, loss_fn, batch, tp=True)
    np.testing.assert_allclose(losses_tp, losses_dp, rtol=2e-5, atol=1e-6)


def test_attention_backend_override(monkeypatch):
    """ops.attention.FORCE_BACKEND (set by cli --model-axis) pins dispatch
    to the GSPMD-partitionable XLA path regardless of shape/platform."""
    from lam_slide_tpu.ops import attention

    q = jnp.zeros((1, 2, 256, 16))  # long seq: auto would consider pallas
    monkeypatch.setattr(attention, "FORCE_BACKEND", "xla")
    assert attention._pick_backend(q, None) == "xla"
    monkeypatch.setattr(attention, "FORCE_BACKEND", None)
    monkeypatch.setenv("LAM_SLIDE_ATTN_BACKEND", "xla")
    assert attention._pick_backend(q, None) == "xla"


def test_tp_checkpoint_roundtrip(tmp_path):
    """A TP-sharded state checkpoints and restores into a fresh host state
    byte-identically (the Trainer restores BEFORE sharding on resume)."""
    from lam_slide_tpu.train.checkpoint import CheckpointManager

    variables, _, _ = _setup()
    mesh = make_mesh(MeshSpec(data=4, model=2))
    tx = optax.adamw(1e-3)
    state = shard_train_state(create_train_state(variables, tx), mesh)
    ckpt = CheckpointManager(str(tmp_path), monitor="loss")
    ckpt.save(state, {"loss": 1.0})
    restored = ckpt.restore(create_train_state(variables, tx), "last")
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored.params, jax.tree.map(np.asarray, state.params))
