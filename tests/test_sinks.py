"""Metric-sink interface (train/sinks.py) — the external-tracking surface
replacing the reference's wandb logger (configs/logger/wandb.yaml,
src/utils/logging_utils.py:12-65)."""

import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from lam_slide_tpu.train.sinks import CallableSink, MetricSink
from lam_slide_tpu.train.trainer import Trainer, TrainerConfig


class _Tiny(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(1)(x)


def _fit(tmp_path, sinks):
    model = _Tiny()
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 4))
    y = x @ jnp.ones((4, 1))
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(params, constants, batch, rng, train):
        pred = model.apply({"params": params}, batch["x"])
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, {"mse": loss}

    class Loader:
        def __len__(self):
            return 1

        def __iter__(self):
            yield {"x": x, "y": y}

    cfg = TrainerConfig(max_epochs=2, lr=1e-2, monitor="loss")
    trainer = Trainer(cfg, loss_fn, str(tmp_path / "run"), quiet=True, sinks=sinks)
    trainer.fit(variables, Loader(), {"val": Loader()})


def test_callable_sink_receives_stream_and_hparams(tmp_path):
    records, hparams = [], []
    sink = CallableSink(records.append, hparams_fn=hparams.append)
    closed = []
    sink.close = lambda: closed.append(True)  # track close through the logger
    _fit(tmp_path, [sink])

    splits = {r.get("split") for r in records}
    assert "train" in splits and "val/val" in splits
    assert any("train/loss" in r for r in records)
    assert hparams and hparams[0]["params"] > 0
    assert hparams[0]["trainer/max_epochs"] == 2
    assert closed == [True]


def test_default_base_sink_is_noop(tmp_path):
    _fit(tmp_path, [MetricSink()])  # must not raise


def test_tensorboard_sink_writes_events(tmp_path):
    pytest.importorskip("torch.utils.tensorboard")
    from lam_slide_tpu.train.sinks import TensorBoardSink

    tb_dir = tmp_path / "tb"
    _fit(tmp_path, [TensorBoardSink(str(tb_dir))])
    events = list(tb_dir.glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0
