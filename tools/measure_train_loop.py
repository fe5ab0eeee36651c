"""On-chip train-LOOP throughput: Trainer._fit_loop vs raw jitted steps.

Round-2 verdict weak #2: the old loop called float(v) per metric per step —
a device→host sync that serialized the input pipeline against the device.
This tool measures what the de-synced loop (device-side metric
accumulation, one block per log interval) actually sustains on the chip at
the two production stage-2 shapes, next to the raw back-to-back jitted-step
rate on the same program:

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/measure_train_loop.py \
        [--config 4aa|md17|both]

Prints one JSON line per config:
    {"config", "raw_step_ms", "loop_step_ms", "overhead_pct"}
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    # registry shapes: peptide s2 (B=16, T=1000, L=2, depth 7) and
    # md17 s2 (B=64, T=30, L=192, depth 6 — the HBM-critical one, remat on)
    "4aa": dict(b=16, t=1000, l=2, in_dim=96, depth=7, hidden=384, heads=16,
                remat=False),
    "md17": dict(b=64, t=30, l=192, in_dim=32, depth=6, hidden=256, heads=8,
                 remat=True),
}


def build(cfg):
    import jax
    import jax.numpy as jnp

    from lam_slide_tpu.models import LatentDiT
    from lam_slide_tpu.transport import create_transport

    model = LatentDiT(depth=cfg["depth"], in_dim=cfg["in_dim"],
                      hidden_size=cfg["hidden"], num_heads=cfg["heads"],
                      mlp_ratio=2, n_timesteps=cfg["t"],
                      checkpointing=cfg["remat"], scan_layers=True,
                      dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    b, t, l, din = cfg["b"], cfg["t"], cfg["l"], cfg["in_dim"]
    x1 = jax.random.normal(key, (b, t, l, din))
    x_cond = jnp.zeros_like(x1)
    mask = jnp.zeros((b, t, l), jnp.int32).at[:, :1].set(1)
    variables = jax.jit(lambda: model.init(key, x1, jnp.zeros((b,)),
                                           x_cond, mask))()
    transport = create_transport(path_type="GVP", prediction="data")

    def loss_fn(params, constants, batch, rng, train):
        out = transport.training_losses(
            rng, lambda xt, tt, **kw: model.apply({"params": params}, xt, tt, **kw),
            batch["x1"], model_kwargs={"x_cond": batch["x_cond"],
                                       "x_cond_mask": batch["mask"]})
        loss = out["loss"].mean()
        return loss, {"si_loss": loss}

    import numpy as np
    batch = {"x1": np.asarray(x1), "x_cond": np.asarray(x_cond),
             "mask": np.asarray(mask)}
    return variables["params"], loss_fn, batch


def measure(name, cfg, steps=30):
    import jax
    import numpy as np
    import optax

    from lam_slide_tpu.train.steps import make_train_step
    from lam_slide_tpu.train.state import create_train_state
    from lam_slide_tpu.train.trainer import Trainer, TrainerConfig

    params, loss_fn, batch = build(cfg)
    # Pre-place the batch in HBM for BOTH arms: over the tunneled TPU the
    # host->device batch transfer (~25 MB/step) is tunnel-bandwidth-bound
    # and would swamp both measurements with something no real TPU host
    # pays. What this tool isolates is the LOOP overhead around the step.
    batch = jax.device_put(batch)

    # raw back-to-back jitted steps (the PERF.md protocol: warm, then time a
    # synced run of `steps`)
    tx = optax.adamw(1e-4)
    state = create_train_state({"params": params}, tx, ema=True)
    step = make_train_step(loss_fn, tx, ema_decay=0.999)
    rng = jax.random.PRNGKey(0)
    state, m = step(state, batch, rng)
    jax.block_until_ready(m["loss"])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, batch, rng)
    jax.block_until_ready(m["loss"])
    raw_ms = (time.perf_counter() - t0) / steps * 1e3

    # the Trainer loop on the identical program (fresh state; same compile)
    class Loader:
        def __len__(self):
            return steps

        def __iter__(self):
            for _ in range(steps):
                yield batch

    with tempfile.TemporaryDirectory() as d:
        trainer = Trainer(TrainerConfig(max_epochs=2, lr=1e-4,
                                        val_every_n_epochs=100,
                                        log_every_steps=50),
                          loss_fn, d, quiet=True)
        t0 = time.perf_counter()
        trainer.fit({"params": params}, Loader())
        total = time.perf_counter() - t0
        recs = [json.loads(l) for l in open(os.path.join(d, "metrics.jsonl"))]
    # epoch 0 carries the compile; epoch 1 is the steady-state loop
    loop_ms = [r["step_ms"] for r in recs if r.get("split") == "train"][-1]
    return {"config": name, "raw_step_ms": round(raw_ms, 1),
            "loop_step_ms": round(loop_ms, 1),
            "overhead_pct": round((loop_ms / raw_ms - 1) * 100, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="both", choices=["4aa", "md17", "both"])
    p.add_argument("--steps", type=int, default=30)
    args = p.parse_args()
    names = list(CONFIGS) if args.config == "both" else [args.config]
    for name in names:
        print(json.dumps(measure(name, CONFIGS[name], args.steps)), flush=True)


if __name__ == "__main__":
    main()
