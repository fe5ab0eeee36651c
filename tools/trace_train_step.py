"""Capture + summarize a device trace of ONE full training step.

The sampler's op breakdown (tools/capture_trace.py) drove the round-2/3
kernel work; the TRAIN step has only ever had end-to-end timings
(docs/PERF.md "Training step" table: 4AA s2 200 ms, MD17 s2 1873 ms).
This captures a jax.profiler trace of one warmed jitted train step
(fwd + bwd + AdamW + EMA, the exact program `make_train_step` builds) at
the production stage-2 shapes and prints the same per-op-category totals,
so train-side headroom is attributed instead of guessed.

    python tools/trace_train_step.py [--config 4aa|md17] [--out DIR]
"""

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tools.capture_trace import summarize  # noqa: E402
from tools.measure_train_loop import CONFIGS, build  # noqa: E402


def capture(config: str, out_dir: str) -> None:
    import time

    import jax
    import optax

    from bench import _enable_compile_cache
    from lam_slide_tpu.train.state import create_train_state
    from lam_slide_tpu.train.steps import make_train_step

    _enable_compile_cache()
    cfg = CONFIGS[config]
    params, loss_fn, batch = build(cfg)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    state = create_train_state({"params": params}, tx, ema=True)
    step = make_train_step(loss_fn, tx, donate_state=False)
    batch = jax.device_put(batch)  # pre-place: tunnel host→device bandwidth
    rng = jax.random.PRNGKey(0)

    state, metrics = step(state, batch, rng)          # compile + warm
    float(metrics["loss"])
    state, metrics = step(state, batch, rng)          # steady-state warm
    float(metrics["loss"])
    t0 = time.perf_counter()
    with jax.profiler.trace(out_dir):
        state, metrics = step(state, batch, rng)
        float(metrics["loss"])
    print(f"# traced {config} train step: "
          f"{(time.perf_counter() - t0) * 1e3:.1f} ms wall", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=sorted(CONFIGS), default="md17")
    ap.add_argument("--out", default=None)
    ap.add_argument("--summarize-only", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    out = args.out or f"/tmp/train_trace_{args.config}"
    if not args.summarize_only:
        capture(args.config, out)
    summarize(out, top=args.top, by_source=True)


if __name__ == "__main__":
    main()
