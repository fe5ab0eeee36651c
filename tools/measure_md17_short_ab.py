"""On-chip A/B: MD17 stage-2 train step with/without the short-attention
kernel on the temporal axis (LAM_SLIDE_SHORT_ATTN=1 routes the 8<n<128
unmasked packed self-attention through ops/short_attention.py).

Steps are 1.8 s-scale, so sequential jitted dispatch+sync is an honest
measurement (the ~27 ms tunnel dispatch wall is noise at this scale).

    python tools/measure_md17_short_ab.py [--steps 6]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _subproc import run_worker  # noqa: E402

WORKER = r"""
import sys, time
sys.path.insert(0, {repo!r})
import jax, optax
from tools.measure_train_loop import CONFIGS, build
from lam_slide_tpu.train.state import create_train_state
from lam_slide_tpu.train.steps import make_train_step

params, loss_fn, batch = build(dict(CONFIGS["md17"]))
batch = jax.device_put(batch)
tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
state = create_train_state({{"params": params}}, tx, ema=True)
step = make_train_step(loss_fn, tx)
rng = jax.random.PRNGKey(0)
state, m = step(state, batch, rng)
jax.block_until_ready(m["loss"])
t0 = time.perf_counter()
for _ in range({steps}):
    state, m = step(state, batch, rng)
jax.block_until_ready(m["loss"])
ms = (time.perf_counter() - t0) / {steps} * 1e3
print("RESULT", round(ms, 1), float(m["loss"]))
"""

ARMS = {
    "xla_temporal": {},
    "short_temporal": {"LAM_SLIDE_SHORT_ATTN": "1"},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--timeout", type=int, default=1500)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = WORKER.format(repo=repo, steps=args.steps)
    results = []
    for name, pins in ARMS.items():
        r = run_worker(name, code, pins, args.timeout,
                       lambda t: {"step_ms": float(t[0]), "loss": float(t[1])})
        results.append(r)
        print(json.dumps(r), flush=True)
    ok = {r["mode"]: r for r in results if r.get("status") == "ok"}
    if len(ok) == 2:
        print(json.dumps({
            "speedup": round(ok["xla_temporal"]["step_ms"]
                             / ok["short_temporal"]["step_ms"], 3)}),
            flush=True)


if __name__ == "__main__":
    main()
