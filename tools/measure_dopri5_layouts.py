"""dopri5 layout A/B: where does the 18% dopri5-vs-Euler gap live?

BENCH_r03: Euler headline 589 traj-steps/s (UNROLLED depth-7 layout),
dopri5 arm 485.9 drift-evals/s (scan_layers layout). Two confounded
differences: the adaptive bounded-while machinery, and the model layout
(the scan-layers arm pays nn.scan's cross-layer fusion barrier). The
stage-scan rewrite of ode_dopri5 (transport/integrators.py) traces the
drift ONCE per while body, which makes the unrolled dopri5 compile
feasible for the first time (the old 6x-inlined form compiled 23+ min
and wedged the tunnel — run this LAST in any queue).

Arms (all at the bench's protocol batch):
  euler_scan      Euler-10, scan_layers   -> isolates the layout cost
  dopri5_scan     dopri5, scan_layers     -> the shipping arm (control)
  dopri5_unrolled dopri5, unrolled        -> the candidate

    python tools/measure_dopri5_layouts.py [--batch 8] [--skip-unrolled]
"""

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def measure_euler_scan(batch):
    import functools

    import jax
    import jax.numpy as jnp

    from bench import NUM_STEPS, build_solver

    setup = build_solver(batch, method="euler", scan_layers=True)
    solve, noise = setup["solve"], setup["noise"]

    @functools.partial(jax.jit, static_argnames="n_solves")
    def run(noise, n_solves):
        def body(c, _):
            out = solve(c)
            return c + 1e-6 * out, jnp.sum(out)
        _, sums = jax.lax.scan(body, noise, None, length=n_solves)
        return jnp.sum(sums)

    for n in (1, 4):
        float(run(noise, n))

    def best_time(n, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(noise, n))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (best_time(4) - best_time(1)) / 3
    return batch * NUM_STEPS / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--skip-unrolled", action="store_true")
    args = ap.parse_args()

    from bench import _enable_compile_cache, measure_dopri5

    _enable_compile_cache()
    out = {"batch": args.batch}

    t0 = time.time()
    out["euler_scan_traj_steps_per_sec"] = round(measure_euler_scan(args.batch), 1)
    print(json.dumps({"arm": "euler_scan", **out}), flush=True)

    d5 = measure_dopri5(args.batch, scan_layers=True)
    out["dopri5_scan"] = d5
    print(json.dumps({"arm": "dopri5_scan", **d5}), flush=True)

    if not args.skip_unrolled:
        t0 = time.time()
        d5u = measure_dopri5(args.batch, scan_layers=False)
        d5u["compile_plus_run_s"] = round(time.time() - t0, 1)
        out["dopri5_unrolled"] = d5u
        print(json.dumps({"arm": "dopri5_unrolled", **d5u}), flush=True)

    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
