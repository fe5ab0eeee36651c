"""On-chip train-step timing for ANY registry experiment at full width.

The round-2 train-step table covered the two stage-2 heavyweights via
hand-built DiT shapes (tools/measure_train_loop.py); this tool times the
REAL experiments — registry-built model + loss + one real loader batch —
so stage-1 training (where the reference spends most of its epoch budget:
MD17 S1 3000 ep, peptide S1 50k ep, NBA S1 10k ep) has measured numbers
too, and dispatch-path changes (e.g. the short-attention kernel) show up
as end-to-end step deltas.

Sub-10 ms steps cannot be timed dispatch-per-step over the tunneled TPU
(~27 ms dispatch+readback wall, docs/PERF.md): the step body is chained
in-graph with lax.scan via the ``step.inner`` handle exposed by
make_train_step, synced once by a scalar readback, and differenced
between two chain lengths.

    python tools/measure_stage_steps.py --experiments \
        md17_first_stage,peptide_first_stage [--chain 8]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache  # noqa: E402


def measure_experiment(name: str, chain: int, first_stage_run=None) -> dict:
    import jax
    import jax.numpy as jnp

    from lam_slide_tpu.experiments import registry
    from lam_slide_tpu.train.state import create_train_state
    from lam_slide_tpu.train.steps import make_train_step
    from lam_slide_tpu.train.trainer import make_optimizer

    kwargs = {}
    if first_stage_run:
        kwargs["first_stage_run"] = first_stage_run
    exp = registry.build_experiment(name, smoke=False, **kwargs)
    batch = jax.device_put(
        jax.tree.map(jnp.asarray, next(iter(exp.train_loader))))
    tx, _ = make_optimizer(exp.trainer_cfg, steps_per_epoch=100)
    state = create_train_state(exp.variables, tx,
                               ema=exp.trainer_cfg.ema_decay is not None)
    step = make_train_step(exp.loss_fn, tx,
                           ema_decay=exp.trainer_cfg.ema_decay)
    inner = step.inner
    rng = jax.random.PRNGKey(0)

    @functools.partial(jax.jit, static_argnames="n_iters")
    def run_chain(params, ema, opt, ct, constants, batch, rng, n_iters):
        def body(carry, _):
            params, ema, opt, ct = carry
            params, ema, opt, ct, metrics = inner(
                params, ema, opt, ct, constants, batch, rng)
            return (params, ema, opt, ct), metrics["loss"]

        (_, _, _, _), losses = jax.lax.scan(
            body, (params, ema, opt, ct), None, length=n_iters)
        return jnp.sum(losses)

    args = (state.params, state.ema_params, state.opt_state, state.step,
            state.constants, batch, rng)
    t0 = time.perf_counter()
    for n in (2, chain):
        float(run_chain(*args, n_iters=n))
    compile_s = time.perf_counter() - t0

    def t(n, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run_chain(*args, n_iters=n))
            best = min(best, time.perf_counter() - t0)
        return best

    ms = (t(chain) - t(2)) / (chain - 2) * 1e3
    leaves = jax.tree.leaves(batch)
    return {"experiment": name, "step_ms": round(ms, 2),
            "compile_s": round(compile_s, 1),
            "batch_leading": int(leaves[0].shape[0])}


def main() -> None:
    _enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiments",
                    default="md17_first_stage,peptide_first_stage,"
                            "pedestrian_first_stage,nba_first_stage")
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--first-stage-run", default=None,
                    help="run id for *_second_stage experiments")
    args = ap.parse_args()
    for name in args.experiments.split(","):
        try:
            print(json.dumps(measure_experiment(name.strip(), args.chain,
                                                args.first_stage_run)),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"experiment": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
