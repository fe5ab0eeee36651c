"""dopri5 NFE / steps-accepted on TRAINED checkpoints.

The bench's dopri5 NFE (187) was measured at model init; a converged drift
field can have very different stiffness (round-3 verdict weak #3). This
loads a trained stage-2 run from the registry (EMA weights, fp32 — the
eval protocol's precision), prepares a REAL conditioning batch from the
experiment's own loader, and integrates the probability-flow ODE with the
protocol solver (dopri5 atol 1e-6 / rtol 1e-3), reporting attempted steps,
accepted steps, and NFE. Works for any domain with a registered stage-2
run (md17 / peptide / ...).

    python tools/measure_trained_nfe.py --run conv-pep-s2 \
        --workspace runs/convergence [--experiment peptide_second_stage]
"""

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run", required=True)
    ap.add_argument("--workspace", default="runs")
    ap.add_argument("--experiment", default=None,
                    help="registry experiment name (default: from run config)")
    ap.add_argument("--atol", type=float, default=1e-6)
    ap.add_argument("--rtol", type=float, default=1e-3)
    ap.add_argument("--init-model", action="store_true",
                    help="also report the untrained-init NFE for comparison")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _enable_compile_cache
    from lam_slide_tpu.experiments.registry import (EXPERIMENTS,
                                                    load_checkpoint_raw)
    from lam_slide_tpu.train.checkpoint import resolve_run
    from lam_slide_tpu.transport.transport import Sampler

    _enable_compile_cache()
    info = resolve_run(args.workspace, args.run)
    meta = info.get("config", {})
    exp_name = args.experiment or (
        f"{meta.get('domain')}_second_stage" if meta.get("domain") else None)
    if exp_name not in EXPERIMENTS:
        raise SystemExit(f"unknown experiment {exp_name!r}; pass --experiment")
    launch = meta.get("launch", {})
    builder_kwargs = dict(launch.get("exp_overrides", {}))
    # the protocol pins fp32 sampling regardless of how the run trained
    builder_kwargs.pop("dit_dtype", None)
    for key in ("molecule", "scene"):
        if launch.get(key):
            builder_kwargs[key] = launch[key]
    exp = EXPERIMENTS[exp_name](
        workspace=args.workspace,
        smoke=bool(launch.get("smoke")),
        first_stage_run=meta.get("first_stage_run") or launch.get("first_stage_run"),
        dit_dtype="float32",  # protocol: fp32 sampling of the bf16-trained model
        **builder_kwargs)

    from lam_slide_tpu.utils.trees import tree_to_f32 as to_f32

    raw = load_checkpoint_raw(info["run_dir"], "best")
    params = raw.get("ema_params") or raw["params"]
    params = to_f32(params)
    fs_vars = to_f32((raw.get("constants") or {}).get("first_stage")
                     or exp.variables.get("constants", {}).get("first_stage"))

    ss = exp.test_model or exp.model
    batch = exp.sample_batch
    x1, model_kwargs = ss.prepare_batch(fs_vars, batch)
    sampler_fn = Sampler(ss.transport).sample_ode(
        sampling_method="dopri5", atol=args.atol, rtol=args.rtol,
        return_stats=True)

    def solve(p, noise):
        return sampler_fn(None, noise, ss.model_fn(p), **model_kwargs)

    noise = jax.random.normal(jax.random.PRNGKey(0), x1.shape, x1.dtype)
    out = {"run": args.run, "experiment": exp_name,
           "atol": args.atol, "rtol": args.rtol,
           "batch": int(x1.shape[0]), "step": int(raw["step"])}

    x, (n, n_acc) = jax.jit(solve)(params, noise)
    assert np.isfinite(np.asarray(jnp.sum(x)))
    out["trained"] = {"n_iters": int(n), "steps_accepted": int(n_acc),
                      "nfe": 1 + 6 * int(n)}
    if args.init_model:
        init_params = to_f32(exp.variables["params"])
        _, (n0, n0_acc) = jax.jit(solve)(init_params, noise)
        out["init"] = {"n_iters": int(n0), "steps_accepted": int(n0_acc),
                       "nfe": 1 + 6 * int(n0)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
