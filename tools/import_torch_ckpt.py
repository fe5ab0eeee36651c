"""Import a reference (torch Lightning) checkpoint into a framework run dir.

    python tools/import_torch_ckpt.py path/to/ref.ckpt --workspace runs \
        [--run-id imported-pep-s2] [--stage first|second] \
        [--config num_timesteps=1000 --config depth=7] [--which best]

Maps the torch ``state_dict`` (+ EMA, lightning_base.py:109-119) through
``lam_slide_tpu.train.torch_import`` into flax variables, writes an Orbax
checkpoint laid out like a framework training run ({step, params,
ema_params, opt_state, constants}) under ``<workspace>/<run-id>/checkpoints/
{best,last}``, and registers the run so ``--run-id`` works everywhere a
trained run id does (eval_cli, stage-2 lineage, --test-only).

Second-stage reference checkpoints embed their frozen stage-1 model
(``first_stage_model.*``, src/models/composites/second_stage/md17.py:46-51);
it is extracted into ``constants["first_stage"]`` exactly where the
framework's own stage-2 checkpoints keep it. Model hyperparameters are NOT
stored in torch weights — pass the reference config values as ``--config
k=v`` pairs (they land in the registry config, where eval_cli reads them).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_value(s: str):
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        return s


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt", help=".ckpt (torch pickle) or .npz flat state_dict")
    p.add_argument("--workspace", default="runs")
    p.add_argument("--run-id", default=None, help="default: imported-<basename>")
    p.add_argument("--stage", choices=["first", "second"], default=None,
                   help="auto-detected from the keys when omitted")
    p.add_argument("--first-stage-run", default=None,
                   help="registry id of the stage-1 run (stored in the config "
                        "so eval_cli can rebuild the stage-1 model shape)")
    p.add_argument("--config", action="append", default=[], metavar="K=V",
                   help="model config entries for the registry (repeatable)")
    p.add_argument("--scan-layers", action="store_true",
                   help="stack DiT blocks into the nn.scan layout")
    p.add_argument("--share-weights", action="store_true",
                   help="reference share_weights DiT (single shared block)")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side conversion only
    import numpy as np
    import orbax.checkpoint as ocp

    from lam_slide_tpu.train.checkpoint import register_run
    from lam_slide_tpu.train.torch_import import import_checkpoint

    out = import_checkpoint(args.ckpt, stage=args.stage,
                            scan_layers=args.scan_layers,
                            share_weights=args.share_weights)
    stage, domain = out["stage"], out["domain"]
    run_id = args.run_id or ("imported-" + os.path.splitext(
        os.path.basename(args.ckpt))[0])
    run_dir = os.path.abspath(os.path.join(args.workspace, run_id))
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)

    if stage == "second":
        params = out["variables"]["params"]
        ema = (out["ema_variables"] or {}).get("params")
        constants = ({"first_stage": out["first_stage"]}
                     if out["first_stage"] is not None else None)
    else:
        params = out["variables"]["params"]
        ema = (out["ema_variables"] or {}).get("params")
        constants = out["variables"].get("constants")

    state = {
        "step": np.zeros((), np.int32),
        "params": params,
        "ema_params": ema if ema is not None else params,
        "opt_state": {},  # imported checkpoints are for evaluation, not resume
        "constants": constants,
    }
    ckptr = ocp.StandardCheckpointer()
    for which in ("best", "last"):
        ckptr.save(os.path.join(ckpt_dir, which), state, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
        json.dump({"imported_from": os.path.abspath(args.ckpt),
                   "stage": stage, "domain": domain,
                   "ema": ema is not None}, f, indent=2)

    config = {k: _parse_value(v) for k, v in
              (kv.split("=", 1) for kv in args.config)}
    register_run(args.workspace, run_id, run_dir, config={
        "stage": stage, "domain": domain, "config": config,
        **({"first_stage_run": args.first_stage_run}
           if args.first_stage_run else {}),
    })
    print(json.dumps({"run_id": run_id, "run_dir": run_dir, "stage": stage,
                      "domain": domain, "ema": ema is not None}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
