"""Training CLI — the src/train.py equivalent.

    python -m lam_slide_tpu.train.cli --experiment md17_first_stage --smoke
    python -m lam_slide_tpu.train.cli --experiment md17_second_stage \
        --first-stage-run <run_id> --workspace runs --data-root data/md17

Runs under runs/<run_id>/ with metrics.jsonl + checkpoints/{best,last};
every run is recorded in the workspace run registry so stage-2 experiments
resolve their frozen stage 1 by --first-stage-run (replacing the
reference's wandb lineage). ``--devices N`` debugs multi-chip sharding on N
virtual CPU devices; on real hardware the mesh spans all visible chips.
"""

import argparse
import os
import secrets
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--experiment", required=True)
    parser.add_argument("--smoke", action="store_true", help="tiny synthetic run (debug cfg)")
    parser.add_argument("--workspace", default="runs")
    parser.add_argument("--data-root", default=None)
    parser.add_argument("--run-id", default=None)
    parser.add_argument("--first-stage-run", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--epochs", type=int, default=None, help="override max_epochs")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--no-mesh", action="store_true", help="single-device (no sharding)")
    parser.add_argument(
        "--devices", type=int, default=None,
        help="force N virtual CPU devices (sharding debug; sets XLA flags before jax import)",
    )
    parser.add_argument("--molecule", default="all", help="md17: molecule or 'all'")
    parser.add_argument("--scene", default="score", help="nba: score|rebound")
    parser.add_argument(
        "--set", dest="overrides", action="append", default=[],
        metavar="KEY=VALUE",
        help="override TrainerConfig fields (e.g. --set lr=2e-4 --set max_epochs=100) "
             "— the Hydra-style command-line override surface",
    )
    parser.add_argument(
        "--test-mesh", action="store_true",
        help="shard the --test protocols over the data mesh (default follows "
             "the reference's single-program test pass)")
    parser.add_argument(
        "--test", action="store_true",
        help="after training, run the domain test protocol on the eval loaders "
             "(mean-K ADE/FDE for md17; per-entity min-K [+FPC] for pedestrian/nba)",
    )
    args = parser.parse_args(argv)

    if args.devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.devices:
        jax.config.update("jax_platforms", "cpu")

    from lam_slide_tpu.experiments import build_experiment
    from lam_slide_tpu.parallel import make_mesh
    from lam_slide_tpu.train.checkpoint import register_run
    from lam_slide_tpu.train.trainer import Trainer

    run_id = args.run_id or secrets.token_hex(4)
    run_dir = os.path.join(args.workspace, run_id)
    print(f"experiment={args.experiment} run_id={run_id} devices={jax.device_count()}")

    exp = build_experiment(
        args.experiment,
        smoke=args.smoke,
        data_root=args.data_root,
        workspace=args.workspace,
        seed=args.seed,
        first_stage_run=args.first_stage_run,
        molecule=args.molecule,
        scene=args.scene,
    )
    if args.epochs is not None:
        exp.trainer_cfg.max_epochs = args.epochs
    for item in args.overrides:
        key, _, raw = item.partition("=")
        if not hasattr(exp.trainer_cfg, key):
            raise SystemExit(f"--set: unknown TrainerConfig field {key!r}")
        cur = getattr(exp.trainer_cfg, key)
        if isinstance(cur, bool):
            val = raw.lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            val = int(float(raw))
        elif isinstance(cur, float) or cur is None:
            val = float(raw)
        else:
            val = raw
        setattr(exp.trainer_cfg, key, val)

    mesh = None
    if not args.no_mesh and jax.device_count() > 1:
        mesh = make_mesh()
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    register_run(args.workspace, run_id, run_dir, exp.meta)
    trainer = Trainer(exp.trainer_cfg, exp.loss_fn, run_dir, mesh=mesh,
                      eval_fns=exp.eval_fns)
    state = trainer.fit(exp.variables, exp.train_loader, exp.val_loaders, resume=args.resume)

    if args.test and exp.meta.get("stage") == 2:
        # Reference semantics: test on EMA weights, single program, fp32
        # sampling (src/train.py:100-118). K/num_runs per domain protocol.
        import json

        from lam_slide_tpu.composites.testing import evaluate_md17, evaluate_min_k

        params = state.ema_params if state.ema_params is not None else state.params
        fs_vars = state.constants["first_stage"]
        cfg = exp.meta.get("config", {})
        k = int(cfg.get("K", 5))
        if args.smoke:
            k = min(k, 2)
        if exp.meta["domain"] == "md17":
            from lam_slide_tpu.experiments.registry import MD17_SCALES

            metrics = evaluate_md17(exp.model, params, fs_vars, exp.val_loaders,
                                    scale=MD17_SCALES[args.molecule], k=k,
                                    mesh=mesh if args.test_mesh else None)
        elif exp.meta["domain"] in ("pedestrian", "nba"):
            num_runs = min(int(cfg.get("num_runs", k)), k)
            metrics = evaluate_min_k(exp.model, params, fs_vars, exp.val_loaders,
                                     k=k, num_runs=num_runs,
                                     post_process=bool(cfg.get("post_process", False)),
                                     mesh=mesh if args.test_mesh else None)
        else:
            metrics = {}
            print("use lam_slide_tpu.analysis.eval_cli for the peptide eval pipeline")
        if metrics:
            with open(os.path.join(run_dir, "test_metrics.json"), "w") as f:
                json.dump(metrics, f, indent=2)
            print(json.dumps(metrics))

    print(f"done: step={int(state.step)} run_dir={run_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
