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
    parser.add_argument("--experiment", default=None,
                        help="experiment name (required unless --test-only "
                             "recovers it from the run registry)")
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
        "--model-axis", type=int, default=1,
        help="mesh model-axis size (tensor parallelism, parallel/tp.py): "
             "devices lay out as (data x model); the DiT's per-block "
             "matmuls shard column/row-parallel over 'model'",
    )
    parser.add_argument(
        "--fsdp", action="store_true",
        help="fully-sharded data parallelism (parallel/fsdp.py): params/EMA/"
             "optimizer moments shard over the data axis (ZeRO-3 layout) — "
             "per-chip state memory scales 1/N",
    )
    parser.add_argument(
        "--devices", type=int, default=None,
        help="force N virtual CPU devices (sharding debug; sets XLA flags before jax import)",
    )
    parser.add_argument(
        "--multihost", action="store_true",
        help="multi-host SPMD (v5e pods / DCN): jax.distributed.initialize() "
             "before device discovery; every Loader feeds this process's "
             "slice of each global batch",
    )
    parser.add_argument("--molecule", default=None,
                        help="md17: molecule or 'all' (default; --test-only "
                             "recovers the trained run's value)")
    parser.add_argument("--scene", default=None,
                        help="nba: score|rebound (default score; --test-only "
                             "recovers the trained run's value)")
    parser.add_argument(
        "--set", dest="overrides", action="append", default=[],
        metavar="KEY=VALUE",
        help="override TrainerConfig fields (e.g. --set lr=2e-4 --set max_epochs=100) "
             "— the Hydra-style command-line override surface",
    )
    parser.add_argument(
        "--exp-set", dest="exp_overrides", action="append", default=[],
        metavar="KEY=VALUE",
        help="extra keyword overrides passed to the experiment builder "
             "(e.g. --exp-set batch_size=16) — the sweep override surface",
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
    parser.add_argument(
        "--test-only", action="store_true",
        help="skip training: restore --run-id's checkpoint and run the domain "
             "test protocol (the scripts/nba/nba_qd.py standalone test runner)",
    )
    parser.add_argument(
        "--test-ckpt", choices=("last", "best"), default="last",
        help="which checkpoint --test-only restores (src/train.py test_ckpt)",
    )
    parser.add_argument(
        "--tensorboard", action="store_true",
        help="mirror the metric stream into TensorBoard event files under "
             "<run_dir>/tb (train/sinks.py; the configs/logger surface)",
    )
    parser.add_argument(
        "--wandb-project", default=None,
        help="mirror the metric stream to a wandb run (requires the wandb "
             "package; configs/logger/wandb.yaml equivalent)",
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

    if args.multihost:
        jax.distributed.initialize()
        from lam_slide_tpu.data.loader import Loader as _Loader

        _Loader.default_process_shard = (jax.process_index(), jax.process_count())
        print(f"multihost: process {jax.process_index()}/{jax.process_count()}")

    from lam_slide_tpu.experiments import build_experiment
    from lam_slide_tpu.parallel import make_mesh
    from lam_slide_tpu.train.checkpoint import register_run
    from lam_slide_tpu.train.trainer import Trainer

    run_id = args.run_id or secrets.token_hex(4)
    run_dir = os.path.join(args.workspace, run_id)
    print(f"run_id={run_id} devices={jax.device_count()}")

    exp_kwargs = {}
    for item in args.exp_overrides:
        key, _, raw = item.partition("=")
        try:
            val = int(raw)
        except ValueError:
            try:
                val = float(raw)
            except ValueError:
                val = {"true": True, "false": False}.get(raw.lower(), raw)
        exp_kwargs[key] = val

    if args.test_only:
        # Standalone test-from-checkpoint (scripts/nba/nba_qd.py semantics):
        # resolve the finished run, recover its full launch configuration —
        # experiment, dataset selection, overrides, stage lineage — from the
        # registry (the wandb-config recovery of src/train.py:100-105), so
        # the test protocol runs against the settings the checkpoint was
        # trained with. Explicit CLI flags still override.
        from lam_slide_tpu.train.checkpoint import resolve_run

        if not args.run_id:
            raise SystemExit("--test-only requires --run-id of a finished run")
        info = resolve_run(args.workspace, run_id)
        run_dir = info["run_dir"]
        stored = info.get("config", {})
        launch = stored.get("launch", {})
        for field in ("experiment", "molecule", "scene", "data_root",
                      "first_stage_run"):
            if getattr(args, field) is None and launch.get(field) is not None:
                setattr(args, field, launch[field])
        if launch.get("smoke") and not args.smoke:
            args.smoke = True
        exp_kwargs = {**launch.get("exp_overrides", {}), **exp_kwargs}
        if args.first_stage_run is None:
            args.first_stage_run = stored.get("first_stage_run")
        mismatches = {f: (launch[f], getattr(args, f))
                      for f in ("experiment", "molecule", "scene")
                      if launch.get(f) is not None
                      and getattr(args, f) != launch[f]}
        if mismatches:
            print(f"WARNING: --test-only overrides the trained run's "
                  f"settings: {mismatches}")

    if not args.experiment:
        raise SystemExit("--experiment is required (no stored value found)")
    molecule = args.molecule if args.molecule is not None else "all"
    scene = args.scene if args.scene is not None else "score"

    exp = build_experiment(
        args.experiment,
        smoke=args.smoke,
        data_root=args.data_root,
        workspace=args.workspace,
        seed=args.seed,
        first_stage_run=args.first_stage_run,
        molecule=molecule,
        scene=scene,
        **exp_kwargs,
    )
    if args.epochs is not None:
        exp.trainer_cfg.max_epochs = args.epochs
    if args.fsdp:
        exp.trainer_cfg.fsdp = True
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
        from lam_slide_tpu.parallel import MeshSpec

        mesh = make_mesh(MeshSpec(model=args.model_axis))
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
        if args.model_axis > 1:
            # GSPMD cannot partition the Pallas flash custom call; a
            # model-sharded step must run attention on the XLA path.
            from lam_slide_tpu.ops import attention as _attention

            _attention.FORCE_BACKEND = "xla"

    if args.test_only:
        from lam_slide_tpu.experiments.registry import load_checkpoint_raw

        raw = load_checkpoint_raw(run_dir, which=args.test_ckpt)
        params = raw["ema_params"] if raw.get("ema_params") is not None else raw["params"]
        fs_vars = (raw.get("constants") or {}).get("first_stage")
        _run_test_protocol(args, exp, params, fs_vars, mesh, run_dir, molecule)
        print(f"done: test-only step={int(raw['step'])} run_dir={run_dir}")
        return 0

    register_run(args.workspace, run_id, run_dir, {
        **exp.meta,
        "launch": {
            "experiment": args.experiment, "molecule": molecule,
            "scene": scene, "smoke": bool(args.smoke),
            "data_root": args.data_root, "seed": args.seed,
            "first_stage_run": args.first_stage_run,
            "exp_overrides": exp_kwargs,
        },
    })
    sinks = []
    if args.tensorboard:
        from lam_slide_tpu.train.sinks import TensorBoardSink

        sinks.append(TensorBoardSink(os.path.join(run_dir, "tb")))
    if args.wandb_project:
        from lam_slide_tpu.train.sinks import WandbSink

        sinks.append(WandbSink(project=args.wandb_project, name=run_id))
    trainer = Trainer(exp.trainer_cfg, exp.loss_fn, run_dir, mesh=mesh,
                      eval_fns=exp.eval_fns, sinks=sinks)
    state = trainer.fit(exp.variables, exp.train_loader, exp.val_loaders, resume=args.resume)

    if args.test:
        # Reference semantics: test on EMA weights, single program
        # (src/train.py:100-118). The fp32 rebuild + held-out split live in
        # _run_test_protocol. K/num_runs per domain protocol.
        params = state.ema_params if state.ema_params is not None else state.params
        fs_vars = (state.constants or {}).get("first_stage")
        _run_test_protocol(args, exp, params, fs_vars, mesh, run_dir, molecule)

    print(f"done: step={int(state.step)} run_dir={run_dir}")
    return 0


def _run_test_protocol(args, exp, params, fs_vars, mesh, run_dir, molecule):
    """Domain test protocol on restored/trained weights (stage 2 only):
    mean-K ADE/FDE for md17 (second_stage/md17.py:139-171), per-entity
    min-K [+FPC] for pedestrian/nba (second_stage/pedestrian.py:149-239).

    Reference precision/data semantics (src/train.py:100-118): the test pass
    re-instantiates the trainer with precision="32-true" and runs on the
    held-out test split — here the fp32-rebuilt ``exp.test_model`` over
    ``exp.test_loaders``, with every float param leaf cast to fp32."""
    import json
    import os

    import jax
    from jax import numpy as jnp

    if exp.meta.get("stage") != 2:
        print("test protocols are defined for stage-2 experiments only")
        return
    from lam_slide_tpu.composites.testing import evaluate_md17, evaluate_min_k

    model = exp.test_model if exp.test_model is not None else exp.model
    loaders = exp.test_loaders if exp.test_loaders is not None else exp.val_loaders
    from lam_slide_tpu.utils.trees import tree_to_f32

    params = tree_to_f32(params)
    fs_vars = tree_to_f32(fs_vars)

    cfg = exp.meta.get("config", {})
    k = int(cfg.get("K", 5))
    if args.smoke:
        k = min(k, 2)
    if exp.meta["domain"] == "md17":
        from lam_slide_tpu.experiments.registry import MD17_SCALES

        # k_chunk=1: sequential K repeats (the reference's own Python-loop
        # memory profile) — the vmapped K=5 fp32 protocol OOMs one v5e
        metrics = evaluate_md17(model, params, fs_vars, loaders,
                                scale=MD17_SCALES[molecule], k=k, k_chunk=1,
                                mesh=mesh if args.test_mesh else None)
    elif exp.meta["domain"] in ("pedestrian", "nba"):
        num_runs = min(int(cfg.get("num_runs", k)), k)
        metrics = evaluate_min_k(model, params, fs_vars, loaders,
                                 k=k, num_runs=num_runs, k_chunk=1,
                                 post_process=bool(cfg.get("post_process", False)),
                                 mesh=mesh if args.test_mesh else None)
    else:
        metrics = {}
        print("use lam_slide_tpu.analysis.eval_cli for the peptide eval pipeline")
    if metrics:
        with open(os.path.join(run_dir, "test_metrics.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        print(json.dumps(metrics))


if __name__ == "__main__":
    sys.exit(main())
