"""4AA peptide evaluation CLI — the src/eval_peptide.py entry point.

    python -m lam_slide_tpu.analysis.eval_cli --run <stage2_run_id> \
        --workspace runs [--data-root data/4AA_sims_partial] \
        [--num-rollouts 10] [--pdb-ids AAAA BBBB] [--figures]

Loads the trained stage-2 run from the local registry (EMA weights; the
frozen stage-1 rides inside its checkpoint constants), samples
``num_rollouts`` chained windows per test peptide with the dopri5/Euler ODE
sampler, writes multi-model PDB trajectories, runs the torsion/TICA/MSM
JSD analysis against the reference MD, and prints the BB/SC/ALL/TICA/MSMS
summary as one JSON line.
"""

import argparse
import json
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run", required=True, help="stage-2 run id in the registry")
    p.add_argument("--workspace", default="runs")
    p.add_argument("--data-root", default=None, help="4AA data dir (test split)")
    p.add_argument("--num-rollouts", type=int, default=10)
    p.add_argument("--pdb-ids", nargs="*", default=None)
    p.add_argument("--sampling-method", default="dopri5",
                   choices=["euler", "heun", "dopri5"],
                   help="default dopri5 atol 1e-6 / rtol 1e-3 — the reference "
                        "eval protocol (configs/eval_peptide.yaml:23); "
                        "euler/10 is the training-time val sampler")
    p.add_argument("--num-steps", type=int, default=10)
    p.add_argument("--atol", type=float, default=1e-6)
    p.add_argument("--rtol", type=float, default=1e-3)
    p.add_argument("--truncate", type=int, default=None)
    p.add_argument("--no-msm", action="store_true")
    p.add_argument("--no-decorr", action="store_true")
    p.add_argument("--figures", action="store_true")
    p.add_argument("--outdir", default=None)
    p.add_argument("--batch-peptides", action="store_true",
                   help="sample every test peptide in ONE batched device "
                        "program per rollout instead of the reference's "
                        "serial per-peptide loop (eval_peptide.py:352-367) "
                        "— same protocol (rollouts/windows/solver); the "
                        "per-window noise draw is shared across the batch, "
                        "so per-peptide samples differ from a serial run's")
    p.add_argument("--unroll", action="store_true",
                   help="evaluate a scan_layers-trained checkpoint with the "
                        "UNROLLED DiT layout (stacked per-layer params are "
                        "unstacked; identical math — pinned by "
                        "test_eval_unroll_layout_parity). The unrolled "
                        "layout lets XLA fuse across layer boundaries that "
                        "nn.scan pins; A/B: tools/measure_dopri5_layouts.py")
    p.add_argument("--control", action="store_true",
                   help="random-model control: discard the trained DiT weights "
                        "and sample from a fresh random init (same architecture, "
                        "same frozen stage 1). The JSD gap between the normal "
                        "run and this arm is the evidence that training — not "
                        "the pipeline — produces the fidelity numbers.")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lam_slide_tpu.analysis.eval_peptide import EvalConfig, evaluate_peptides
    from lam_slide_tpu.analysis.rollout import RolloutSampler
    from lam_slide_tpu.composites.peptide import (
        PeptideFirstStageConfig,
        PeptideSecondStageConfig,
        build_peptide_first_stage,
        build_peptide_second_stage,
    )
    from lam_slide_tpu.data.peptide import PeptideDataset
    from lam_slide_tpu.experiments.registry import load_checkpoint_raw
    from lam_slide_tpu.geometry.protein import atom14_to_pdb
    from lam_slide_tpu.train.checkpoint import resolve_run

    info = resolve_run(args.workspace, args.run)
    meta = info.get("config", {})
    cfg2 = PeptideSecondStageConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in meta.get("config", {}).items()
        if k in PeptideSecondStageConfig.__dataclass_fields__
    })
    raw = load_checkpoint_raw(info["run_dir"], "best")
    params = raw.get("ema_params") or raw["params"]
    fs_vars = raw["constants"]["first_stage"]
    # fp32 sampling of the bf16-trained model (configs/eval_peptide.yaml:19-25):
    # the model below is built at its default fp32 compute dtype; cast any
    # bf16-stored leaves up so the whole pipeline runs 32-true.
    from lam_slide_tpu.utils.trees import tree_to_f32

    params, fs_vars = tree_to_f32(params), tree_to_f32(fs_vars)

    fs_cfg_src = {}
    if meta.get("first_stage_run"):
        fs_cfg_src = resolve_run(args.workspace, meta["first_stage_run"]).get(
            "config", {}).get("config", {})
    fs_cfg = PeptideFirstStageConfig(**{
        k: v for k, v in fs_cfg_src.items()
        if k in PeptideFirstStageConfig.__dataclass_fields__
    })
    fs_model = build_peptide_first_stage(fs_cfg)
    if args.unroll and cfg2.scan_layers:
        from dataclasses import replace

        from lam_slide_tpu.models.latent_dit import unstack_layer_params

        cfg2 = replace(cfg2, scan_layers=False)
        params = unstack_layer_params(params, cfg2.depth)
    ss = build_peptide_second_stage(cfg2, fs_model, fs_vars)

    if args.control:
        # Re-initialize the DiT with a fresh seed; keep shapes by initializing
        # against abstract zeros of the trained params' latent shape.
        b0, t0, l0 = 1, cfg2.num_timesteps, 2
        x0 = jnp.zeros((b0, t0, l0, cfg2.in_dim))
        m0 = jnp.zeros((b0, t0, l0), jnp.int32)
        params = ss.backbone.init(jax.random.PRNGKey(20260820), x0,
                                  jnp.zeros((b0,)), x0, m0)["params"]
        print("CONTROL ARM: sampling from a RANDOM-INIT model", flush=True)

    sampler = RolloutSampler(
        ss, params, fs_vars,
        sampling_kwargs=(
            {"sampling_method": "dopri5", "atol": args.atol, "rtol": args.rtol}
            if args.sampling_method == "dopri5"
            else {"sampling_method": args.sampling_method,
                  "num_steps": args.num_steps}
        ),
    )

    ds = PeptideDataset(
        data_dir=None if args.data_root is None else args.data_root,
        first_stage=False, n_timesteps=cfg2.num_timesteps,
        num_entities=fs_cfg.num_entities,
        # reference trajectories in the run's normalized coordinate units
        # (torsion/TICA/MSM JSD are invariant to the uniform scale; the
        # conditioning frames fed to the sampler must match training units)
        scale=fs_cfg.scale, shift=fs_cfg.shift,
        synthetic_frames=max(4 * cfg2.num_timesteps, 200),
        # reference trajectories must come from the generator the run was
        # trained on (v1 random-walk vs v2 metastable dynamics)
        synthetic_version=int(meta.get("launch", {}).get(
            "exp_overrides", {}).get("synthetic_version", 1)),
    )
    outdir = args.outdir or os.path.join(
        info["run_dir"], "eval_control" if args.control else "eval")
    os.makedirs(outdir, exist_ok=True)

    available = [t["name"] for t in ds.trajectories]
    if args.pdb_ids:
        missing = sorted(set(args.pdb_ids) - set(available))
        if missing:
            raise SystemExit(
                f"--pdb-ids not found: {missing}; available: {available}")

    rng = jax.random.PRNGKey(137)
    samples = {}
    selected = [t for t in ds.trajectories
                if not args.pdb_ids or t["name"] in args.pdb_ids]
    if args.batch_peptides:
        t0 = time.time()
        gen_all = sampler.sample_rollout_batched(
            rng,
            jnp.stack([jnp.asarray(t["atom14_pos"][0]) for t in selected]),
            jnp.stack([jnp.asarray(t["aatype"][0]) for t in selected]),
            jnp.stack([jnp.asarray(t["atom14_mask"][0]) for t in selected]),
            num_rollouts=args.num_rollouts)
        wall = time.time() - t0
        print(f"sampled {len(selected)} peptides batched: "
              f"{gen_all.shape[1]} frames each in {wall:.1f}s "
              f"({wall / len(selected):.1f}s/peptide)")
        for traj, gen in zip(selected, gen_all):
            res = traj["aatype"][0]
            atom14_to_pdb(gen[:: max(len(gen) // 50, 1)], res,
                          os.path.join(outdir, f"{traj['name']}.pdb"))
            samples[traj["name"]] = {"traj": gen, "ref": traj["atom14_pos"],
                                     "aatype": res}
    else:
        for traj in selected:
            name = traj["name"]
            t0 = time.time()
            rng, key = jax.random.split(rng)
            res = traj["aatype"][0]
            res_mask = traj["atom14_mask"][0]
            gen = sampler.sample_rollout(
                key, traj["atom14_pos"][0], res, res_mask,
                num_rollouts=args.num_rollouts)
            print(f"sampled {name}: {gen.shape[0]} frames in {time.time()-t0:.1f}s")
            atom14_to_pdb(gen[:: max(len(gen) // 50, 1)], res,
                          os.path.join(outdir, f"{name}.pdb"))
            samples[name] = {"traj": gen, "ref": traj["atom14_pos"], "aatype": res}

    cfg = EvalConfig(truncate=args.truncate, run_msm=not args.no_msm,
                     run_decorrelation=not args.no_decorr)
    per, summary = evaluate_peptides(samples, cfg)
    if args.figures:
        from lam_slide_tpu.analysis.plots import eval_summary_figure

        eval_summary_figure(per, path=os.path.join(outdir, "summary.png"))
    with open(os.path.join(outdir, "metrics.json"), "w") as f:
        json.dump({"summary": summary,
                   "per_peptide": {k: v["JSD"] for k, v in per.items()}}, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
