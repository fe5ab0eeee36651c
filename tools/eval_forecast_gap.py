"""Trained-vs-control FORECAST gap — dynamics-aware learning evidence.

The equilibrium-distribution metrics (torsion/TICA/MSM JSD,
eval_peptide.py) measure histogram overlap with the reference ensemble.
Measured inversion (docs/CONVERGENCE.md): at compressed synthetic
budgets a random-init DiT WINS those metrics on both generators — broad
noise through the frozen decoder overlaps a broad reference better than
correctly-learned narrow dynamics. Those metrics certify a *converged*
model's samples; they do not certify learning at partial convergence.

This tool measures what the flow actually learned: conditioned on a
reference frame, roll out the model and score atom-position RMSD against
the reference's own continuation over short horizons. An OU/metastable
synthetic system is predictable over short horizons, so a model that
learned the dynamics must beat a random-init control here — the
direction of this gap cannot be gamed by breadth.

    python tools/eval_forecast_gap.py --run conv-pep2-s2 \
        --workspace runs/convergence [--horizons 25,100,1000]
"""

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True)
    p.add_argument("--workspace", default="runs")
    p.add_argument("--horizons", default="25,100,1000")
    p.add_argument("--num-steps", type=int, default=10,
                   help="Euler steps (training-time sampler; fast and "
                        "deterministic-budget for an A/B)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lam_slide_tpu.analysis.rollout import RolloutSampler
    from lam_slide_tpu.composites.peptide import (
        PeptideFirstStageConfig,
        PeptideSecondStageConfig,
        build_peptide_first_stage,
        build_peptide_second_stage,
    )
    from lam_slide_tpu.data.peptide import PeptideDataset
    from lam_slide_tpu.experiments.registry import load_checkpoint_raw
    from lam_slide_tpu.train.checkpoint import resolve_run
    from lam_slide_tpu.utils.trees import tree_to_f32

    info = resolve_run(args.workspace, args.run)
    meta = info.get("config", {})
    cfg2 = PeptideSecondStageConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in meta.get("config", {}).items()
        if k in PeptideSecondStageConfig.__dataclass_fields__})
    raw = load_checkpoint_raw(info["run_dir"], "best")
    params = tree_to_f32(raw.get("ema_params") or raw["params"])
    fs_vars = tree_to_f32(raw["constants"]["first_stage"])

    fs_cfg_src = {}
    if meta.get("first_stage_run"):
        fs_cfg_src = resolve_run(args.workspace, meta["first_stage_run"]).get(
            "config", {}).get("config", {})
    fs_cfg = PeptideFirstStageConfig(**{
        k: v for k, v in fs_cfg_src.items()
        if k in PeptideFirstStageConfig.__dataclass_fields__})
    fs_model = build_peptide_first_stage(fs_cfg)
    ss = build_peptide_second_stage(cfg2, fs_model, fs_vars)

    # control arm: fresh random init, same shapes (eval_cli --control)
    b0, t0, l0 = 1, cfg2.num_timesteps, 2
    x0 = jnp.zeros((b0, t0, l0, cfg2.in_dim))
    m0 = jnp.zeros((b0, t0, l0), jnp.int32)
    ctrl_params = ss.backbone.init(jax.random.PRNGKey(20260821), x0,
                                   jnp.zeros((b0,)), x0, m0)["params"]

    ds = PeptideDataset(
        first_stage=False, n_timesteps=cfg2.num_timesteps,
        num_entities=fs_cfg.num_entities,
        synthetic_frames=max(4 * cfg2.num_timesteps, 200),
        synthetic_version=int(meta.get("launch", {}).get(
            "exp_overrides", {}).get("synthetic_version", 1)))

    horizons = [int(h) for h in args.horizons.split(",")]
    kw = {"sampling_method": "euler", "num_steps": args.num_steps}
    out = {"run": args.run, "horizons": horizons, "per_peptide": {}}
    for arm, prm in (("trained", params), ("control", ctrl_params)):
        sampler = RolloutSampler(ss, prm, fs_vars, sampling_kwargs=kw)
        for traj in ds.trajectories:
            ref = traj["atom14_pos"]  # [T_ref, R, 14, 3]
            res = jnp.asarray(traj["aatype"][0])
            mask = jnp.asarray(traj["atom14_mask"][0])
            gen = sampler.sample_rollout(
                jax.random.PRNGKey(7), jnp.asarray(ref[0]), res, mask,
                num_rollouts=1)  # [T, R, 14, 3]
            m = np.asarray(mask, bool)
            rec = out["per_peptide"].setdefault(traj["name"], {})
            for h in horizons:
                d = gen[1:h] - ref[1:h]
                rmsd = float(np.sqrt((d[:, m] ** 2).sum(-1).mean()))
                rec[f"{arm}@{h}"] = round(rmsd, 4)
    # summary: mean over peptides + the gap
    summary = {}
    for h in horizons:
        tr = np.mean([v[f"trained@{h}"] for v in out["per_peptide"].values()])
        cc = np.mean([v[f"control@{h}"] for v in out["per_peptide"].values()])
        summary[f"trained@{h}"] = round(float(tr), 4)
        summary[f"control@{h}"] = round(float(cc), 4)
        summary[f"gap@{h}"] = round(float(cc / tr), 3)  # >1 => trained better
    out["summary"] = summary
    line = json.dumps(out["summary"])
    print(line, flush=True)
    path = args.out or os.path.join(info["run_dir"], "eval_forecast.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
