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

Round-4 verdict hardening ("make the metric dynamics-proof"):

- Two cheap non-learned baselines that separate *statics* from
  *dynamics*: ``persistence`` (hold the conditioning frame for the whole
  horizon — optimal for a frozen system, beaten only by tracking actual
  motion) and ``ensmean`` (predict the trajectory's time-mean structure —
  what a model that decodes a roughly-correct average produces). A
  dynamics-aware model must beat persistence at short horizons and decay
  toward the ensemble distance at long ones.
- Conditioning defaults to the HELD-OUT frame range when the run was
  trained with ``frame_holdout`` (advisor r4: conditioning on ref[0]
  certified discrimination on training frames, not generalization);
  ``--condition start`` restores the old in-sample behavior and the
  output records which was used.
- Horizons are clamped to the available generated/reference frames and
  the effective horizon is recorded (advisor r4: h > num_timesteps raised
  a shape mismatch).

    python tools/eval_forecast_gap.py --run conv-pep2-s2 \
        --workspace runs/convergence [--horizons 10,25,50,100,250,1000]
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
    p.add_argument("--horizons", default="10,25,50,100,250,1000")
    p.add_argument("--num-steps", type=int, default=10,
                   help="Euler steps (training-time sampler; fast and "
                        "deterministic-budget for an A/B)")
    p.add_argument("--condition", choices=["auto", "heldout", "start"],
                   default="auto",
                   help="conditioning frame: 'heldout' starts at the "
                        "run's frame_holdout tail (out-of-sample frames "
                        "of the training sequences), 'start' at frame 0 "
                        "(in-sample; the pre-r5 behavior). 'auto' picks "
                        "heldout when the run trained with frame_holdout")
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
    overrides = meta.get("launch", {}).get("exp_overrides", {})
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

    horizons = [int(h) for h in args.horizons.split(",")]
    # reference trajectories long enough for the held-out start + horizon
    frame_holdout = float(overrides.get("frame_holdout", 0.0))
    condition = args.condition
    if condition == "auto":
        condition = "heldout" if frame_holdout > 0 else "start"
    n_frames = max(4 * cfg2.num_timesteps, 200)
    if condition == "heldout" and frame_holdout > 0:
        # held-out tail start in the TRAINING dataset's frame numbering;
        # generate enough frames that tail_start + max horizon exists
        tail_start = int((1.0 - frame_holdout) * n_frames)
        n_frames = max(n_frames, tail_start + max(horizons) + 2)
    ds = PeptideDataset(
        first_stage=False, n_timesteps=cfg2.num_timesteps,
        num_entities=fs_cfg.num_entities,
        scale=fs_cfg.scale, shift=fs_cfg.shift,
        synthetic_frames=n_frames,
        synthetic_version=int(overrides.get("synthetic_version", 1)))

    kw = {"sampling_method": "euler", "num_steps": args.num_steps}
    out = {"run": args.run, "horizons": horizons, "condition": condition,
           "frame_holdout": frame_holdout, "per_peptide": {}}
    samplers = {"trained": RolloutSampler(ss, params, fs_vars, sampling_kwargs=kw),
                "control": RolloutSampler(ss, ctrl_params, fs_vars,
                                          sampling_kwargs=kw)}
    for traj in ds.trajectories:
        ref = traj["atom14_pos"]  # [T_ref, R, 14, 3]
        res = jnp.asarray(traj["aatype"][0])
        mask = jnp.asarray(traj["atom14_mask"][0])
        m = np.asarray(mask, bool)
        k0 = 0
        if condition == "heldout" and frame_holdout > 0:
            k0 = int((1.0 - frame_holdout) * len(ref))
        cond = ref[k0]
        future = ref[k0 + 1:]  # ref continuation aligned with gen[1:]

        def rmsd_profile(pred, h_eff):
            """pred aligned with future[:h_eff-1]; pred may be a single
            frame (baselines) or a [T,...] rollout."""
            d = pred - future[: h_eff - 1]
            return float(np.sqrt((d[:, m] ** 2).sum(-1).mean()))

        rec = out["per_peptide"].setdefault(traj["name"], {})
        ens_mean = ref.mean(axis=0)
        gens = {}
        for arm, sampler in samplers.items():
            gens[arm] = np.asarray(sampler.sample_rollout(
                jax.random.PRNGKey(7), jnp.asarray(cond), res, mask,
                num_rollouts=1))  # [T, R, 14, 3], gens[arm][0] ~ cond
        for h in horizons:
            # clamp to available generated AND reference frames
            h_eff = min(h, min(len(g) for g in gens.values()),
                        len(future) + 1)
            if h_eff < 2:
                continue
            rec[f"h_eff@{h}"] = h_eff
            for arm, g in gens.items():
                rec[f"{arm}@{h}"] = round(rmsd_profile(g[1:h_eff], h_eff), 4)
            rec[f"persistence@{h}"] = round(
                rmsd_profile(np.broadcast_to(cond, (h_eff - 1,) + cond.shape),
                             h_eff), 4)
            rec[f"ensmean@{h}"] = round(
                rmsd_profile(np.broadcast_to(ens_mean,
                                             (h_eff - 1,) + ens_mean.shape),
                             h_eff), 4)
    # summary: mean over peptides + gaps (>1 => trained better)
    summary = {}
    arms = ("trained", "control", "persistence", "ensmean")
    for h in horizons:
        vals = {}
        for arm in arms:
            per = [v[f"{arm}@{h}"] for v in out["per_peptide"].values()
                   if f"{arm}@{h}" in v]
            if per:
                vals[arm] = float(np.mean(per))
                summary[f"{arm}@{h}"] = round(vals[arm], 4)
        if "trained" in vals:
            for base in ("control", "persistence", "ensmean"):
                if base in vals:
                    summary[f"gap_{base}@{h}"] = round(
                        vals[base] / vals["trained"], 3)
    out["summary"] = summary
    print(json.dumps(summary), flush=True)
    path = args.out or os.path.join(info["run_dir"], "eval_forecast.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
