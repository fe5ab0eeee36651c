"""In-training evaluation hooks for Trainer.eval_fns.

``make_peptide_sampling_hook`` is the SIAtom14SampleCallback equivalent
(src/callbacks/si_sample_callback.py:168-248): every ``interval`` validation
epochs it rolls out a few trajectories from the current EMA weights,
computes quick torsion/TICA JSD metrics against the reference MD and
optionally saves Ramachandran/FES figures into the run directory. Returned
metric dicts flow into the trainer's JSONL stream.
"""

import os
from typing import Dict, Optional

import jax
import numpy as np


def make_peptide_sampling_hook(
    second_stage,
    trajectories,
    run_dir: str,
    interval: int = 1,
    num_rollouts: int = 2,
    max_peptides: int = 2,
    num_steps: int = 10,
    figures: bool = False,
    seed: int = 137,
):
    """-> hook(state, epoch) for Trainer(eval_fns={...}).

    trajectories: PeptideDataset.trajectories entries (precomputed dicts).
    """
    from lam_slide_tpu.analysis.eval_peptide import EvalConfig, evaluate_peptides
    from lam_slide_tpu.analysis.rollout import RolloutSampler

    counter = {"n": 0}
    cache: Dict[str, RolloutSampler] = {}

    def hook(state, epoch) -> Optional[Dict[str, float]]:
        counter["n"] += 1
        if (counter["n"] - 1) % interval != 0:
            return None
        params = state.ema_params if state.ema_params is not None else state.params
        fs_vars = state.constants["first_stage"]
        # Build the sampler (and its jitted sample fn) ONCE: params/fs_vars
        # are traced arguments of the jitted program, so later epochs swap
        # them without recompiling; reconstructing per epoch would pay the
        # full XLA sampler compile every validation pass.
        if "sampler" not in cache:
            cache["sampler"] = RolloutSampler(
                second_stage, params, fs_vars,
                sampling_kwargs={"sampling_method": "euler",
                                 "num_steps": num_steps},
            )
        sampler = cache["sampler"]
        sampler.params, sampler.fs_variables = params, fs_vars
        rng = jax.random.PRNGKey(seed + epoch)
        samples = {}
        for traj in trajectories[:max_peptides]:
            rng, key = jax.random.split(rng)
            try:
                gen = sampler.sample_rollout(
                    key, traj["atom14_pos"][0], traj["aatype"][0],
                    traj["atom14_mask"][0], num_rollouts=num_rollouts,
                )
                samples[traj["name"]] = {
                    "traj": gen, "ref": traj["atom14_pos"], "aatype": traj["aatype"][0],
                }
            except Exception as e:  # per-trajectory robustness (si_sample_callback.py:223-233)
                print(f"sampling hook failed for {traj['name']}: {e!r}")
        if not samples:
            return None
        t_ref = min(len(t["ref"]) for t in samples.values())
        cfg = EvalConfig(tica_lag=min(1000, t_ref // 2), run_msm=False,
                         run_decorrelation=False)
        per, summary = evaluate_peptides(samples, cfg)
        if figures:
            from lam_slide_tpu.analysis.plots import eval_summary_figure

            os.makedirs(os.path.join(run_dir, "figures"), exist_ok=True)
            eval_summary_figure(
                per, path=os.path.join(run_dir, "figures", f"epoch{epoch}.png"))
        return summary

    return hook


def make_pointcloud_vis_hook(
    predict_fn,
    batch: Dict[str, np.ndarray],
    run_dir: str,
    atom_types: Optional[np.ndarray] = None,
    ax_range=(-1, 1),
    interval: int = 1,
):
    """PointCloudVisualizationCallback equivalent (src/modules/callbacks.py):
    every ``interval`` validation epochs, render the first validation
    sample's predicted vs target point cloud (open diamonds = ground truth)
    into ``run_dir/figures`` — the figure-logging stand-in for the
    reference's wandb ``val/vis/sample``.

    predict_fn(state, batch) -> positions [B, N, 3] (e.g. a jitted stage-1
    reconstruction); batch carries "pos" targets + "attention_mask".
    """
    import matplotlib.pyplot as plt

    from lam_slide_tpu.analysis.plots import scatter_3d_comparison
    from lam_slide_tpu.data.constants import NUM_TO_ATOM_TYPE

    outdir = os.path.join(run_dir, "figures")
    counter = {"n": 0}

    def hook(state, epoch) -> Optional[Dict[str, float]]:
        counter["n"] += 1
        if (counter["n"] - 1) % interval != 0:
            return None
        preds = np.asarray(predict_fn(state, batch))
        mask = np.asarray(batch["attention_mask"][0]).astype(bool)
        types = None
        if atom_types is not None:
            types = [NUM_TO_ATOM_TYPE.get(int(z), "#") for z in atom_types[mask]]
        fig = scatter_3d_comparison(
            preds[0][mask], types, np.asarray(batch["pos"][0])[mask], types,
            ax_range=ax_range, title=f"epoch {epoch}",
        )
        os.makedirs(outdir, exist_ok=True)
        path = os.path.join(outdir, f"pointcloud_epoch{epoch:05d}.png")
        fig.savefig(path, dpi=110)
        plt.close(fig)
        rmse = float(np.sqrt(np.mean(
            (preds[0][mask] - np.asarray(batch["pos"][0])[mask]) ** 2)))
        return {"vis_rmse": rmse}

    return hook
