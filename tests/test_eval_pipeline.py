"""End-to-end 4AA eval: rollout sampling + full analysis pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lam_slide_tpu.analysis.eval_peptide import EvalConfig, analyze_trajectory, evaluate_peptides
from lam_slide_tpu.analysis.rollout import RolloutSampler
from lam_slide_tpu.composites.peptide import (
    PeptideFirstStageConfig,
    PeptideSecondStageConfig,
    build_peptide_first_stage,
    build_peptide_second_stage,
)
from lam_slide_tpu.data.peptide import PeptideDataset


@pytest.fixture(scope="module")
def peptide_world():
    fs_cfg = PeptideFirstStageConfig(
        num_entities=8, dim_input=32, dim_latent=16, dim_entity=32, num_latents=2,
        num_split=4, dim_head_cross=8, dim_head_latent=8, dropout_query=0.0,
    )
    fs = build_peptide_first_stage(fs_cfg)
    T = 10
    ds = PeptideDataset(first_stage=False, synthetic_peptides=1, synthetic_frames=80,
                        n_timesteps=T, num_entities=8)
    traj = ds.trajectories[0]
    rng = np.random.default_rng(0)
    s = ds.sample(0, rng)
    batch = {k: jnp.asarray(np.stack([v])) for k, v in s.items()}
    batch["attention_mask"] = jnp.ones(batch["aatype"].shape, bool)
    frame0 = {k: v[:, 0] for k, v in batch.items()}
    fs_vars = fs.init(jax.random.PRNGKey(0), frame0)
    cfg2 = PeptideSecondStageConfig(depth=1, in_dim=16, hidden_size=16, num_heads=2,
                                    cond_idx=(0, 1), num_timesteps=T)
    ss = build_peptide_second_stage(cfg2, fs, fs_vars)
    x1, mk = ss.prepare_batch(fs_vars, batch)
    params = ss.backbone.init(jax.random.PRNGKey(1), x1, jnp.zeros((1,)),
                              mk["x_cond"], mk["x_cond_mask"])["params"]
    return ss, params, fs_vars, traj


@pytest.mark.slow
def test_eval_cli_trained_and_control_smoke(tmp_path):
    """eval_cli main() end-to-end on a CPU smoke lineage, BOTH arms — the
    trained eval and the --control random-init arm (the control branch has
    its own model-rebuild code path; a NameError there once survived every
    unit test because only the tool's main() exercises it)."""
    import json

    from lam_slide_tpu.analysis.eval_cli import main as eval_main
    from lam_slide_tpu.train.cli import main as train_main

    ws = str(tmp_path / "ws")
    train_main(["--experiment", "peptide_first_stage", "--smoke",
                "--workspace", ws, "--run-id", "s1", "--no-mesh"])
    train_main(["--experiment", "peptide_second_stage", "--smoke",
                "--workspace", ws, "--run-id", "s2", "--no-mesh",
                "--first-stage-run", "s1"])
    for extra in ([], ["--control"]):
        eval_main(["--run", "s2", "--workspace", ws, "--num-rollouts", "1",
                   "--sampling-method", "euler", "--num-steps", "2",
                   "--no-msm", "--no-decorr", *extra])
    for sub in ("eval", "eval_control"):
        m = json.load(open(tmp_path / "ws" / "s2" / sub / "metrics.json"))
        assert "summary" in m and np.isfinite(m["summary"]["ALL"])


def test_eval_unroll_layout_parity(peptide_world):
    """eval_cli --unroll semantics: a scan_layers-trained checkpoint
    evaluated through the unrolled model (dataclasses.replace cfg +
    unstack_layer_params) samples the identical trajectory."""
    from dataclasses import replace

    from lam_slide_tpu.models.latent_dit import stack_layer_params, unstack_layer_params

    _, _, fs_vars, traj = peptide_world
    fs_cfg = PeptideFirstStageConfig(
        num_entities=8, dim_input=32, dim_latent=16, dim_entity=32, num_latents=2,
        num_split=4, dim_head_cross=8, dim_head_latent=8, dropout_query=0.0,
    )
    fs = build_peptide_first_stage(fs_cfg)
    T = 10
    cfg_scan = PeptideSecondStageConfig(depth=2, in_dim=16, hidden_size=16,
                                        num_heads=2, cond_idx=(0, 1),
                                        num_timesteps=T, scan_layers=True)
    ss_scan = build_peptide_second_stage(cfg_scan, fs, fs_vars)
    ds = PeptideDataset(first_stage=False, synthetic_peptides=1, synthetic_frames=80,
                        n_timesteps=T, num_entities=8)
    s = ds.sample(0, np.random.default_rng(0))
    batch = {k: jnp.asarray(np.stack([v])) for k, v in s.items()}
    batch["attention_mask"] = jnp.ones(batch["aatype"].shape, bool)
    x1, mk = ss_scan.prepare_batch(fs_vars, batch)
    params_scan = ss_scan.backbone.init(jax.random.PRNGKey(1), x1, jnp.zeros((1,)),
                                        mk["x_cond"], mk["x_cond_mask"])["params"]

    cfg_unroll = replace(cfg_scan, scan_layers=False)
    ss_unroll = build_peptide_second_stage(cfg_unroll, fs, fs_vars)
    params_unroll = unstack_layer_params(params_scan, cfg_scan.depth)

    kw = {"sampling_method": "euler", "num_steps": 2}
    out_scan = jax.jit(ss_scan.make_sample_fn(sampling_kwargs=kw))(
        params_scan, fs_vars, batch, jax.random.PRNGKey(3))
    out_unroll = jax.jit(ss_unroll.make_sample_fn(sampling_kwargs=kw))(
        params_unroll, fs_vars, batch, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(out_scan["atom14_pos"]),
                               np.asarray(out_unroll["atom14_pos"]),
                               atol=2e-5)
    # and the inverse direction round-trips
    back = stack_layer_params(params_unroll, cfg_scan.depth)
    assert jax.tree.all(jax.tree.map(np.array_equal, back, params_scan))


def test_rollout_sampler(peptide_world):
    ss, params, fs_vars, traj = peptide_world
    sampler = RolloutSampler(
        ss, params, fs_vars,
        sampling_kwargs={"sampling_method": "euler", "num_steps": 2},
    )
    res = jnp.asarray(traj["aatype"][0])
    res_mask = jnp.asarray(traj["atom14_mask"][0])
    cond = jnp.asarray(traj["atom14_pos"][0])
    out = sampler.sample_rollout(jax.random.PRNGKey(0), cond, res, res_mask,
                                 num_rollouts=3)
    assert out.shape == (3 * ss.num_timesteps, res.shape[0], 14, 3)
    assert np.isfinite(out).all()
    # frame 0 is the exact conditioning frame (sampling.py:62)
    np.testing.assert_allclose(out[0], np.asarray(cond) * np.asarray(res_mask)[..., None],
                               atol=1e-5)
    # masked atoms stay zero everywhere
    assert np.all(out[:, ~np.asarray(res_mask)] == 0)


def test_batched_rollout_matches_serial_at_b1(peptide_world):
    """sample_rollout_batched with B=1 reproduces the serial path exactly
    (same rng chain), and stacks independently for B>1."""
    ss, params, fs_vars, traj = peptide_world
    sampler = RolloutSampler(
        ss, params, fs_vars,
        sampling_kwargs={"sampling_method": "euler", "num_steps": 2},
    )
    res = jnp.asarray(traj["aatype"][0])
    res_mask = jnp.asarray(traj["atom14_mask"][0])
    cond = jnp.asarray(traj["atom14_pos"][0])
    serial = sampler.sample_rollout(jax.random.PRNGKey(3), cond, res, res_mask,
                                    num_rollouts=2)
    batched = sampler.sample_rollout_batched(
        jax.random.PRNGKey(3), cond[None], res[None], res_mask[None],
        num_rollouts=2)
    assert batched.shape == (1, *serial.shape)
    np.testing.assert_allclose(batched[0], serial, atol=1e-5)

    two = sampler.sample_rollout_batched(
        jax.random.PRNGKey(3), jnp.stack([cond, cond]), jnp.stack([res, res]),
        jnp.stack([res_mask, res_mask]), num_rollouts=1)
    assert two.shape[0] == 2 and np.isfinite(two).all()
    assert np.all(two[:, :, ~np.asarray(res_mask)] == 0)


def test_analysis_pipeline_on_synthetic(peptide_world):
    _, _, _, traj = peptide_world
    atom14 = traj["atom14_pos"]
    aatype = traj["aatype"][0]
    ref = atom14[: len(atom14) // 2]
    gen = atom14[len(atom14) // 2:]
    cfg = EvalConfig(tica_lag=5, msm_lag=5, n_clusters=8, n_metastable=3,
                     decorr_nlag=10)
    out = analyze_trajectory(gen, ref, aatype, cfg)
    assert "JSD" in out and "TICA-0" in out["JSD"]
    for v in out["JSD"].values():
        assert np.isfinite(v) and 0 <= v <= 1
    per, summary = evaluate_peptides(
        {"TEST": {"traj": gen, "ref": ref, "aatype": aatype}}, cfg)
    assert "BB" in summary and "ALL" in summary and "TICA-0" in summary
    assert np.isfinite(summary["BB"])
    # same trajectory against itself → JSD 0
    out_same = analyze_trajectory(ref, ref, aatype,
                                  EvalConfig(tica_lag=5, run_msm=False,
                                             run_decorrelation=False))
    for k, v in out_same["JSD"].items():
        assert v == pytest.approx(0.0, abs=1e-9), k
