"""Sweep launcher: parallel subprocess fan-out (the joblib-launcher shape,
reference configs/hydra/joblib.yaml) + concurrent run-registry writes."""

import json
import os

import numpy as np

from lam_slide_tpu.experiments import sweeps


def test_parallel_sweep_fanout(tmp_path, monkeypatch):
    ws = str(tmp_path / "ws")
    monkeypatch.setitem(
        sweeps.SWEEPS, "_test_par",
        [("md17_first_stage", {"molecule": "ethanol"}),
         ("md17_first_stage", {"molecule": "benzene"})])
    run_ids = sweeps.run_sweep("_test_par", workspace=ws, smoke=True,
                               jobs=2, devices=1)
    assert len(run_ids) == 2
    registry = json.load(open(os.path.join(ws, "runs.json")))
    for rid in run_ids:
        assert rid in registry  # concurrent registration survived the race
        run_dir = registry[rid]["run_dir"]
        recs = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
        train = [r for r in recs if r.get("split") == "train"]
        assert train and np.isfinite(train[-1]["train/loss"])
        assert os.path.isdir(os.path.join(run_dir, "checkpoints", "last"))


def test_parallel_sweep_surfaces_failures(tmp_path, monkeypatch):
    ws = str(tmp_path / "ws")
    monkeypatch.setitem(
        sweeps.SWEEPS, "_test_fail",
        [("no_such_experiment", {})])
    try:
        sweeps.run_sweep("_test_fail", workspace=ws, smoke=True, jobs=2,
                         devices=1)
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "1/1 jobs failed" in str(e)


def test_slurm_launcher_generates_scripts(tmp_path):
    """submit_slurm: one sbatch script per sweep entry, reference-launcher
    directives (nodes/tasks-per-node/partition/account — configs/hydra/
    karolina.yaml shape), --multihost only for multi-node jobs."""
    ws = str(tmp_path / "ws")
    scripts = sweeps.submit_slurm(
        "nba", workspace=ws, partition="gpu", account="proj1",
        time_limit="08:00:00", nodes=2, submit=False)
    assert len(scripts) == len(sweeps.SWEEPS["nba"])
    body = open(scripts[0]).read()
    assert "#SBATCH --nodes=2" in body
    assert "#SBATCH --ntasks-per-node=1" in body
    assert "#SBATCH --partition=gpu" in body
    assert "#SBATCH --account=proj1" in body
    assert "#SBATCH --time=08:00:00" in body
    assert "--multihost" in body and "srun" in body
    assert "lam_slide_tpu.train.cli" in body

    single = sweeps.submit_slurm("peptide", workspace=ws, nodes=1, submit=False)
    assert "--multihost" not in open(single[0]).read()
