from lam_slide_tpu.experiments.registry import EXPERIMENTS, ExperimentRun, build_experiment

__all__ = ["EXPERIMENTS", "ExperimentRun", "build_experiment"]
