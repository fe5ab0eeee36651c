from lam_slide_tpu.utils.logging import host0_print, log_once
from lam_slide_tpu.utils.profiling import StepTimer, trace
from lam_slide_tpu.utils.rng import per_sample_keys
from lam_slide_tpu.utils.trees import tree_to_f32

__all__ = ["StepTimer", "host0_print", "log_once", "per_sample_keys",
           "trace", "tree_to_f32"]
