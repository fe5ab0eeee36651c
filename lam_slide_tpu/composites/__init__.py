from lam_slide_tpu.composites.first_stage import FirstStageBackbone

__all__ = ["FirstStageBackbone"]
