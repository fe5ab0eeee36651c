from lam_slide_tpu.geometry.rigid import Rigid
from lam_slide_tpu.geometry import constants, ops

__all__ = ["Rigid", "constants", "ops"]
