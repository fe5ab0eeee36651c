from lam_slide_tpu.data.collate import pad_collate, pad_collate_temporal
from lam_slide_tpu.data.loader import Loader

__all__ = ["Loader", "pad_collate", "pad_collate_temporal"]
