from lam_slide_tpu.data.collate import pad_collate, pad_collate_temporal
from lam_slide_tpu.data.loader import Loader
from lam_slide_tpu.data.nbody import NBodyDataset, Trajectory

__all__ = ["Loader", "NBodyDataset", "Trajectory", "pad_collate", "pad_collate_temporal"]
