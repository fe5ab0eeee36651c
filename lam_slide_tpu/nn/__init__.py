from lam_slide_tpu.nn import blocks, embeddings, ema, initializers, losses, norms, schedules

__all__ = ["blocks", "embeddings", "ema", "initializers", "losses", "norms", "schedules"]
