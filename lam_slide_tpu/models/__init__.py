from lam_slide_tpu.models.decoder import (
    Decoder,
    Decoder2,
    DecoderFE,
    DecoderQuerySplitter,
)
from lam_slide_tpu.models.encoder import Encoder, Encoder2
from lam_slide_tpu.models.latent_dit import LatentDiT

__all__ = [
    "Decoder",
    "Decoder2",
    "DecoderFE",
    "DecoderQuerySplitter",
    "Encoder",
    "Encoder2",
    "LatentDiT",
]
