"""Pedestrian ETH/UCY domain composite.

Parity target: src/models/composites/{first_stage,second_stage}/pedestrian.py.
Stage-1 inputs are just a 2-layer MLP over the 2D positions
(first_stage/pedestrian.py:33-42); stage 2 follows the shared pattern with
min-over-K ADE/FDE evaluation (K=20) and optional KMeans final-position
clustering (FPC) — implemented here as a jitted kmeans (ops/kmeans.py)
instead of torch_kmeans.
"""

from dataclasses import dataclass
from typing import Callable, Dict

from flax import linen as nn
from jax import numpy as jnp

from lam_slide_tpu.composites.first_stage import FirstStageBackbone
from lam_slide_tpu.models import Decoder, Encoder
from lam_slide_tpu.nn.blocks import gelu_exact, torch_linear_init
from lam_slide_tpu.nn.losses import inter_distance, masked_mse, masked_norm


class PedestrianInputEmbedder(nn.Module):
    """pos [B, N, 2] -> merge MLP (first_stage/pedestrian.py:33-42)."""

    dim_input: int = 128
    act: Callable = gelu_exact
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        x = nn.Dense(
            self.dim_input, kernel_init=torch_linear_init, dtype=self.dtype, name="merge_fc"
        )(batch["pos"].astype(self.dtype))
        x = self.act(x)
        return nn.Dense(
            self.dim_input, kernel_init=torch_linear_init, dtype=self.dtype, name="merge_out"
        )(x)


@dataclass(frozen=True)
class PedestrianFirstStageConfig:
    """Mirrors configs/model/pedestrian/first-stage.yaml."""

    num_entities: int = 10
    dim_input: int = 128
    dim_latent: int = 32
    dim_entity: int = 128
    num_latents: int = 2
    dim_head_cross: int = 16
    dim_head_latent: int = 16
    num_head_cross: int = 4
    num_head_latent: int = 2
    enc_num_block_cross: int = 1
    enc_num_block_attn: int = 1
    dec_num_block_cross: int = 0
    dec_num_block_attn: int = 1
    dropout_query: float = 0.1
    qk_norm: bool = True
    loss_pos_weight: float = 1.0
    loss_inter_distance_weight: float = 1.0
    loss_norm_weight: float = 0.0
    shift: float = 0.0
    scale: float = 1.0


def build_pedestrian_first_stage(cfg: PedestrianFirstStageConfig, dtype=jnp.float32):
    common = dict(qk_norm=cfg.qk_norm, act=gelu_exact, dtype=dtype)
    return FirstStageBackbone(
        dim_latent=cfg.dim_latent,
        n_entities=cfg.num_entities,
        dim_entity=cfg.dim_entity,
        input_embedder=PedestrianInputEmbedder(dim_input=cfg.dim_input, dtype=dtype),
        encoder=Encoder(
            dim_latent=cfg.dim_latent,
            num_latents=cfg.num_latents,
            dim_head_cross=cfg.dim_head_cross,
            dim_head_latent=cfg.dim_head_latent,
            num_head_cross=cfg.num_head_cross,
            num_head_latent=cfg.num_head_latent,
            num_block_cross=cfg.enc_num_block_cross,
            num_block_attn=cfg.enc_num_block_attn,
            **common,
        ),
        decoder=Decoder(
            outputs={"pos": 2},
            dim_query=cfg.dim_entity,
            dim_head_cross=cfg.dim_head_cross,
            dim_head_latent=cfg.dim_head_latent,
            num_head_cross=cfg.num_head_cross,
            num_head_latent=cfg.num_head_latent,
            num_block_cross=cfg.dec_num_block_cross,
            num_block_attn=cfg.dec_num_block_attn,
            dropout_query=cfg.dropout_query,
            **common,
        ),
        dtype=dtype,
    )


def make_pedestrian_first_stage_loss(model: FirstStageBackbone, cfg: PedestrianFirstStageConfig):
    """Reference Loss.forward (first_stage/pedestrian.py:118-164)."""

    def loss_fn(params, constants, batch, rng, train):
        variables = {"params": params}
        if constants is not None:
            variables["constants"] = constants
        preds = model.apply(variables, batch, deterministic=not train, rngs={"dropout": rng})
        mask = batch["attention_mask"]
        pos_pred = preds["pos"].astype(jnp.float32)
        loss_pos = masked_mse(pos_pred, batch["pos"], mask)
        loss_inter = inter_distance(pos_pred, batch["pos"], mask)
        loss_norm = masked_norm(pos_pred, batch["pos"], mask)
        total = (
            cfg.loss_pos_weight * loss_pos
            + cfg.loss_inter_distance_weight * loss_inter
            + cfg.loss_norm_weight * loss_norm
        )
        return total, {
            "pos_loss": loss_pos,
            "inter_distance_loss": loss_inter,
            "norm_loss": loss_norm,
            "dist": loss_norm * cfg.scale,
        }

    return loss_fn


@dataclass(frozen=True)
class PedestrianSecondStageConfig:
    """Mirrors configs/model/pedestrian/second-stage.yaml."""
    scan_layers: bool = False

    depth: int = 6
    in_dim: int = 32
    hidden_size: int = 128
    num_heads: int = 4
    mlp_ratio: float = 2.0
    cond_idx: tuple = (0, 8)
    mask_cond_mean: bool = True
    num_timesteps: int = 20  # past 8 + future 12
    K: int = 20
    num_runs: int = 20
    post_process: bool = False
    path_type: str = "GVP"
    prediction: str = "data"
    sampling_method: str = "ODE"
    sampling_kwargs: tuple = (("sampling_method", "euler"), ("num_steps", 10))
    weight_si_loss: float = 1.0
    weight_pos_loss: float = 0.25
    weight_inter_dist_loss: float = 0.25
    calc_additional_losses: bool = True
    class_conditional: bool = False
    n_classes: int = 5
    vec_in_dim: int = 128
    reference_init: bool = True
    share_weights: bool = False


def build_pedestrian_second_stage(
    cfg: PedestrianSecondStageConfig,
    first_stage: FirstStageBackbone,
    first_stage_variables,
    dtype=jnp.float32,
):
    from lam_slide_tpu.composites.second_stage import ClassCondDiT, SecondStage
    from lam_slide_tpu.models import LatentDiT
    from lam_slide_tpu.transport import create_transport

    dit = LatentDiT(
        depth=cfg.depth,
        in_dim=cfg.in_dim,
        hidden_size=cfg.hidden_size,
        num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio,
        n_timesteps=cfg.num_timesteps,
        vec_in_dim=cfg.vec_in_dim if cfg.class_conditional else None,
        reference_init=cfg.reference_init,
        share_weights=cfg.share_weights,
        scan_layers=cfg.scan_layers,
        dtype=dtype,
    )
    backbone = (
        ClassCondDiT(dit=dit, n_classes=cfg.n_classes, vec_in_dim=cfg.vec_in_dim)
        if cfg.class_conditional
        else dit
    )
    return SecondStage(
        backbone=backbone,
        transport=create_transport(path_type=cfg.path_type, prediction=cfg.prediction),
        first_stage=first_stage,
        first_stage_variables=first_stage_variables,
        cond_idx=cfg.cond_idx,
        mask_cond_mean=cfg.mask_cond_mean,
        num_timesteps=cfg.num_timesteps,
        class_conditional=cfg.class_conditional,
        cond_key="cond_scene",
        frame_keys=("pos", "attention_mask", "entities"),
    )
