"""NBA SportVU domain composite.

Parity target: src/models/composites/{first_stage,second_stage}/nba.py.
Stage-1 inputs: pos(2) ⊕ team-embedding ⊕ group-embedding → merge MLP
(first_stage/nba.py:54-59); decoder heads pos/team/group with CE aux losses
and classification metrics; stage 2 = pedestrian pattern with K=60 samples,
min over the first num_runs=20, scene-class conditioning wrapper.
"""

from dataclasses import dataclass
from typing import Callable, Dict

import jax
from flax import linen as nn
from jax import numpy as jnp

from lam_slide_tpu.composites.first_stage import FirstStageBackbone
from lam_slide_tpu.models import Decoder, Encoder
from lam_slide_tpu.nn.blocks import gelu_exact, torch_linear_init
from lam_slide_tpu.nn.losses import (
    cross_entropy,
    inter_distance,
    masked_mse,
    masked_norm,
)


class NBAInputEmbedder(nn.Module):
    """pos ⊕ team-embed ⊕ group-embed → merge MLP (first_stage/nba.py:54-59)."""

    dim_input: int = 128
    dim_embed_team: int = 32
    dim_embed_group: int = 32
    n_teams: int = 3  # ball / team A / team B
    n_groups: int = 2
    act: Callable = gelu_exact
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        team = nn.Embed(
            self.n_teams, self.dim_embed_team,
            embedding_init=nn.initializers.normal(stddev=1.0), dtype=self.dtype,
            name="embed_team",
        )(batch["team"])
        group = nn.Embed(
            self.n_groups, self.dim_embed_group,
            embedding_init=nn.initializers.normal(stddev=1.0), dtype=self.dtype,
            name="embed_group",
        )(batch["group"])
        x = jnp.concatenate([batch["pos"].astype(self.dtype), team, group], axis=-1)
        x = nn.Dense(
            self.dim_input, kernel_init=torch_linear_init, dtype=self.dtype, name="merge_fc"
        )(x)
        x = self.act(x)
        return nn.Dense(
            self.dim_input, kernel_init=torch_linear_init, dtype=self.dtype, name="merge_out"
        )(x)


@dataclass(frozen=True)
class NBAFirstStageConfig:
    """Mirrors configs/model/nba/first-stage.yaml."""

    num_entities: int = 11
    dim_input: int = 128
    dim_latent: int = 32
    dim_entity: int = 128
    num_latents: int = 8
    dim_head_cross: int = 16
    dim_head_latent: int = 16
    num_head_cross: int = 2
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
    loss_team_weight: float = 0.01
    loss_group_weight: float = 0.01
    shift: float = 0.0
    scale: float = 1.0


def build_nba_first_stage(cfg: NBAFirstStageConfig, dtype=jnp.float32):
    common = dict(qk_norm=cfg.qk_norm, act=gelu_exact, dtype=dtype)
    return FirstStageBackbone(
        dim_latent=cfg.dim_latent,
        n_entities=cfg.num_entities,
        dim_entity=cfg.dim_entity,
        input_embedder=NBAInputEmbedder(dim_input=cfg.dim_input, dtype=dtype),
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
            outputs={"pos": 2, "team": 3, "group": 2},
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


def classification_metrics(logits: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray):
    """Masked accuracy/precision/recall (macro) — torchmetrics replacements
    for the reference's team/group MetricCollections (first_stage/nba.py:90-123)."""
    n_classes = logits.shape[-1]
    pred = jnp.argmax(logits, axis=-1)
    m = mask.astype(jnp.float32)
    acc = jnp.sum((pred == targets) * m) / jnp.maximum(jnp.sum(m), 1.0)
    precs, recs = [], []
    for c in range(n_classes):
        tp = jnp.sum((pred == c) & (targets == c) & (m > 0))
        fp = jnp.sum((pred == c) & (targets != c) & (m > 0))
        fn = jnp.sum((pred != c) & (targets == c) & (m > 0))
        precs.append(tp / jnp.maximum(tp + fp, 1))
        recs.append(tp / jnp.maximum(tp + fn, 1))
    return {
        "accuracy": acc,
        "precision": jnp.mean(jnp.stack(precs)),
        "recall": jnp.mean(jnp.stack(recs)),
    }


def make_nba_first_stage_loss(model: FirstStageBackbone, cfg: NBAFirstStageConfig):
    """Reference Loss.forward (first_stage/nba.py:220-290). Note: the
    reference's team/group CE is unmasked CrossEntropyLoss over padded rows;
    we mask it (padding targets are zeros = 'ball' class and would bias)."""
    from lam_slide_tpu.nn.losses import masked_cross_entropy

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
        loss_team = masked_cross_entropy(preds["team"].astype(jnp.float32), batch["team"], mask)
        loss_group = masked_cross_entropy(
            preds["group"].astype(jnp.float32), batch["group"], mask
        )
        total = (
            cfg.loss_pos_weight * loss_pos
            + cfg.loss_inter_distance_weight * loss_inter
            + cfg.loss_norm_weight * loss_norm
            + cfg.loss_team_weight * loss_team
            + cfg.loss_group_weight * loss_group
        )
        metrics = {
            "pos_loss": loss_pos,
            "inter_distance_loss": loss_inter,
            "norm_loss": loss_norm,
            "team_loss": loss_team,
            "group_loss": loss_group,
            "dist": loss_norm * cfg.scale,
        }
        metrics.update(
            {f"team_{k}": v for k, v in classification_metrics(
                preds["team"].astype(jnp.float32), batch["team"], mask).items()}
        )
        metrics.update(
            {f"group_{k}": v for k, v in classification_metrics(
                preds["group"].astype(jnp.float32), batch["group"], mask).items()}
        )
        return total, metrics

    return loss_fn


@dataclass(frozen=True)
class NBASecondStageConfig:
    """Mirrors configs/model/nba/second-stage.yaml."""
    scan_layers: bool = False

    depth: int = 6
    in_dim: int = 32
    hidden_size: int = 256
    num_heads: int = 16
    mlp_ratio: float = 2.0
    cond_idx: tuple = (0, 8)
    mask_cond_mean: bool = True
    num_timesteps: int = 20
    K: int = 60
    num_runs: int = 20
    post_process: bool = True
    path_type: str = "GVP"
    prediction: str = "data"
    sampling_method: str = "ODE"
    sampling_kwargs: tuple = (("sampling_method", "euler"), ("num_steps", 10))
    weight_si_loss: float = 1.0
    weight_pos_loss: float = 0.25
    weight_inter_dist_loss: float = 0.25
    calc_additional_losses: bool = True
    class_conditional: bool = False
    n_classes: int = 2
    vec_in_dim: int = 256
    reference_init: bool = True


def build_nba_second_stage(
    cfg: NBASecondStageConfig,
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
        frame_keys=("pos", "team", "group", "attention_mask", "entities"),
    )
