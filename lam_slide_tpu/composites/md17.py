"""MD17 domain composite — stage 1 (reconstruction) pieces.

Parity target: src/models/composites/first_stage/md17.py. Inputs are
``atom-type embedding ⊕ Fourier PointEmbed(pos)`` merged by a 2-layer MLP
(md17.py:52-58); the loss is masked position MSE + pairwise-distance MSE +
atom-type CE (+ optional norm loss), with the ``dist`` metric reported in
dataset units via the config scale (md17.py:158-194).
"""

from dataclasses import dataclass, field
from typing import Callable, Dict

from flax import linen as nn
from jax import numpy as jnp

from lam_slide_tpu.composites.first_stage import FirstStageBackbone
from lam_slide_tpu.models import Decoder, Encoder
from lam_slide_tpu.nn.blocks import gelu_exact, torch_linear_init
from lam_slide_tpu.nn.embeddings import Embed, PointEmbed
from lam_slide_tpu.nn.losses import (
    inter_distance,
    masked_cross_entropy,
    masked_mse,
    masked_norm,
)


class MD17InputEmbedder(nn.Module):
    """atom embed ⊕ PointEmbed(pos) → merge MLP (first_stage/md17.py:52-58)."""

    n_atom_types: int
    dim_input: int = 128
    dim_embed_atom: int = 64
    dim_embed_pos: int = 128
    dim_embed_pos_hidden: int = 126
    act: Callable = gelu_exact
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        atom_emb = Embed(
            num_embeddings=self.n_atom_types,
            embedding_dim=self.dim_embed_atom,
            max_norm=1.0,
            dtype=self.dtype,
            name="embed_atom",
        )(batch["atom"])
        pos_emb = PointEmbed(
            hidden_dim=self.dim_embed_pos_hidden,
            embedding_dim=self.dim_embed_pos,
            dtype=self.dtype,
            name="embed_pos",
        )(batch["pos"].astype(self.dtype))
        x = jnp.concatenate([atom_emb, pos_emb], axis=-1)
        x = nn.Dense(
            self.dim_input, kernel_init=torch_linear_init, dtype=self.dtype, name="merge_fc"
        )(x)
        x = self.act(x)
        return nn.Dense(
            self.dim_input, kernel_init=torch_linear_init, dtype=self.dtype, name="merge_out"
        )(x)


@dataclass(frozen=True)
class MD17FirstStageConfig:
    """Mirrors configs/model/md17/first-stage.yaml keys."""

    n_atom_types: int = 10
    num_entities: int = 50
    dim_input: int = 128
    dim_latent: int = 32
    dim_entity: int = 128
    num_latents: int = 192
    dim_head_cross: int = 16
    dim_head_latent: int = 16
    num_head_cross: int = 8
    num_head_latent: int = 2
    enc_num_block_cross: int = 1
    enc_num_block_attn: int = 1
    dec_num_block_cross: int = 0
    dec_num_block_attn: int = 1
    dropout_query: float = 0.1
    qk_norm: bool = True
    # loss weights (configs/model/md17/first-stage.yaml:10-24)
    loss_pos_weight: float = 1.0
    loss_inter_distance_weight: float = 1.0
    loss_atom_type_weight: float = 0.1
    loss_norm_weight: float = 0.0
    shift: float = 0.0
    scale: float = 1.0


def build_md17_first_stage(cfg: MD17FirstStageConfig, dtype=jnp.float32) -> FirstStageBackbone:
    common = dict(qk_norm=cfg.qk_norm, act=gelu_exact, dtype=dtype)
    return FirstStageBackbone(
        dim_latent=cfg.dim_latent,
        n_entities=cfg.num_entities,
        dim_entity=cfg.dim_entity,
        input_embedder=MD17InputEmbedder(
            n_atom_types=cfg.n_atom_types, dim_input=cfg.dim_input, dtype=dtype
        ),
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
            outputs={"pos": 3, "atom": cfg.n_atom_types},
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


@dataclass(frozen=True)
class MD17SecondStageConfig:
    """Mirrors configs/model/md17/second-stage.yaml keys."""
    scan_layers: bool = False

    depth: int = 4
    in_dim: int = 32
    hidden_size: int = 256
    num_heads: int = 16
    mlp_ratio: float = 2.0
    cond_idx: tuple = (0, 10)
    mask_cond_mean: bool = True
    num_timesteps: int = 30
    K: int = 5
    path_type: str = "GVP"
    prediction: str = "data"
    sampling_method: str = "ODE"
    sampling_kwargs: tuple = (("sampling_method", "euler"), ("num_steps", 10))
    weight_si_loss: float = 1.0
    weight_pos_loss: float = 0.25
    weight_inter_dist_loss: float = 0.25
    calc_additional_losses: bool = True
    # class conditioning (CondWrapper, second_stage/md17.py:182-191)
    class_conditional: bool = False
    n_classes: int = 8
    vec_in_dim: int = 256
    reference_init: bool = False  # md17 config sets reset_parameters: False
    # remat the DiT layers: with L=192 latent tokens the stored activations
    # of a depth-4/hidden-256 DiT exceed a v5e's 16 GB HBM at the reference
    # batch size (measured 35.9 GB); recompute costs ~1/3 extra FLOPs.
    checkpointing: bool = True


def build_md17_second_stage(
    cfg: MD17SecondStageConfig,
    first_stage: FirstStageBackbone,
    first_stage_variables,
    dtype=jnp.float32,
):
    """Assemble the SecondStage bundle (reference Wrapper/CondWrapper)."""
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
        checkpointing=cfg.checkpointing,
        scan_layers=cfg.scan_layers,
        dtype=dtype,
    )
    backbone = (
        ClassCondDiT(dit=dit, n_classes=cfg.n_classes, vec_in_dim=cfg.vec_in_dim)
        if cfg.class_conditional
        else dit
    )
    transport = create_transport(path_type=cfg.path_type, prediction=cfg.prediction)
    return SecondStage(
        backbone=backbone,
        transport=transport,
        first_stage=first_stage,
        first_stage_variables=first_stage_variables,
        cond_idx=cfg.cond_idx,
        mask_cond_mean=cfg.mask_cond_mean,
        num_timesteps=cfg.num_timesteps,
        class_conditional=cfg.class_conditional,
    )


def make_md17_first_stage_loss(model: FirstStageBackbone, cfg: MD17FirstStageConfig):
    """loss_fn(params, constants, batch, rng, train) for make_train_step.

    Reference Loss.forward (first_stage/md17.py:158-194).
    """

    def loss_fn(params, constants, batch, rng, train):
        variables = {"params": params}
        if constants is not None:
            variables["constants"] = constants
        preds = model.apply(
            variables, batch, deterministic=not train, rngs={"dropout": rng}
        )
        mask = batch["attention_mask"]
        pos_pred = preds["pos"].astype(jnp.float32)
        atom_pred = preds["atom"].astype(jnp.float32)

        loss_pos = masked_mse(pos_pred, batch["pos"], mask)
        loss_inter = inter_distance(pos_pred, batch["pos"], mask)
        loss_atom = masked_cross_entropy(atom_pred, batch["atom"], mask)
        loss_norm = masked_norm(pos_pred, batch["pos"], mask)

        total = (
            cfg.loss_pos_weight * loss_pos
            + cfg.loss_inter_distance_weight * loss_inter
            + cfg.loss_atom_type_weight * loss_atom
            + cfg.loss_norm_weight * loss_norm
        )
        metrics = {
            "pos_loss": loss_pos,
            "inter_distance_loss": loss_inter,
            "atom_type_loss": loss_atom,
            "norm_loss": loss_norm,
            "dist": loss_norm * cfg.scale,
        }
        return total, metrics

    return loss_fn
