"""Tetrapeptide (4AA) domain composite.

Parity target: src/models/composites/{first_stage,second_stage}/peptide.py.
Stage-1 inputs: residue-type embedding ⊕ flattened atom14 (14×3) → merge
MLP + sin-cos residue-position table (first_stage/peptide.py:96-103); the
decoder is the QuerySplitter variant with atom14_pos (42) and aatype (20)
heads. The loss runs the differentiable geometry pipeline: frame-aligned
position MSE (atom14 → backbone frames → invert_apply) and torsion cosine
loss via atom14 → atom37 → torsions (first_stage/peptide.py:215-474) — all
pure-JAX ops from lam_slide_tpu.geometry, jitted into the train step.

Stage 2: cond_idx (0, 1) — one conditioning frame — over n_timesteps
windows with the same decoded aux losses over (B T); the reference's
``self_optimization_prob`` hparam is accepted-but-unused there
(second_stage/peptide.py:41 — never read) and is omitted here.
"""

from dataclasses import dataclass
from typing import Callable, Dict

import jax
from flax import linen as nn
from jax import numpy as jnp

from lam_slide_tpu.composites.first_stage import FirstStageBackbone
from lam_slide_tpu.geometry import ops as geo
from lam_slide_tpu.geometry.rigid import Rigid
from lam_slide_tpu.models import DecoderQuerySplitter, Encoder
from lam_slide_tpu.nn.blocks import gelu_exact, torch_linear_init
from lam_slide_tpu.nn.embeddings import Embed, SinCosPositionalEmbedding1D
from lam_slide_tpu.nn.losses import (
    inter_distance,
    masked_cross_entropy,
    masked_mse,
    masked_norm,
)


class PeptideInputEmbedder(nn.Module):
    """res-embed ⊕ atom14 flat → merge MLP + sincos residue positions."""

    dim_input: int = 256
    dim_embed_res: int = 64
    n_restypes: int = 20
    max_res: int = 10
    act: Callable = gelu_exact
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        res_emb = Embed(
            num_embeddings=self.n_restypes,
            embedding_dim=self.dim_embed_res,
            max_norm=1.0,
            dtype=self.dtype,
            name="embedding_res",
        )(batch["aatype"])
        pos = batch["atom14_pos"].astype(self.dtype)
        pos_flat = pos.reshape(*pos.shape[:-2], 42)
        x = jnp.concatenate([res_emb, pos_flat], axis=-1)
        x = nn.Dense(
            self.dim_input, kernel_init=torch_linear_init, dtype=self.dtype, name="merge_fc"
        )(x)
        x = self.act(x)
        x = nn.Dense(
            self.dim_input, kernel_init=torch_linear_init, dtype=self.dtype, name="merge_out"
        )(x)
        return SinCosPositionalEmbedding1D(
            n_positions=self.max_res, embed_dim=self.dim_input, name="embed_res_pos"
        )(x)


@dataclass(frozen=True)
class PeptideFirstStageConfig:
    """Mirrors configs/model/peptide/first-stage.yaml."""

    num_entities: int = 8
    dim_input: int = 256
    dim_latent: int = 96
    dim_entity: int = 128
    max_res: int = 10
    num_latents: int = 2
    num_split: int = 8
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
    loss_pos_frame_weight: float = 0.0
    loss_inter_distance_weight: float = 1.0
    loss_res_type_weight: float = 0.01
    loss_torsion_weight: float = 0.0
    loss_norm_weight: float = 0.0
    shift: float = 0.0
    scale: float = 1.0


def build_peptide_first_stage(cfg: PeptideFirstStageConfig, dtype=jnp.float32):
    common = dict(qk_norm=cfg.qk_norm, act=gelu_exact, dtype=dtype)
    return FirstStageBackbone(
        dim_latent=cfg.dim_latent,
        n_entities=cfg.num_entities,
        dim_entity=cfg.dim_entity,
        input_embedder=PeptideInputEmbedder(
            dim_input=cfg.dim_input, max_res=cfg.max_res, dtype=dtype
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
        decoder=DecoderQuerySplitter(
            outputs={"atom14_pos": 42, "aatype": 20},
            dim_query=cfg.dim_entity,
            dim_head_cross=cfg.dim_head_cross,
            dim_head_latent=cfg.dim_head_latent,
            num_head_cross=cfg.num_head_cross,
            num_head_latent=cfg.num_head_latent,
            num_block_cross=cfg.dec_num_block_cross,
            num_block_attn=cfg.dec_num_block_attn,
            dropout_query=cfg.dropout_query,
            num_split=cfg.num_split,
            **common,
        ),
        dtype=dtype,
    )


def frame_aligned_positions(atom14_pos: jnp.ndarray) -> jnp.ndarray:
    """atom14 → per-residue backbone frame → frame-local coordinates
    (first_stage/peptide.py:422-424)."""
    frames = geo.atom14_to_frames(atom14_pos)
    frames = Rigid(frames.rots[..., None, :, :], frames.trans[..., None, :])
    return frames.invert_apply(atom14_pos)


def peptide_torsions(atom14_pos: jnp.ndarray, aatype: jnp.ndarray) -> jnp.ndarray:
    """Differentiable atom14 → atom37 → torsion sin/cos (peptide.py:404-408)."""
    atom37 = geo.atom14_to_atom37(atom14_pos, aatype)
    sin_cos, _ = geo.atom37_to_torsions(atom37, aatype)
    return sin_cos


def masked_cosine_flat(pred, target, mask):
    """1 - cosine_similarity, masked (reference MaskedCosineLoss).

    Uses safe_norm: undefined torsions produce exactly-zero sin/cos vectors
    whose plain-norm gradient is NaN at the origin — and a NaN reaches the
    weights even through a zero loss weight.
    """
    from lam_slide_tpu.nn.losses import safe_norm

    pn = pred / jnp.maximum(safe_norm(pred, axis=-1, keepdims=True), 1e-8)
    tn = target / jnp.maximum(safe_norm(target, axis=-1, keepdims=True), 1e-8)
    per = 1.0 - jnp.sum(pn * tn, axis=-1)
    m = mask.astype(per.dtype)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


def peptide_reconstruction_losses(
    preds: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray], cfg
) -> Dict[str, jnp.ndarray]:
    """Shared stage-1/stage-2 aux loss bundle (first_stage/peptide.py:404-474).

    preds['atom14_pos'] is the flat (…, R, 42) head output; reshaped here.
    """
    r = batch["aatype"].shape[-1]
    pos_pred = preds["atom14_pos"].astype(jnp.float32).reshape(*batch["aatype"].shape, 14, 3)
    pos_true = batch["atom14_pos"]
    a14_mask = batch["atom14_mask"].astype(jnp.float32)

    loss_pos = masked_mse(
        pos_pred.reshape(-1, 3), pos_true.reshape(-1, 3), a14_mask.reshape(-1)
    )
    loss_norm = masked_norm(
        pos_pred.reshape(-1, 3), pos_true.reshape(-1, 3), a14_mask.reshape(-1)
    )
    frame_pred = frame_aligned_positions(pos_pred)
    loss_pos_frame = masked_mse(
        frame_pred.reshape(-1, 3),
        batch["atom14_pos_frame"].reshape(-1, 3),
        a14_mask.reshape(-1),
    )
    bshape = pos_pred.shape[:-3]
    loss_inter = inter_distance(
        pos_pred.reshape(*bshape, r * 14, 3).reshape(-1, r * 14, 3),
        pos_true.reshape(*bshape, r * 14, 3).reshape(-1, r * 14, 3),
        a14_mask.reshape(-1, r * 14),
    )
    tors_pred = peptide_torsions(pos_pred, batch["aatype"])
    loss_torsion = masked_cosine_flat(
        tors_pred.reshape(-1, 2),
        batch["torsions"].reshape(-1, 2),
        batch["torsions_mask"].reshape(-1),
    )
    return {
        "pos_loss": loss_pos,
        "pos_frame_loss": loss_pos_frame,
        "inter_distance_loss": loss_inter,
        "norm_loss": loss_norm,
        "torsion_loss": loss_torsion,
    }


def make_peptide_first_stage_loss(model: FirstStageBackbone, cfg: PeptideFirstStageConfig):
    def loss_fn(params, constants, batch, rng, train):
        variables = {"params": params}
        if constants is not None:
            variables["constants"] = constants
        preds = model.apply(variables, batch, deterministic=not train, rngs={"dropout": rng})
        parts = peptide_reconstruction_losses(preds, batch, cfg)
        res_mask = jnp.ones(batch["aatype"].shape, jnp.float32)
        loss_res = masked_cross_entropy(
            preds["aatype"].astype(jnp.float32), batch["aatype"], res_mask
        )
        total = (
            cfg.loss_pos_weight * parts["pos_loss"]
            + cfg.loss_pos_frame_weight * parts["pos_frame_loss"]
            + cfg.loss_inter_distance_weight * parts["inter_distance_loss"]
            + cfg.loss_res_type_weight * loss_res
            + cfg.loss_norm_weight * parts["norm_loss"]
            + cfg.loss_torsion_weight * parts["torsion_loss"]
        )
        pred_res = jnp.argmax(preds["aatype"], axis=-1)
        metrics = dict(parts)
        metrics["res_type_loss"] = loss_res
        metrics["res_accuracy"] = jnp.mean((pred_res == batch["aatype"]).astype(jnp.float32))
        metrics["dist"] = parts["norm_loss"] * cfg.scale
        return total, metrics

    return loss_fn


@dataclass(frozen=True)
class PeptideSecondStageConfig:
    """Mirrors configs/model/peptide/second-stage.yaml."""
    scan_layers: bool = False

    depth: int = 7
    in_dim: int = 96
    hidden_size: int = 384
    num_heads: int = 16
    mlp_ratio: float = 2.0
    cond_idx: tuple = (0, 1)
    mask_cond_mean: bool = True
    num_timesteps: int = 100
    path_type: str = "GVP"
    prediction: str = "data"
    sampling_method: str = "ODE"
    sampling_kwargs: tuple = (("sampling_method", "euler"), ("num_steps", 10))
    loss_si_weight: float = 1.0
    loss_pos_weight: float = 0.25
    loss_pos_frame_weight: float = 0.25
    loss_inter_distance_weight: float = 0.25
    loss_torsion_weight: float = 0.0
    loss_norm_weight: float = 0.0
    calc_additional_losses: bool = True
    checkpointing: bool = False
    reference_init: bool = True


def build_peptide_second_stage(
    cfg: PeptideSecondStageConfig,
    first_stage: FirstStageBackbone,
    first_stage_variables,
    dtype=jnp.float32,
):
    from lam_slide_tpu.composites.second_stage import SecondStage
    from lam_slide_tpu.models import LatentDiT
    from lam_slide_tpu.transport import create_transport

    dit = LatentDiT(
        depth=cfg.depth,
        in_dim=cfg.in_dim,
        hidden_size=cfg.hidden_size,
        num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio,
        n_timesteps=cfg.num_timesteps,
        checkpointing=cfg.checkpointing,
        scan_layers=cfg.scan_layers,
        reference_init=cfg.reference_init,
        dtype=dtype,
    )
    return SecondStage(
        backbone=dit,
        transport=create_transport(path_type=cfg.path_type, prediction=cfg.prediction),
        first_stage=first_stage,
        first_stage_variables=first_stage_variables,
        cond_idx=cfg.cond_idx,
        mask_cond_mean=cfg.mask_cond_mean,
        num_timesteps=cfg.num_timesteps,
        frame_keys=("atom14_pos", "aatype", "attention_mask", "entities"),
    )


def make_peptide_second_stage_loss(ss, cfg: PeptideSecondStageConfig):
    """SI loss + decoded geometry aux losses (second_stage/peptide.py:293-378)."""

    def loss_fn(params, constants, batch, rng, train):
        fs_variables = constants["first_stage"]
        x1, model_kwargs = ss.prepare_batch(fs_variables, batch)
        terms = ss.transport.training_losses(rng, ss.model_fn(params), x1, model_kwargs)
        si_loss = jnp.mean(terms["loss"])
        total = cfg.loss_si_weight * si_loss
        metrics = {"si_loss": si_loss}
        if cfg.calc_additional_losses:
            pred_latent = terms["pred"]
            b, t = pred_latent.shape[:2]
            flat_latent = pred_latent.reshape(b * t, *pred_latent.shape[2:])
            flat_entities = batch["entities"].reshape(b * t, -1)
            preds = ss.decode(fs_variables, flat_latent, flat_entities)
            flat_batch = {
                k: batch[k].reshape(b * t, *batch[k].shape[2:])
                for k in (
                    "atom14_pos", "atom14_mask", "atom14_pos_frame", "aatype",
                    "torsions", "torsions_mask",
                )
            }
            parts = peptide_reconstruction_losses(preds, flat_batch, cfg)
            total = (
                total
                + cfg.loss_pos_weight * parts["pos_loss"]
                + cfg.loss_pos_frame_weight * parts["pos_frame_loss"]
                + cfg.loss_inter_distance_weight * parts["inter_distance_loss"]
                + cfg.loss_torsion_weight * parts["torsion_loss"]
                + cfg.loss_norm_weight * parts["norm_loss"]
            )
            metrics.update(parts)
        return total, metrics

    return loss_fn
