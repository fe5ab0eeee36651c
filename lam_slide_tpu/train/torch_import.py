"""torch -> JAX checkpoint importer.

Maps a reference Lightning checkpoint's ``state_dict`` (flat ``a.b.c`` keys,
torch tensors or numpy arrays) into the flax variable trees of the matching
``lam_slide_tpu`` composites — all four domains, both stages. This is the
verification pathway for the fidelity gate: any *trained* reference
checkpoint becomes directly evaluable under this framework (golden forward
parity composes with this mapping to give trained-model parity).

Reference checkpoint layout (src/models/composites/lightning_base.py:109-119):
a Lightning ``.ckpt`` holds ``state_dict`` — module weights prefixed by the
Wrapper attribute names (``backbone.*`` for the model, plus
``first_stage_model.backbone.*`` inside second-stage wrappers and
``vec_in_embedding.weight`` on CondWrappers) — and ``ema`` =
``{"params": <same-keyed state_dict>, "decay": float}`` injected by
``on_save_checkpoint``. ``torch.compile`` runs carry ``._orig_mod`` fragments
in every key; those are stripped.

The weight-layout conventions (torch Linear stores ``[out, in]``, flax Dense
``[in, out]``; fused ``to_qkv`` splits; Conv1d(k=1) -> Dense) are the same
mapping pinned by tests/test_torch_parity.py against captured reference
outputs; this module promotes it into the library.
"""

from typing import Any, Dict, Optional, Tuple

import numpy as np
from jax import numpy as jnp

__all__ = [
    "strip_compiled",
    "import_encoder",
    "import_decoder",
    "import_input_embedder",
    "import_first_stage",
    "import_latent_dit",
    "import_second_stage",
    "import_checkpoint",
    "load_reference_checkpoint",
]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _arr(v) -> np.ndarray:
    """torch tensor / numpy array -> numpy (host, detached)."""
    if hasattr(v, "detach"):  # torch.Tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _dense(w, b=None) -> Dict[str, jnp.ndarray]:
    """torch nn.Linear [out, in] -> flax Dense {kernel [in, out], bias}."""
    out = {"kernel": jnp.asarray(_arr(w).T)}
    if b is not None:
        out["bias"] = jnp.asarray(_arr(b))
    return out

def _emb(w) -> Dict[str, jnp.ndarray]:
    """torch nn.Embedding.weight -> flax {embedding}."""
    return {"embedding": jnp.asarray(_arr(w))}


def _sub(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def strip_compiled(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Remove torch.compile's ``_orig_mod.`` wrapper fragments from keys."""
    return {k.replace("._orig_mod.", ".").replace("_orig_mod.", ""): v
            for k, v in sd.items()}


def _attn_params(p: Dict[str, Any], qkv_fused: bool) -> Dict[str, Any]:
    """Reference Attention/SelfAttention (torch_modules.py:147-253) ->
    nn.blocks.Attention params."""
    out = {}
    if qkv_fused:
        w = _arr(p["attn.fn.to_qkv.weight"])
        inner = w.shape[0] // 3
        out["to_q"] = _dense(w[:inner])
        out["to_kv"] = _dense(w[inner:])
    else:
        out["to_q"] = _dense(p["attn.fn.to_q.weight"])
        out["to_kv"] = _dense(p["attn.fn.to_kv.weight"])
    out["to_out"] = _dense(p["attn.fn.to_out.weight"], p["attn.fn.to_out.bias"])
    if "attn.fn.norm.query_norm.scale" in p:
        out["norm"] = {
            "query_norm": {"scale": jnp.asarray(_arr(p["attn.fn.norm.query_norm.scale"]))},
            "key_norm": {"scale": jnp.asarray(_arr(p["attn.fn.norm.key_norm.scale"]))},
        }
    return out


def _ln(p: Dict[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    return {"weight": jnp.asarray(_arr(p[prefix + ".weight"])),
            "bias": jnp.asarray(_arr(p[prefix + ".bias"]))}


def _block_params(p: Dict[str, Any], qkv_fused: bool, cross: bool) -> Dict[str, Any]:
    """Reference {Cross,Self}AttentionBlock (PreNorm attn + PreNorm FF) ->
    nn.blocks.{Cross,Self}AttentionBlock params."""
    out = {
        "attn": _attn_params(p, qkv_fused),
        "norm": _ln(p, "attn.norm"),
        "ff": {"fc0": _dense(p["ff.fn.net.0.0.weight"], p["ff.fn.net.0.0.bias"]),
               "out": _dense(p["ff.fn.net.1.weight"], p["ff.fn.net.1.bias"])},
        "norm_ff": _ln(p, "ff.norm"),
    }
    if cross:
        out["norm_context"] = _ln(p, "attn.norm_context")
    return out


def _count_blocks(sd: Dict[str, Any], prefix: str) -> int:
    idx = set()
    for k in sd:
        if k.startswith(prefix):
            head = k[len(prefix):].split(".", 1)[0]
            if head.isdigit():
                idx.add(int(head))
    return (max(idx) + 1) if idx else 0


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------


def import_encoder(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Reference Encoder/Encoder2 state_dict (keys relative to the encoder
    module) -> flax models.Encoder/Encoder2 params.

    Variant detection: the blocked Encoder stores self-attention under
    ``blocks_attn.{i}`` (encoder.py:84); the interleaved Encoder2 stores
    (cross, self) pairs under ``cross_attn_blocks.{i}.{0,1}`` (encoder.py:131).
    Both map onto the flax ``cross_{i}`` / ``self_{i}`` scopes.
    """
    params: Dict[str, Any] = {
        "latents": jnp.asarray(_arr(sd["latents"])),
        "mlp_in": _dense(sd["mlp.0.weight"], sd["mlp.0.bias"]),
        "mlp_out": _dense(sd["mlp.2.weight"], sd["mlp.2.bias"]),
    }
    interleaved = any(k.startswith("cross_attn_blocks.0.0.") for k in sd)
    n_cross = _count_blocks(sd, "cross_attn_blocks.")
    if interleaved:  # Encoder2
        for i in range(n_cross):
            params[f"cross_{i}"] = _block_params(
                _sub(sd, f"cross_attn_blocks.{i}.0."), qkv_fused=False, cross=True)
            params[f"self_{i}"] = _block_params(
                _sub(sd, f"cross_attn_blocks.{i}.1."), qkv_fused=True, cross=False)
    else:  # Encoder
        for i in range(n_cross):
            params[f"cross_{i}"] = _block_params(
                _sub(sd, f"cross_attn_blocks.{i}."), qkv_fused=False, cross=True)
        for i in range(_count_blocks(sd, "blocks_attn.")):
            params[f"self_{i}"] = _block_params(
                _sub(sd, f"blocks_attn.{i}."), qkv_fused=True, cross=False)
    return params


def import_decoder(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Reference Decoder/DecoderFE/Decoder2/DecoderQuerySplitter state_dict
    (keys relative to the decoder module) -> flax decoder params.

    All variants share trunk + output_block + per-name heads
    (decoder.py:12-411); the extras are detected from the keys:
    ``extender.1`` (QuerySplitter Conv1d), ``energy_*`` (FE),
    a bare ``query`` parameter (Decoder2 shared query bias).
    """
    params: Dict[str, Any] = {
        "query_mlp": _dense(sd["query_mlp.1.weight"], sd["query_mlp.1.bias"]),
        "output_block": _block_params(_sub(sd, "output_block."), qkv_fused=False,
                                      cross=True),
    }
    for i in range(_count_blocks(sd, "self_attn_blocks.")):
        params[f"self_{i}"] = _block_params(
            _sub(sd, f"self_attn_blocks.{i}."), qkv_fused=True, cross=False)
    for i in range(_count_blocks(sd, "cross_attn_blocks.")):
        params[f"cross_{i}"] = _block_params(
            _sub(sd, f"cross_attn_blocks.{i}."), qkv_fused=False, cross=True)
    # output heads: output_layers.<name>.{0,2} Linear pairs
    names = {k.split(".")[1] for k in sd if k.startswith("output_layers.")}
    for name in sorted(names):
        params[f"head_{name}_fc"] = _dense(sd[f"output_layers.{name}.0.weight"],
                                           sd[f"output_layers.{name}.0.bias"])
        params[f"head_{name}_out"] = _dense(sd[f"output_layers.{name}.2.weight"],
                                            sd[f"output_layers.{name}.2.bias"])
    if "extender.1.weight" in sd:  # QuerySplitter: Conv1d(D, D*split, 1)
        w = _arr(sd["extender.1.weight"])[:, :, 0]  # [D*split, D]
        params["extender"] = {"kernel": jnp.asarray(w.T),
                              "bias": jnp.asarray(_arr(sd["extender.1.bias"]))}
    if "energy_query" in sd:  # DecoderFE
        params["energy_query"] = jnp.asarray(_arr(sd["energy_query"]))
        params["energy_block"] = _block_params(_sub(sd, "energy_block."),
                                               qkv_fused=False, cross=True)
        params["energy_fc"] = _dense(sd["energy_mlp.0.weight"], sd["energy_mlp.0.bias"])
        params["energy_out"] = _dense(sd["energy_mlp.2.weight"], sd["energy_mlp.2.bias"])
    if "query" in sd:  # Decoder2 shared query bias
        params["query"] = jnp.asarray(_arr(sd["query"]))
    return params


# ---------------------------------------------------------------------------
# first stage
# ---------------------------------------------------------------------------


def detect_domain(backbone_sd: Dict[str, Any]) -> str:
    """md17 | nba | peptide | pedestrian, from the domain embedder keys."""
    if any(k.startswith("embed_atom.") for k in backbone_sd):
        return "md17"
    if any(k.startswith("embed_team.") for k in backbone_sd):
        return "nba"
    if any(k.startswith("embedding_res.") for k in backbone_sd):
        return "peptide"
    return "pedestrian"


def import_input_embedder(sd: Dict[str, Any], domain: str) -> Dict[str, Any]:
    """Domain ``prepare_inputs`` weights -> the matching flax InputEmbedder.

    md17: embed_atom ⊕ PointEmbed(pos) -> merge (first_stage/md17.py:39-58);
    nba: pos ⊕ team ⊕ group embeds (first_stage/nba.py:41-59); peptide:
    residue embed ⊕ atom14 (first_stage/peptide.py:41-57); pedestrian: merge
    MLP only (first_stage/pedestrian.py:33-42).
    """
    params: Dict[str, Any] = {
        "merge_fc": _dense(sd["net_merge.0.weight"], sd["net_merge.0.bias"]),
        "merge_out": _dense(sd["net_merge.2.weight"], sd["net_merge.2.bias"]),
    }
    if domain == "md17":
        params["embed_atom"] = _emb(sd["embed_atom.weight"])
        params["embed_pos"] = {"mlp": _dense(sd["embed_pos.mlp.weight"],
                                             sd["embed_pos.mlp.bias"])}
    elif domain == "nba":
        params["embed_team"] = _emb(sd["embed_team.weight"])
        params["embed_group"] = _emb(sd["embed_group.weight"])
    elif domain == "peptide":
        params["embedding_res"] = _emb(sd["embedding_res.weight"])
        # embed_res_pos is a fixed sin-cos table — no parameters
    return params


def import_first_stage(backbone_sd: Dict[str, Any],
                       domain: Optional[str] = None) -> Dict[str, Any]:
    """Reference first-stage ``Backbone`` state_dict (keys relative to the
    ``backbone.`` prefix) -> flax FirstStageBackbone variables
    ``{"params": ..., "constants": ...}``.

    quant/post_quant: the Linear half of the reference's
    Linear+non-affine-LayerNorm bottleneck (lightning_base.py:24-31) — the
    LayerNorms carry no weights. The frozen entity table lands in the
    ``constants`` collection; its duplicate appearances under
    ``encoder.entity_embedding.*`` / ``decoder.entity_embedding.*`` (the
    reference passes one module to both) are ignored.
    """
    backbone_sd = strip_compiled(backbone_sd)
    if domain is None:
        domain = detect_domain(backbone_sd)
    params = {
        "input_embedder": import_input_embedder(backbone_sd, domain),
        "encoder": import_encoder(_sub(backbone_sd, "encoder.")),
        "decoder": import_decoder(_sub(backbone_sd, "decoder.")),
        "quant": _dense(backbone_sd["quant.0.weight"], backbone_sd["quant.0.bias"]),
        "post_quant": _dense(backbone_sd["post_quant.1.weight"],
                             backbone_sd["post_quant.1.bias"]),
    }
    # The frozen orthogonal entity table: framework-layout checkpoints carry
    # it at backbone level (embed_entity.*); a GENUINE reference Backbone
    # registers one EntityEmbeddingOrthogonal module inside encoder AND
    # decoder (first_stage/peptide.py:36-39 passes the same instance to
    # both), so its only state_dict keys are
    # {encoder,decoder}.entity_embedding.embedding.weight.
    for key in ("embed_entity.embedding.weight",
                "encoder.entity_embedding.embedding.weight",
                "decoder.entity_embedding.embedding.weight"):
        if key in backbone_sd:
            entity_w = backbone_sd[key]
            break
    else:
        raise KeyError("no entity-embedding table in state_dict")
    constants = {"embed_entity": _emb(entity_w)}
    return {"params": params, "constants": constants}


# ---------------------------------------------------------------------------
# second stage (latent DiT)
# ---------------------------------------------------------------------------


def _pma_params(p: Dict[str, Any]) -> Dict[str, Any]:
    """torch ParallelMLPAttentionV2 (mmdit.py:215-249) -> flax
    ParallelMLPAttention params (weight-sliced fused linear1)."""
    return {
        "linear1": jnp.asarray(_arr(p["linear1.weight"]).T),
        "linear1_bias": jnp.asarray(_arr(p["linear1.bias"])),
        "q_norm_scale": jnp.asarray(_arr(p["norm.query_norm.scale"])),
        "k_norm_scale": jnp.asarray(_arr(p["norm.key_norm.scale"])),
        "linear2": _dense(p["linear2.weight"], p["linear2.bias"]),
    }


def _dit_block(p: Dict[str, Any]) -> Dict[str, Any]:
    return {
        "modulation": {"lin": _dense(p["modulation.lin.weight"],
                                     p["modulation.lin.bias"])},
        "spatial_block": _pma_params(_sub(p, "spatial_block.")),
        "temporal_block": _pma_params(_sub(p, "temporal_block.")),
    }


def import_latent_dit(sd: Dict[str, Any], scan_layers: bool = False,
                      share_weights: bool = False) -> Dict[str, Any]:
    """Reference LatentSIV3 state_dict (keys relative to the DiT module,
    latent_si_v31.py:66-188) -> flax LatentDiT params.

    scan_layers=True stacks the per-block trees along a leading depth axis
    (the nn.scan layout ``blocks/layer/...``); share_weights maps the single
    shared block onto ``block_shared``.
    """
    sd = strip_compiled(sd)
    params: Dict[str, Any] = {
        "x_in": _dense(sd["x_in.weight"], sd["x_in.bias"]),
        "cond_to_emb": _dense(sd["cond_to_emb.weight"], sd["cond_to_emb.bias"]),
        "mask_to_emb": _emb(sd["mask_to_emb.weight"]),
        "time_in": {"in_layer": _dense(sd["time_in.in_layer.weight"],
                                       sd["time_in.in_layer.bias"]),
                    "out_layer": _dense(sd["time_in.out_layer.weight"],
                                        sd["time_in.out_layer.bias"])},
        "adaLN_out": _dense(sd["adaLN_modulation.1.weight"],
                            sd["adaLN_modulation.1.bias"]),
        "linear_out": _dense(sd["linear.weight"], sd["linear.bias"]),
    }
    if "vec_in.in_layer.weight" in sd:
        params["vec_in"] = {
            "in_layer": _dense(sd["vec_in.in_layer.weight"], sd["vec_in.in_layer.bias"]),
            "out_layer": _dense(sd["vec_in.out_layer.weight"], sd["vec_in.out_layer.bias"]),
        }
    depth = _count_blocks(sd, "blocks.")
    blocks = [_dit_block(_sub(sd, f"blocks.{i}.")) for i in range(depth)]
    if share_weights:
        params["block_shared"] = blocks[0]
    elif scan_layers:
        import jax

        params["blocks"] = {"layer": jax.tree.map(
            lambda *xs: jnp.stack(xs), *blocks)}
    else:
        for i, b in enumerate(blocks):
            params[f"block_{i}"] = b
    return params


def import_second_stage(sd: Dict[str, Any], scan_layers: bool = False,
                        share_weights: bool = False) -> Dict[str, Any]:
    """Reference second-stage Wrapper/CondWrapper state_dict (keys relative
    to the LightningModule) -> ``{"backbone": {"params": ...},
    "first_stage": {"params": ..., "constants": ...} | None, "domain": str}``.

    The class-conditional wrapper's ``vec_in_embedding`` (second_stage/
    md17.py:182-191) nests the DiT under the flax ClassCondDiT scope
    ``dit``; the frozen stage-1 model embedded at ``first_stage_model.*``
    (second_stage/md17.py:46-51) is imported alongside when present.
    """
    sd = strip_compiled(sd)
    dit_params = import_latent_dit(_sub(sd, "backbone."), scan_layers=scan_layers,
                                   share_weights=share_weights)
    if "vec_in_embedding.weight" in sd:
        backbone = {"dit": dit_params,
                    "vec_in_embedding": _emb(sd["vec_in_embedding.weight"])}
    else:
        backbone = dit_params
    first_stage = None
    domain = None
    fs_sd = _sub(sd, "first_stage_model.backbone.")
    if fs_sd:
        domain = detect_domain(fs_sd)
        first_stage = import_first_stage(fs_sd, domain)
    return {"backbone": {"params": backbone}, "first_stage": first_stage,
            "domain": domain}


# ---------------------------------------------------------------------------
# whole-checkpoint entry points
# ---------------------------------------------------------------------------


def load_reference_checkpoint(path: str) -> Tuple[Dict[str, Any], Optional[Dict[str, Any]]]:
    """Load a Lightning ``.ckpt`` (torch pickle) or an ``.npz`` flat dump.

    Returns ``(state_dict, ema_state_dict | None)`` with flat torch-style
    keys. The EMA dict mirrors the state_dict keys
    (lightning_base.py:109-119 stores ``ema = {"params": ..., "decay": ...}``).
    """
    if path.endswith(".npz"):
        z = np.load(path)
        return {k: z[k] for k in z.files}, None
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" not in ckpt:  # bare state_dict file
        return {k: _arr(v) for k, v in ckpt.items()}, None
    sd = {k: _arr(v) for k, v in ckpt["state_dict"].items()}
    ema = None
    if isinstance(ckpt.get("ema"), dict) and "params" in ckpt["ema"]:
        ema = {k: _arr(v) for k, v in ckpt["ema"]["params"].items()}
    return sd, ema


def import_checkpoint(path: str, stage: Optional[str] = None,
                      scan_layers: bool = False,
                      share_weights: bool = False) -> Dict[str, Any]:
    """One-call import: load + map both raw and EMA weights.

    stage: 'first' | 'second' | None (auto: second iff ``backbone.x_in.*``
    present). Returns ``{"stage", "domain", "variables", "ema_variables"}``
    where variables are ready for the matching composite's ``apply``.
    """
    sd, ema = load_reference_checkpoint(path)
    sd = strip_compiled(sd)
    ema = strip_compiled(ema) if ema else None
    if stage is None:
        stage = "second" if any(k.startswith("backbone.x_in.") for k in sd) else "first"

    def _map(d):
        if stage == "second":
            return import_second_stage(d, scan_layers=scan_layers,
                                       share_weights=share_weights)
        fs = import_first_stage(_sub(d, "backbone."))
        return {"backbone": fs, "first_stage": None,
                "domain": detect_domain(_sub(d, "backbone."))}

    out = _map(sd)
    return {
        "stage": stage,
        "domain": out["domain"],
        "variables": out["backbone"],
        "first_stage": out["first_stage"],
        "ema_variables": _map(ema)["backbone"] if ema else None,
    }
