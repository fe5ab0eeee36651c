"""Factorized spatial/temporal latent diffusion transformer.

The stage-2 denoiser: a flux-style DiT over latent trajectories
``[B, T, L, D]`` whose every layer runs AdaLN-modulated attention twice —
once over the L latent tokens of each frame ("spatial") and once over the T
frames of each latent token ("temporal"). Capability-parity target:
reference ``src/models/components/latent/latent_si_v31.py`` +
``mmdit.py`` (RoPE, QKNorm, Modulation, ParallelMLPAttentionV2).

TPU-first design notes
----------------------
* The factorization is the long-context strategy: attention length is
  max(T, L) <= ~1000, never T*L, so both axes stay MXU-friendly.
* RoPE is precomputed once per forward as fp32 cos/sin tables of shape
  [axis_len, head_dim/2] and applied with two fused multiplies — no 2x2
  rotation-matrix materialization like the reference
  (mmdit.py:75-90), same math, a fraction of the HBM traffic.
* ``linear1`` fuses QKV and MLP-up into a single matmul; ``linear2`` fuses
  attention-out and MLP-down (reference mmdit.py:215-249) — two big MXU
  matmuls per block per axis.
* Spatial attention folds T into the batch via a free reshape; temporal
  attention transposes to [B, L, T, D] once per block. Params live in fp32,
  activations in the configurable compute dtype (bf16 in training configs).
* ``checkpointing=True`` wraps each layer in ``jax.checkpoint`` (remat) to
  trade FLOPs for HBM on long-T peptide runs.
"""

import math
import os
from typing import NamedTuple, Optional, Tuple

import jax
from flax import linen as nn
from jax import numpy as jnp

from lam_slide_tpu.nn import initializers as inits
from lam_slide_tpu.nn.blocks import torch_linear_init
from lam_slide_tpu.nn.embeddings import timestep_embedding
from lam_slide_tpu.nn.norms import QKNorm, layer_norm
from lam_slide_tpu.ops.attention import dot_product_attention, linear_attention


def rope_cos_sin(n: int, dim: int, theta: float = 10_000.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotary tables for positions arange(n): (cos, sin), each [n, dim//2], fp32."""
    assert dim % 2 == 0
    scale = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    omega = 1.0 / (theta**scale)
    out = jnp.arange(n, dtype=jnp.float32)[:, None] * omega[None]
    return jnp.cos(out), jnp.sin(out)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate adjacent feature pairs of x [..., n, d] by position angle.

    Matches reference apply_rope (mmdit.py:84-90): pairs are (even, odd)
    adjacent features; fp32 math, cast back to input dtype.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    x_even = x32[..., 0::2]
    x_odd = x32[..., 1::2]
    out_even = cos * x_even - sin * x_odd
    out_odd = sin * x_even + cos * x_odd
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    return out.astype(dtype)


class ModulationOut(NamedTuple):
    shift: jnp.ndarray  # [B, 1, 1, D]
    scale: jnp.ndarray
    gate: jnp.ndarray


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """AdaLN modulation x * (1 + scale) + shift (reference mmdit.py:21-22)."""
    return x * (1.0 + scale.astype(x.dtype)) + shift.astype(x.dtype)


class Modulation(nn.Module):
    """vec [B, D] -> 1 or 2 (shift, scale, gate) triples (mmdit.py:184-197).

    Zero-initialized (when the parent requests reference init) so every block
    starts as identity.
    """

    dim: int
    double: bool = True
    zero_init: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vec: jnp.ndarray):
        mult = 6 if self.double else 3
        kernel_init = inits.zeros if self.zero_init else torch_linear_init
        out = nn.Dense(
            mult * self.dim, kernel_init=kernel_init, dtype=self.dtype, name="lin"
        )(nn.silu(vec))
        out = out[:, None, None, :]  # broadcast over (T, L)
        parts = jnp.split(out, mult, axis=-1)
        first = ModulationOut(*parts[:3])
        second = ModulationOut(*parts[3:]) if self.double else None
        return first, second


class ModulationTriple(nn.Module):
    """vec [B, D] -> 3 (shift, scale, gate) triples (reference mmdit.py:200-212;
    provided for triple-branch DiT variants)."""

    dim: int
    zero_init: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vec: jnp.ndarray):
        kernel_init = inits.zeros if self.zero_init else torch_linear_init
        out = nn.Dense(9 * self.dim, kernel_init=kernel_init, dtype=self.dtype, name="lin")(
            nn.silu(vec)
        )
        parts = jnp.split(out[:, None, None, :], 9, axis=-1)
        return (
            ModulationOut(*parts[:3]),
            ModulationOut(*parts[3:6]),
            ModulationOut(*parts[6:]),
        )


class MLPEmbedder(nn.Module):
    """Linear -> SiLU -> Linear vector embedder (mmdit.py:116-124)."""

    hidden_dim: int
    use_normal_init: bool = True  # reference: std=0.02 normals for time/vec embedders
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kinit = inits.normal_002 if self.use_normal_init else torch_linear_init
        x = nn.Dense(self.hidden_dim, kernel_init=kinit, dtype=self.dtype, name="in_layer")(x)
        x = nn.silu(x)
        return nn.Dense(self.hidden_dim, kernel_init=kinit, dtype=self.dtype, name="out_layer")(x)


class _DenseParams(nn.Module):
    """Declares nn.Dense-compatible params ({kernel, bias}) and returns them
    raw — so fused kernels can consume the weights directly while the param
    tree stays checkpoint-compatible with nn.Dense."""

    features: int
    kernel_init: any

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", self.kernel_init,
                            (in_features, self.features), jnp.float32)
        bias = self.param("bias", inits.zeros, (self.features,), jnp.float32)
        return kernel, bias


class ParallelMLPAttention(nn.Module):
    """Fused attention ∥ MLP block (reference ParallelMLPAttentionV2).

    One matmul produces QKV and the MLP-up projection; attention output and
    gelu(mlp) are concatenated and reduced by a second matmul.
    x: [B', n, D] with RoPE tables for the n axis.

    TPU layout: QK RMS-norm and RoPE run in *packed lanes* (heads stay
    contiguous D-segments — ops/packed_attention.py), and for tiny axes
    (n ≤ packed_threshold, the DiT's spatial L=2..8) the attention itself
    does too — no [B, H, n, dh] reshape ever happens on the hot path.
    Measured ~2.5x per-block speedup at the 4AA shapes.
    """

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 2.0
    qk_scale: Optional[float] = None
    attention_mode: str = "scaled_dot_product"
    backend: str = "auto"
    packed_threshold: int = 8
    fused_temporal: bool = False
    reference_init: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, cos: Optional[jnp.ndarray] = None, sin: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        from lam_slide_tpu.ops.packed_attention import (
            lane_rope_tables,
            packed_rmsnorm,
            packed_rope,
            packed_small_attention,
        )

        d = self.hidden_size
        h = self.num_heads
        dh = d // h
        mlp_hidden = int(d * self.mlp_ratio)
        kinit = inits.attn_kernel_init if self.reference_init else torch_linear_init

        # One fused linear1 parameter (reference ParallelMLPAttentionV2), but
        # applied as four matmuls on weight slices: slicing the [N, 2688]
        # activation into q/k/v/mlp materializes three ~50MB copies per block
        # (profiled ~0.8ms each at B=32); slicing the weight is free.
        w1_raw = self.param(
            "linear1",
            lambda key, shape: kinit(key, shape, jnp.float32),
            (x.shape[-1], 3 * d + mlp_hidden),
        )
        b1_raw = self.param("linear1_bias", inits.zeros, (3 * d + mlp_hidden,), jnp.float32)
        # QKNorm (per-head RMS, scale [dh] shared across heads) in packed lanes
        q_scale = self.param("q_norm_scale", nn.initializers.ones, (dh,), jnp.float32)
        k_scale = self.param("k_norm_scale", nn.initializers.ones, (dh,), jnp.float32)
        w2_raw, b2_raw = _DenseParams(features=d, kernel_init=kinit,
                                      name="linear2")(d + mlp_hidden)

        b, n = x.shape[0], x.shape[1]
        scale = self.qk_scale if self.qk_scale is not None else dh**-0.5
        xd = x.astype(self.dtype)

        if (self.attention_mode != "linear" and n <= self.packed_threshold
                and cos is not None):
            # One-pass Pallas kernel for the whole small-L spatial block:
            # linear1 → QKNorm → RoPE → packed attention → gelu → linear2
            # in a single HBM pass (ops/fused_spatial_block.py).
            from lam_slide_tpu.ops.fused_spatial_block import fused_spatial_block
            from lam_slide_tpu.ops.packed_attention import lane_rope_tables

            cos_l, sin_l = lane_rope_tables(cos, sin, h)
            return fused_spatial_block(
                xd, w1_raw, b1_raw, q_scale, k_scale, w2_raw, b2_raw,
                cos_l, sin_l, h, scale=float(scale))

        w1 = w1_raw.astype(self.dtype)
        b1 = b1_raw.astype(self.dtype)

        def proj(lo, hi):
            return jax.lax.dot_general(
                xd, w1[:, lo:hi], (((xd.ndim - 1,), (0,)), ((), ()))
            ) + b1[lo:hi]

        emit_hm = (self.attention_mode != "linear"
                   and n > self.packed_threshold and cos is not None
                   and xd.ndim == 3
                   and os.environ.get("LAM_SLIDE_EMIT_HEADMAJOR") == "1")
        if emit_hm:
            # A/B knob (VERDICT r2 levers a+b): linear1 EMITS head-major
            # q/k/v — the 3D-weight einsum asks the dot itself to produce
            # [B, H, n, dh], so the head transpose can ride the matmul's
            # output write instead of running as a standalone relayout
            # pass; symmetrically the output transpose folds into
            # linear2's (h, dh) double contraction. QKNorm/RoPE run as
            # head-major elementwise ops (same math to the same fp32
            # rounding points as the packed forms — pinned in
            # tests/test_packed_attention.py).
            from lam_slide_tpu.ops.packed_attention import (
                headmajor_rmsnorm,
                headmajor_rope,
            )

            din = xd.shape[-1]
            w1h = w1[:, : 3 * d].reshape(din, 3, h, dh)
            b1h = b1[: 3 * d].reshape(3, h, dh)

            def projh(i):
                return (jnp.einsum("bnd,dhe->bhne", xd, w1h[:, i])
                        + b1h[i][None, :, None, :])

            qh = headmajor_rope(headmajor_rmsnorm(projh(0), q_scale), cos, sin)
            kh = headmajor_rope(headmajor_rmsnorm(projh(1), k_scale), cos, sin)
            vh = projh(2)
            ah = dot_product_attention(
                qh, kh, vh, scale=self.qk_scale, backend=self.backend
            )
            mlp = proj(3 * d, 3 * d + mlp_hidden)
            w2 = w2_raw.astype(self.dtype)
            gmlp = nn.gelu(mlp, approximate=False)
            out32 = jax.lax.dot_general(
                ah, w2[:d].reshape(h, dh, d),
                (((1, 3), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                gmlp, w2[d:], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return out32.astype(self.dtype) + b2_raw.astype(self.dtype)

        q = proj(0, d)
        k = proj(d, 2 * d)
        v = proj(2 * d, 3 * d)
        # Opt-in (LAM_SLIDE_FUSED_MLP=1): compute the whole MLP branch in
        # the tail's VMEM-resident kernel instead — the [.., n, M] gelu
        # intermediate then never round-trips HBM (ops/fused_mlp.py).
        from lam_slide_tpu.ops import fused_mlp as fused_mlp_mod

        use_fmlp = fused_mlp_mod.use_kernel()
        mlp = None if use_fmlp else proj(3 * d, 3 * d + mlp_hidden)

        long_axis = self.attention_mode != "linear" and n > self.packed_threshold
        if long_axis and cos is not None and self.fused_temporal:
            # Experimental packed-layout attention kernel (opt-in): avoids
            # head-major copies but the per-head VMEM budget forces small
            # query blocks — measured slower than the head-major flash at
            # the 4AA shapes, kept for larger-head-dim configurations.
            from lam_slide_tpu.ops.ablations.fused_temporal_attention import (
                _reference_packed,
                fused_temporal_attention,
            )

            cos_l, sin_l = lane_rope_tables(cos, sin, h)
            qs_l = jnp.tile(q_scale, (h,))[None]
            ks_l = jnp.tile(k_scale, (h,))[None]
            if jax.default_backend() == "tpu":
                attn = fused_temporal_attention(
                    q, k, v, cos_l, sin_l, qs_l, ks_l, h, float(scale)
                )
            else:
                attn = _reference_packed(
                    q, k, v, cos_l, sin_l, qs_l, ks_l, h, float(scale), 1e-6
                )
        else:
            def to_heads(t):
                return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

            long_sdp = (self.attention_mode != "linear"
                        and n > self.packed_threshold)
            from lam_slide_tpu.ops import attention as attention_mod
            forced_backend = attention_mod.FORCE_BACKEND or os.environ.get(
                "LAM_SLIDE_ATTN_BACKEND")
            # QKNorm+RoPE fused into the flash panel loads: a measured
            # 0.92x LOSS at dh=24 (head-major entry pays the 24-lane
            # transpose pathology) but a measured 1.047x WIN at dh=128
            # (tile-aligned transposes; PERF.md round-5 dh=128 table), so
            # it is the DEFAULT exactly at dh % 128 == 0 on TPU.
            # LAM_SLIDE_KERNEL_NORMROPE=1 forces it on elsewhere (A/B);
            # LAM_SLIDE_NO_KERNEL_NORMROPE=1 vetoes the default.
            kernel_nr_default = (
                dh % 128 == 0 and jax.default_backend() == "tpu"
                and os.environ.get("LAM_SLIDE_NO_KERNEL_NORMROPE") != "1")
            kernel_nr = (long_sdp and cos is not None
                         and (os.environ.get("LAM_SLIDE_KERNEL_NORMROPE") == "1"
                              or kernel_nr_default)
                         and forced_backend != "xla")
            headmajor = (long_sdp and cos is not None and not kernel_nr
                         and os.environ.get(
                             "LAM_SLIDE_HEADMAJOR_NORMROPE") == "1")
            if kernel_nr:
                # A/B knob: QKNorm+RoPE fused INTO the flash kernel's panel
                # loads (ops/flash_normrope.py) — the raw q/k go straight
                # from the head transpose into the kernel; norm/rope never
                # touch HBM as separate passes. Same math to the same
                # rounding points (parity pinned in tests).
                from lam_slide_tpu.ops.flash_normrope import (
                    flash_attention_normrope,
                )

                qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
                ah = flash_attention_normrope(
                    qh, kh, vh, q_scale, k_scale, cos, sin,
                    scale=self.qk_scale,
                )
                attn = ah.transpose(0, 2, 1, 3).reshape(b, n, d)
            elif headmajor:
                # A/B knob: transpose the RAW q/k/v first, then QKNorm+RoPE
                # as head-major elementwise ops — the packed-layout versions
                # use segment/pair-swap matmuls that block XLA from fusing
                # them into the transpose copies, costing separate HBM
                # passes per layer. Same math to fp32 rounding
                # (tests/test_packed_attention.py pins parity).
                from lam_slide_tpu.ops.packed_attention import (
                    headmajor_rmsnorm,
                    headmajor_rope,
                )

                qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
                qh = headmajor_rope(headmajor_rmsnorm(qh, q_scale), cos, sin)
                kh = headmajor_rope(headmajor_rmsnorm(kh, k_scale), cos, sin)
                ah = dot_product_attention(
                    qh, kh, vh, scale=self.qk_scale, backend=self.backend
                )
                attn = ah.transpose(0, 2, 1, 3).reshape(b, n, d)
            else:
                q = packed_rmsnorm(q, h, q_scale)
                k = packed_rmsnorm(k, h, k_scale)
                if cos is not None:
                    cos_l, sin_l = lane_rope_tables(cos, sin, h)
                    q = packed_rope(q, cos_l, sin_l)
                    k = packed_rope(k, cos_l, sin_l)
                if self.attention_mode != "linear" and n <= self.packed_threshold:
                    attn = packed_small_attention(q, k, v, h, scale=self.qk_scale)
                elif (self.attention_mode != "linear"
                      and os.environ.get("LAM_SLIDE_NO_PACKED_FLASH") != "1"):
                    # Default long-axis path: attention consumes/produces the
                    # PACKED layout — the 4 head relayout copies per layer
                    # (3.49 ms of the 16.6 ms drift eval, docs/PERF.md) ride
                    # the flash kernel's strided block DMAs instead. Off-TPU
                    # or under a forced-xla backend this dispatches to the
                    # identical head-major composition.
                    from lam_slide_tpu.ops.attention import (
                        dot_product_attention_packed,
                    )

                    attn = dot_product_attention_packed(
                        q, k, v, h, scale=self.qk_scale, backend=self.backend
                    )
                else:
                    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
                    if self.attention_mode == "linear":
                        ah = linear_attention(qh, kh, vh)
                    else:
                        ah = dot_product_attention(
                            qh, kh, vh, scale=self.qk_scale, backend=self.backend
                        )
                    attn = ah.transpose(0, 2, 1, 3).reshape(b, n, d)

        # linear2 applied as two weight-slice dots — same math as
        # concat([attn, gelu(mlp)]) @ w2 (nn.Dense with dtype=self.dtype)
        # without materializing the [.., n, D+M] concat buffer; the f32
        # partials add before the single bf16 rounding.
        w2 = w2_raw.astype(self.dtype)
        nd = attn.ndim - 1
        out32 = jax.lax.dot_general(
            attn, w2[:d], (((nd,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if use_fmlp:
            out32 = out32 + fused_mlp_mod.fused_mlp(
                xd, w1[:, 3 * d:], b1[3 * d:], w2[d:])
        else:
            gmlp = nn.gelu(mlp, approximate=False)
            out32 = out32 + jax.lax.dot_general(
                gmlp, w2[d:], (((nd,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return out32.astype(self.dtype) + b2_raw.astype(self.dtype)


class LatentDiTLayer(nn.Module):
    """One factorized spatial+temporal AdaLN block (latent_si_v31.py:19-63)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 2.0
    attention_mode: str = "scaled_dot_product"
    backend: str = "auto"
    packed_threshold: int = 8
    reference_init: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pend_h, pend_gate, vec, sp_cos, sp_sin, tm_cos, tm_sin):
        """(x, pending residual, pending gate) -> same triple.

        The previous block's temporal residual is applied HERE, fused with
        this block's first LN+modulate (one HBM pass instead of a lone
        add pass per layer — ops/fused_adaln.py); the first layer feeds
        zeros (x + 0·0 ≡ x). The caller applies the final pending residual
        fused into the output AdaLN. Same math as the reference's
        in-layer residuals (latent_si_v31.py:45-61), regrouped.
        """
        b, t, l, d = x.shape
        mod1, mod2 = Modulation(
            dim=self.hidden_size,
            double=True,
            zero_init=self.reference_init,
            dtype=self.dtype,
            name="modulation",
        )(vec)

        common = dict(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            attention_mode=self.attention_mode,
            backend=self.backend,
            packed_threshold=self.packed_threshold,
            reference_init=self.reference_init,
            dtype=self.dtype,
        )
        spatial = ParallelMLPAttention(**common, name="spatial_block")
        temporal = ParallelMLPAttention(**common, name="temporal_block")

        from lam_slide_tpu.ops.fused_adaln import residual_adaln_modulate

        x, h = residual_adaln_modulate(x, pend_h, pend_gate,
                                       mod1.shift, mod1.scale)
        h = spatial(h.reshape(b * t, l, d), sp_cos, sp_sin).reshape(b, t, l, d)
        x, h = residual_adaln_modulate(x, h, mod1.gate, mod2.shift, mod2.scale)

        h = h.transpose(0, 2, 1, 3).reshape(b * l, t, d)
        h = temporal(h, tm_cos, tm_sin).reshape(b, l, t, d).transpose(0, 2, 1, 3)
        return x, h, mod2.gate


class _LayerScanBody(nn.Module):
    """nn.scan body: one LatentDiTLayer as (carry, broadcast...) -> (carry, None)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 2.0
    attention_mode: str = "scaled_dot_product"
    backend: str = "auto"
    packed_threshold: int = 8
    reference_init: bool = True
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, carry, vec, sp_cos, sp_sin, tm_cos, tm_sin):
        h, pend_h, pend_gate = carry
        layer_cls = nn.remat(LatentDiTLayer) if self.remat else LatentDiTLayer
        carry = layer_cls(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            attention_mode=self.attention_mode,
            backend=self.backend,
            packed_threshold=self.packed_threshold,
            reference_init=self.reference_init,
            dtype=self.dtype,
            name="layer",
        )(h, pend_h, pend_gate, vec, sp_cos, sp_sin, tm_cos, tm_sin)
        return carry, None


def stack_layer_params(params: dict, depth: int) -> dict:
    """Convert a per-layer param tree (block_0..block_{D-1}) to the
    scan_layers layout (blocks/layer/... with a leading depth axis), so
    checkpoints trained either way interoperate."""
    blocks = [params[f"block_{i}"] for i in range(depth)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)
    out = {k: v for k, v in params.items() if not k.startswith("block_")}
    out["blocks"] = {"layer": stacked}
    return out


def unstack_layer_params(params: dict, depth: int) -> dict:
    """Inverse of stack_layer_params."""
    stacked = params["blocks"]["layer"]
    out = {k: v for k, v in params.items() if k != "blocks"}
    for i in range(depth):
        out[f"block_{i}"] = jax.tree.map(lambda x: x[i], stacked)
    return out


class LatentDiT(nn.Module):
    """Conditional latent-trajectory denoiser (reference LatentSIV3).

    forward(x, t, x_cond, x_cond_mask, y=None):
      x, x_cond: [B, T, L, in_dim]; t: [B] in [0, 1];
      x_cond_mask: [B, T, L] int (1 = conditioning frame); y: [B, vec_in_dim].
    Returns [B, T, L, in_dim].

    ``scan_layers=True`` rolls the depth loop into ``nn.scan`` (stacked
    per-layer params, leading depth axis): the traced HLO carries ONE layer
    body instead of ``depth`` copies, which keeps compile times sane for
    programs that inline the model many times — the dopri5 sampler's RK45
    body holds 6 drift evaluations, i.e. 6·depth inlined layers without it.
    Same math as the unrolled loop (parity-tested via stack_layer_params).
    """

    depth: int
    in_dim: int
    hidden_size: int
    num_heads: int
    vec_in_dim: Optional[int] = None
    mlp_ratio: float = 2.0
    n_timesteps: int = 10
    theta: float = 10_000.0
    checkpointing: bool = False
    normalize: bool = False
    attention_mode: str = "scaled_dot_product"
    share_weights: bool = False
    scan_layers: bool = False
    reference_init: bool = True
    backend: str = "auto"
    packed_threshold: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        x_cond: jnp.ndarray,
        x_cond_mask: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if self.hidden_size % self.num_heads != 0:
            raise ValueError(
                f"hidden_size {self.hidden_size} not divisible by num_heads {self.num_heads}"
            )
        b, t_len, l_len, _ = x.shape
        d = self.hidden_size
        kinit = inits.attn_kernel_init if self.reference_init else torch_linear_init

        x = x.astype(self.dtype)
        h = (
            nn.Dense(d, kernel_init=kinit, dtype=self.dtype, name="x_in")(x)
            + nn.Dense(d, kernel_init=kinit, dtype=self.dtype, name="cond_to_emb")(
                x_cond.astype(self.dtype)
            )
            + nn.Embed(
                2, d, embedding_init=nn.initializers.normal(stddev=1.0), dtype=self.dtype,
                name="mask_to_emb",
            )(x_cond_mask.astype(jnp.int32))
        )
        if self.normalize:
            h = layer_norm(h, eps=1e-5)

        vec = MLPEmbedder(hidden_dim=d, dtype=self.dtype, name="time_in")(
            timestep_embedding(t, 256).astype(self.dtype)
        )
        if y is not None:
            if self.vec_in_dim is None:
                raise ValueError("y given but vec_in_dim not configured")
            vec = vec + MLPEmbedder(hidden_dim=d, dtype=self.dtype, name="vec_in")(
                y.astype(self.dtype)
            )

        pe_dim = d // self.num_heads
        sp_cos, sp_sin = rope_cos_sin(l_len, pe_dim, self.theta)
        tm_cos, tm_sin = rope_cos_sin(t_len, pe_dim, self.theta)

        layer_kwargs = dict(
            hidden_size=d,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            attention_mode=self.attention_mode,
            backend=self.backend,
            packed_threshold=self.packed_threshold,
            reference_init=self.reference_init,
            dtype=self.dtype,
        )
        # Residuals ride the carry: each block applies the PREVIOUS block's
        # temporal residual fused with its first LN+modulate; the first
        # block gets exact zeros (x + 0·0 ≡ x) so the scan carry keeps a
        # fixed structure.
        pend_h = jnp.zeros_like(h)
        # Must match the layer's output dtype: nn.scan requires carry-in and
        # carry-out components to agree, and the layer emits gates in
        # self.dtype (bf16 for the production stage-2 configs).
        pend_gate = jnp.zeros((b, 1, 1, d), self.dtype)
        layer_cls = nn.remat(LatentDiTLayer) if self.checkpointing else LatentDiTLayer
        if self.scan_layers and not self.share_weights:
            scan = nn.scan(
                _LayerScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast,) * 5,
                length=self.depth,
            )
            (h, pend_h, pend_gate), _ = scan(
                **layer_kwargs, remat=self.checkpointing, name="blocks")(
                (h, pend_h, pend_gate), vec, sp_cos, sp_sin, tm_cos, tm_sin
            )
        else:
            if self.share_weights:
                block = layer_cls(**layer_kwargs, name="block_shared")
                blocks = [block] * self.depth
            else:
                blocks = [
                    layer_cls(**layer_kwargs, name=f"block_{i}")
                    for i in range(self.depth)
                ]
            for block in blocks:
                h, pend_h, pend_gate = block(
                    h, pend_h, pend_gate, vec, sp_cos, sp_sin, tm_cos, tm_sin)

        # Final AdaLN + zero-init projection (latent_si_v31.py:119-124,185-187),
        # with the last block's temporal residual fused in.
        mod = nn.Dense(
            2 * d,
            kernel_init=inits.attn_kernel_init if self.reference_init else torch_linear_init,
            dtype=self.dtype,
            name="adaLN_out",
        )(nn.silu(vec))
        shift, scale = jnp.split(mod[:, None, None, :], 2, axis=-1)
        from lam_slide_tpu.ops.fused_adaln import residual_adaln_modulate

        _, h = residual_adaln_modulate(h, pend_h, pend_gate, shift, scale)
        out_kinit = inits.zeros if self.reference_init else torch_linear_init
        return nn.Dense(
            self.in_dim, kernel_init=out_kinit, bias_init=inits.zeros, dtype=self.dtype,
            name="linear_out",
        )(h).astype(jnp.float32)
