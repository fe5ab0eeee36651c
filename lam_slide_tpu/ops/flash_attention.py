"""Pallas TPU flash attention.

Tiled attention for the factorized DiT axes (SURVEY.md §3.5): grid over
(batch·heads, query blocks), inner fori_loop over key blocks with the
standard running-softmax (m, l, acc) recurrence — the score matrix never
materializes in HBM. Head dim is zero-padded to the 128-lane width; the
sequence is zero-padded to the block size and guarded with an in-kernel
iota mask (padding keys contribute -inf logits). Optional key-padding mask
arrives as an additive fp32 bias row per batch.

Differentiation: the public ``flash_attention`` carries a custom VJP whose
backward recomputes attention gradients through the XLA einsum path — same
math, so training uses it transparently; the Pallas kernel accelerates the
forward-heavy paths (ODE/SDE sampling, eval) where no gradients flow.

Numerics: logits and softmax statistics in fp32 regardless of input dtype
(bf16 in production), matching ops.attention.xla_attention.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, block_k, seq_len):
    """One (bh, q-block) program: iterate key blocks with running softmax.

    q_ref: [1, block_q, d]; k_ref/v_ref: [1, padded_n, d];
    bias_ref: [1, padded_n]; o_ref: [1, block_q, d].
    """
    _, block_q, d = q_ref.shape
    padded_n = k_ref.shape[1]
    num_kb = padded_n // block_k

    q = q_ref[0].astype(jnp.float32) * scale

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_q, block_k]
        # additive mask: padding keys (>= seq_len) and user bias
        key_idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(key_idx < seq_len, s, _NEG_INF)
        s = s + bias_ref[0, 0, pl.ds(kb * block_k, block_k)][None, :]

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_forward(q, k, v, bias, scale, block_q=1024, block_k=1024):
    """q,k,v: [B, H, N, D]; bias: [B, Nk] additive fp32. -> [B, H, N, D].

    block_q defaults high: each (bh, q-block) program re-reads the full K/V
    panel, so fewer q-blocks = less HBM traffic; VMEM stays comfortable up
    to ~2k q rows at d≤128. The head dim is NOT padded to 128 — full-dim
    blocks satisfy Mosaic's tiling rule and skip the 5x padding traffic the
    DiT's dh=24 heads would otherwise pay.
    """
    b, h, nq, d = q.shape
    nk = k.shape[2]
    # Full-dim blocks satisfy Mosaic's tiling rule even at odd lengths, so
    # when the whole axis fits one block we skip sequence padding entirely —
    # profiled ~0.8ms per padded tensor per layer otherwise.
    if nq <= block_q:
        block_q, pq = nq, nq
    else:
        block_q = min(block_q, _round_up(nq, 128))
        pq = _round_up(nq, block_q)
    if nk <= block_k:
        block_k, pk = nk, nk
    else:
        block_k = min(block_k, _round_up(nk, 128))
        pk = _round_up(nk, block_k)
    dp = d if d % 2 == 0 else d + 1  # keep lane pairs even; no 128 padding

    def prep(t, pn):
        if pn == t.shape[2] and dp == d:
            return t.reshape(b * h, pn, d)
        return jnp.pad(t, ((0, 0), (0, 0), (0, pn - t.shape[2]), (0, dp - d))).reshape(
            b * h, pn, dp
        )

    qp = prep(q, pq)
    kp = prep(k, pk)
    vp = prep(v, pk)
    biasp = jnp.pad(bias, ((0, 0), (0, pk - nk)))[:, None, :]  # [B, 1, pk]

    grid = (b * h, pq // block_q)
    # CPU (tests, virtual meshes): run the kernel through the interpreter —
    # same program, python-speed; the compiled path needs a real TPU.
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k, seq_len=nk),
        out_shape=jax.ShapeDtypeStruct((b * h, pq, dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, pk, dp), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, pk, dp), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, 1, pk), lambda bh, i: (bh // h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda bh, i: (bh, i, 0)),
        interpret=interpret,
    )(qp, kp, vp, biasp)
    return out.reshape(b, h, pq, dp)[:, :, :nq, :d]


def _mask_to_bias(mask: Optional[jnp.ndarray], b: int, nk: int) -> jnp.ndarray:
    if mask is None:
        return jnp.zeros((b, nk), jnp.float32)
    if mask.ndim != 2:
        raise ValueError("flash_attention supports key-padding masks [B, Nk] only")
    return jnp.where(mask, 0.0, _NEG_INF).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention_core(q, k, v, bias, scale):
    return _flash_forward(q, k, v, bias, scale)


def _xla_attention_with_bias(q, k, v, bias, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale + bias[:, None, None, :]
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def _core_fwd(q, k, v, bias, scale):
    return _flash_forward(q, k, v, bias, scale), (q, k, v, bias)


# Backward recompute materializes [chunk, H, Nq, Nk] fp32 logits; cap that
# buffer by splitting the batch axis — a full-size MD17 stage-2 step
# (B'=1920, N=192) otherwise needs >16 GB of HBM for the logits alone.
# The cap is generous (~2 GB) because chunking itself costs real time:
# lax.map lowers to while + dynamic-update-slice (~230 ms on the peptide
# stage-2 step when it split into just two chunks).
_BWD_LOGITS_BUDGET = 2**29  # fp32 elements per chunk (~2 GB)


def _core_bwd(scale, res, g):
    q, k, v, bias = res
    b, h, nq, _ = q.shape
    nk = k.shape[2]
    per_item = h * nq * nk
    chunk = max(1, min(b, _BWD_LOGITS_BUDGET // max(per_item, 1)))

    def chunk_vjp(args):
        qc, kc, vc, biasc, gc = args
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_attention_with_bias(q_, k_, v_, biasc, scale),
            qc, kc, vc,
        )
        return vjp(gc)

    if chunk >= b:
        dq, dk, dv = chunk_vjp((q, k, v, bias, g))
        return dq, dk, dv, None

    pad = (-b) % chunk
    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)
        return x.reshape(-1, chunk, *x.shape[1:])

    dq, dk, dv = jax.lax.map(chunk_vjp, tuple(prep(x) for x in (q, k, v, bias, g)))
    unprep = lambda x, ref: x.reshape(-1, *ref.shape[1:])[:b]
    return unprep(dq, q), unprep(dk, k), unprep(dv, v), None


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Drop-in for ops.attention.xla_attention (same shapes/mask semantics)."""
    d = q.shape[-1]
    scale = float(d**-0.5 if scale is None else scale)
    bias = _mask_to_bias(mask, q.shape[0], k.shape[2])
    return _flash_attention_core(q, k, v, bias, scale)
