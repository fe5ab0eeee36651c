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


def _flash_kernel(q_ref, k_ref, v_ref, *rest, scale, block_k, seq_len, has_bias):
    """One (bh, q-block) program: iterate key blocks with running softmax.

    q_ref: [1, block_q, d]; k_ref/v_ref: [1, padded_n, d];
    bias_ref (only when ``has_bias``): [1, 1, padded_n]; o_ref: [1, block_q, d].

    Numerics: matmuls take the input dtype (bf16 in production) with fp32
    MXU accumulation (``preferred_element_type``); logits, softmax statistics
    and the output accumulator are fp32; attention weights are cast to the
    value dtype for the AV matmul — matching ops.attention.xla_attention
    (which also runs ``softmax(fp32).astype(v.dtype) @ v``).

    VPU economy: the padding-key mask is applied only to the final key block
    and only when the sequence was actually padded, and the bias row is an
    input (and an add pass over the logits) only when a mask was supplied —
    each avoided pass is a full [block_q, block_k] fp32 op per program,
    ~20% of kernel time at the DiT's temporal shapes.
    """
    bias_ref = rest[0] if has_bias else None
    o_ref = rest[-1]
    _, block_q, d = q_ref.shape
    padded_n = k_ref.shape[1]
    num_kb = padded_n // block_k
    v_dtype = v_ref.dtype

    q = q_ref[0]

    def logits(kb, masked):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [block_q, block_k] fp32
        if masked:  # padding keys (>= seq_len) get -inf logits
            key_idx = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(key_idx < seq_len, s, _NEG_INF)
        if has_bias:
            s = s + bias_ref[0, 0, pl.ds(kb * block_k, block_k)][None, :]
        return s

    def av(p, kb):
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        return jax.lax.dot_general(
            p.astype(v_dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if num_kb == 1:
        # Whole key axis in one block (the factorized-DiT common case):
        # plain fp32 softmax, no running-statistics machinery.
        s = logits(0, masked=padded_n != seq_len)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0] = (av(p, 0) / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        return

    def step(kb, carry, masked):
        m_prev, l_prev, acc = carry
        s = logits(kb, masked)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + av(p, kb)
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    # Only the last key block can contain sequence padding: run the clean
    # blocks without the iota/where pass, then the final block with it.
    full_kb = num_kb if padded_n == seq_len else num_kb - 1
    carry = jax.lax.fori_loop(
        0, full_kb, lambda kb, c: step(kb, c, masked=False), (m0, l0, acc0)
    )
    if full_kb != num_kb:
        carry = step(num_kb - 1, carry, masked=True)
    _, l, acc = carry
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_forward(q, k, v, bias, scale, block_q=1024, block_k=1024):
    """q,k,v: [B, H, N, D]; bias: [B, Nk] additive fp32 or None. -> [B, H, N, D].

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
    has_bias = bias is not None
    operands = [qp, kp, vp]
    in_specs = [
        pl.BlockSpec((1, block_q, dp), lambda bh, i: (bh, i, 0)),
        pl.BlockSpec((1, pk, dp), lambda bh, i: (bh, 0, 0)),
        pl.BlockSpec((1, pk, dp), lambda bh, i: (bh, 0, 0)),
    ]
    if has_bias:
        operands.append(jnp.pad(bias, ((0, 0), (0, pk - nk)))[:, None, :])  # [B, 1, pk]
        in_specs.append(pl.BlockSpec((1, 1, pk), lambda bh, i: (bh // h, 0, 0)))

    grid = (b * h, pq // block_q)
    # CPU (tests, virtual meshes): run the kernel through the interpreter —
    # same program, python-speed; the compiled path needs a real TPU.
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_k=block_k, seq_len=nk, has_bias=has_bias
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, pq, dp), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, dp), lambda bh, i: (bh, i, 0)),
        interpret=interpret,
    )(*operands)
    return out.reshape(b, h, pq, dp)[:, :, :nq, :d]


def _mask_to_bias(mask: Optional[jnp.ndarray], b: int, nk: int) -> Optional[jnp.ndarray]:
    if mask is None:
        return None  # statically drops the bias input + add pass in the kernel
    if mask.ndim != 2:
        raise ValueError("flash_attention supports key-padding masks [B, Nk] only")
    return jnp.where(mask, 0.0, _NEG_INF).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention_core(q, k, v, bias, scale):
    return _flash_forward(q, k, v, bias, scale)


def _xla_attention_with_bias(q, k, v, bias, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias[:, None, None, :]
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
        qc, kc, vc, gc = args[0], args[1], args[2], args[-1]
        biasc = args[3] if len(args) == 5 else None
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_attention_with_bias(q_, k_, v_, biasc, scale),
            qc, kc, vc,
        )
        return vjp(gc)

    operands = (q, k, v, g) if bias is None else (q, k, v, bias, g)
    if chunk >= b:
        dq, dk, dv = chunk_vjp(operands)
        return dq, dk, dv, None

    pad = (-b) % chunk
    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)
        return x.reshape(-1, chunk, *x.shape[1:])

    dq, dk, dv = jax.lax.map(chunk_vjp, tuple(prep(x) for x in operands))
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
