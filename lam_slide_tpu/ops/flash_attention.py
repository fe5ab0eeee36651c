"""Pallas TPU flash attention.

Tiled attention for the factorized DiT axes (SURVEY.md §3.5): grid over
(batch·heads, query blocks), inner fori_loop over key blocks with the
standard running-softmax (m, l, acc) recurrence — the score matrix never
materializes in HBM. Head dim is zero-padded to the 128-lane width; the
sequence is zero-padded to the block size and guarded with an in-kernel
iota mask (padding keys contribute -inf logits). Optional key-padding mask
arrives as an additive fp32 bias row per batch.

Differentiation: the public ``flash_attention`` carries a custom VJP. On
TPU the backward runs FlashAttention-2-style Pallas kernels — the forward
saves the per-row log-sum-exp, ``delta = rowsum(dO ⊙ O)`` is computed in
XLA, then a (bh, k-block) kernel accumulates dK/dV over query blocks and a
(bh, q-block) kernel accumulates dQ over key blocks, all recomputing
probabilities tile-by-tile so nothing O(Nq·Nk) ever reaches HBM (full-size
4AA stage-2 train step: 299 ms → 232 ms, and remat-free fits HBM at
200 ms). Off-TPU (tests, virtual meshes) the backward falls back to a
batch-chunked XLA einsum recompute of identical math;
``LAM_SLIDE_NO_FLASH_BWD=1`` forces that path for A/B debugging.

Numerics: logits and softmax statistics in fp32 regardless of input dtype
(bf16 in production), matching ops.attention.xla_attention.
"""

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_kernel(q_ref, k_ref, v_ref, *rest, scale, block_k, seq_len, has_bias,
                  with_lse=False, packed=False):
    """One (bh, q-block) program: iterate key blocks with running softmax.

    q_ref: [1, block_q, d]; k_ref/v_ref: [1, padded_n, d];
    bias_ref (only when ``has_bias``): [1, 1, padded_n]; o_ref: [1, block_q, d].

    ``packed=True``: q/k/v/o refs carry a singleton head axis —
    [1, block_q, 1, d] / [1, padded_n, 1, d] — because the HBM arrays stay
    in the packed [B, N, H, d] layout and each program's BlockSpec picks its
    head via a strided DMA (see ``_flash_forward_packed``). Identical math.

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
    o_ref = rest[1] if (has_bias and with_lse) else (rest[0] if with_lse else rest[-1])
    lse_ref = rest[-1] if with_lse else None
    if packed:
        _, block_q, _, d = q_ref.shape
        q = q_ref[0, :, 0, :]
        k_blk = lambda lo, n: k_ref[0, pl.ds(lo, n), 0, :]
        v_blk = lambda lo, n: v_ref[0, pl.ds(lo, n), 0, :]
        store = lambda o: o_ref.__setitem__((0, slice(None), 0, slice(None)), o)
    else:
        _, block_q, d = q_ref.shape
        q = q_ref[0]
        k_blk = lambda lo, n: k_ref[0, pl.ds(lo, n), :]
        v_blk = lambda lo, n: v_ref[0, pl.ds(lo, n), :]
        store = lambda o: o_ref.__setitem__((0,), o)
    padded_n = k_ref.shape[1]
    num_kb = padded_n // block_k
    v_dtype = v_ref.dtype

    def logits(kb, masked):
        k = k_blk(kb * block_k, block_k)
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
        v = v_blk(kb * block_k, block_k)
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
        store((av(p, 0) / jnp.maximum(l, 1e-30)).astype(o_ref.dtype))
        if with_lse:
            lse_ref[0] = m + jnp.log(jnp.maximum(l, 1e-30))
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
    m, l, acc = carry
    store((acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype))
    if with_lse:
        lse_ref[0] = m + jnp.log(jnp.maximum(l, 1e-30))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "with_lse")
)
def _flash_forward(q, k, v, bias, scale, block_q=1024, block_k=1024,
                   with_lse=False):
    """q,k,v: [B, H, N, D]; bias: [B, Nk] additive fp32 or None. -> [B, H, N, D]
    (plus, when ``with_lse``, the per-row log-sum-exp [B, H, N] fp32 the
    backward kernels need to reconstruct attention weights).

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
    out_shape = jax.ShapeDtypeStruct((b * h, pq, dp), q.dtype)
    out_specs = pl.BlockSpec((1, block_q, dp), lambda bh, i: (bh, i, 0))
    if with_lse:
        out_shape = [out_shape, jax.ShapeDtypeStruct((b * h, pq, 1), jnp.float32)]
        out_specs = [out_specs, pl.BlockSpec((1, block_q, 1), lambda bh, i: (bh, i, 0))]
    res = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_k=block_k, seq_len=nk,
            has_bias=has_bias, with_lse=with_lse,
        ),
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*operands)
    if with_lse:
        out, lse = res
        return (out.reshape(b, h, pq, dp)[:, :, :nq, :d],
                lse.reshape(b, h, pq)[:, :, :nq])
    return res.reshape(b, h, pq, dp)[:, :, :nq, :d]


_PACKED_GROUP = 8  # DMA slices on the head axis must be 8-aligned (sublane tiling)


def _packed_manual_kernel(q_hbm, k_hbm, v_hbm, o_hbm, qb, kb, vb, ob,
                          sem_in, sem_out, *, scale, num_heads, with_lse,
                          lse_hbm=None, lseb=None):
    """Whole-panel packed-layout attention with hand-rolled DMA pipelining.

    The operands stay in HBM in the packed [B, N, H, dh] layout; a
    double-buffered loop over (batch, 8-head-group) pairs issues strided
    group-panel DMAs (``.at[b, :, g*8:(g+1)*8, :]`` — the head axis is
    sliced in sublane-aligned groups of 8, each HBM row fragment 8·dh wide)
    for iteration i+1 while the MXU/VPU computes iteration i. The
    head-major relayout never exists as a standalone copy pass: its HBM
    traffic hides under the attention compute, and the per-head extraction
    happens on registers in VMEM. Mosaic's BlockSpec pipeline cannot express
    this (a (1, N, 1, dh) block violates the minor-two-dims tiling rule, and
    per-head DMA slices violate the 8-sublane alignment), hence the manual
    ``make_async_copy`` orchestration.

    Softmax numerics are identical to ``_flash_kernel``'s single-key-block
    branch: fp32 logits/statistics, weights cast to the value dtype for AV.
    Restrictions (callers fall back to the head-major path otherwise):
    whole key panel per iteration (no key blocking), no bias row, and
    H % 8 == 0.
    """
    from jax.experimental.pallas import tpu as pltpu

    b, n, h, d = q_hbm.shape
    nk = k_hbm.shape[1]
    g = _PACKED_GROUP
    ng = h // g
    nit = b * ng  # (batch, head-group) iterations
    v_dtype = v_hbm.dtype

    def in_dma(i, slot, buf, hbm):
        bi, gi = i // ng, i % ng
        return pltpu.make_async_copy(
            hbm.at[bi, :, pl.ds(gi * g, g), :], buf.at[slot], sem_in.at[slot])

    def out_dma(i, slot):
        bi, gi = i // ng, i % ng
        return pltpu.make_async_copy(
            ob.at[slot], o_hbm.at[bi, :, pl.ds(gi * g, g), :],
            sem_out.at[slot])

    def lse_dma(i, slot):
        bi, gi = i // ng, i % ng
        return pltpu.make_async_copy(
            lseb.at[slot], lse_hbm.at[bi, pl.ds(gi * g, g), :, :],
            sem_out.at[2 + slot])

    def start_inputs(i, slot):
        in_dma(i, slot, qb, q_hbm).start()
        in_dma(i, slot, kb, k_hbm).start()
        in_dma(i, slot, vb, v_hbm).start()

    start_inputs(0, 0)

    def body(i, carry):
        slot = i % 2
        nxt = (i + 1) % 2

        @pl.when(i + 1 < nit)
        def _():
            # the nxt buffers were last read by compute at iteration i-1,
            # which has already completed (compute is in-order)
            start_inputs(i + 1, nxt)

        in_dma(i, slot, qb, q_hbm).wait()
        in_dma(i, slot, kb, k_hbm).wait()
        in_dma(i, slot, vb, v_hbm).wait()

        @pl.when(i >= 2)
        def _():
            # this slot's previous output DMA must drain before overwriting
            out_dma(i - 2, slot).wait()
            if with_lse:
                lse_dma(i - 2, slot).wait()

        # [N, G, dh] group panels -> per-head [N, dh] via static slicing
        qg, kg, vg = qb[slot], kb[slot], vb[slot]
        outs, lses = [], []
        for hh in range(g):
            q = qg[:, hh, :]
            s = jax.lax.dot_general(
                q, kg[:, hh, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [n, nk] fp32
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            acc = jax.lax.dot_general(
                p.astype(v_dtype), vg[:, hh, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append((acc / jnp.maximum(l, 1e-30))[:, None, :])
            if with_lse:
                lses.append((m + jnp.log(jnp.maximum(l, 1e-30)))[None, :, :])
        ob[slot] = jnp.concatenate(outs, axis=1).astype(ob.dtype)
        out_dma(i, slot).start()
        if with_lse:
            lseb[slot] = jnp.concatenate(lses, axis=0)
            lse_dma(i, slot).start()
        return carry

    jax.lax.fori_loop(0, nit, body, 0)
    # drain the last two output DMAs
    out_dma(nit - 1, (nit - 1) % 2).wait()

    @pl.when(jnp.asarray(nit > 1))
    def _():
        out_dma(nit - 2, (nit - 2) % 2).wait()
    if with_lse:
        lse_dma(nit - 1, (nit - 1) % 2).wait()

        @pl.when(jnp.asarray(nit > 1))
        def _():
            lse_dma(nit - 2, (nit - 2) % 2).wait()


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "with_lse")
)
def _flash_forward_packed(q, k, v, num_heads, scale, with_lse=False):
    """Packed-layout flash forward: q, k, v [B, N, H·dh] -> [B, N, H·dh].

    Dispatches the manual-DMA whole-panel kernel (``_packed_manual_kernel``)
    over the packed [B, N, H, dh] view — no head-major relayout copies, the
    strided panel loads ride double-buffered DMAs under the compute. At the
    DiT temporal shapes those 4 relayout copies per layer (q/k/v in, out
    back) were 3.49 ms of the 16.6 ms drift eval (docs/PERF.md).
    """
    from jax.experimental.pallas import tpu as pltpu

    b, nq, d_all = q.shape
    h = num_heads
    d = d_all // h
    nk = k.shape[1]
    q4 = q.reshape(b, nq, h, d)
    k4 = k.reshape(b, nk, h, d)
    v4 = v.reshape(b, nk, h, d)

    grp = _PACKED_GROUP
    out_shapes = [jax.ShapeDtypeStruct((b, nq, h, d), q.dtype)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    scratch = [
        pltpu.VMEM((2, nq, grp, d), q.dtype),   # q group slots
        pltpu.VMEM((2, nk, grp, d), k.dtype),   # k group slots
        pltpu.VMEM((2, nk, grp, d), v.dtype),   # v group slots
        pltpu.VMEM((2, nq, grp, d), q.dtype),   # out group slots
        pltpu.SemaphoreType.DMA((2,)),     # input sems (one per slot)
        pltpu.SemaphoreType.DMA((4,)),     # output sems (out + lse per slot)
    ]
    kwargs = dict(scale=scale, num_heads=h, with_lse=with_lse)
    if with_lse:
        out_shapes.append(jax.ShapeDtypeStruct((b, h, nq, 1), jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        # lse slots sit before the semaphores (kernel signature order)
        scratch.insert(4, pltpu.VMEM((2, grp, nq, 1), jnp.float32))

        def kernel(q_hbm, k_hbm, v_hbm, o_hbm, lse_hbm, qb, kb, vb, ob,
                   lseb, sem_in, sem_out):
            _packed_manual_kernel(q_hbm, k_hbm, v_hbm, o_hbm, qb, kb, vb, ob,
                                  sem_in, sem_out, lse_hbm=lse_hbm, lseb=lseb,
                                  **kwargs)
    else:
        def kernel(q_hbm, k_hbm, v_hbm, o_hbm, qb, kb, vb, ob, sem_in,
                   sem_out):
            _packed_manual_kernel(q_hbm, k_hbm, v_hbm, o_hbm, qb, kb, vb, ob,
                                  sem_in, sem_out, **kwargs)

    res = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=jax.default_backend() != "tpu",
    )(q4, k4, v4)
    out = res[0].reshape(b, nq, d_all)
    if with_lse:
        return out, res[1].reshape(b, h, nq)
    return out


def _bwd_probs(q_blk, k_blk, lse_blk, bias_ref, kb, block_k, seq_len, scale,
               has_bias, masked, single_kb=False):
    """Recompute the [bq, bk] attention weights of one tile, fp32.

    q_blk/k_blk in input dtype (bf16 matmul, fp32 accumulation); lse_blk
    [bq, 1] fp32. Mirrors the forward logits exactly (scale, key-padding
    mask on the final block only, optional bias row).

    ``single_kb``: the k grid has exactly one block, so the bias row is
    loaded whole. This is a Mosaic requirement, not an optimization: with a
    dynamic ``kb`` (program id / fori index) the lane offset ``kb*block_k``
    of a partial load is only provably 128-aligned when block_k % 128 == 0,
    which single-block panels (block_k = nk, e.g. the encoder's 32 keys)
    violate — "cannot statically prove that index in dimension 2 is a
    multiple of 128" at md17 stage-1 shapes, caught by the round-3
    convergence run.
    """
    s = jax.lax.dot_general(
        q_blk, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if masked:
        key_idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_idx < seq_len, s, _NEG_INF)
    if has_bias:
        if single_kb:
            s = s + bias_ref[0, 0, :][None, :]
        else:  # multi-block grids have block_k % 128 == 0 (see _flash_backward)
            s = s + bias_ref[0, 0, pl.ds(kb * block_k, block_k)][None, :]
    return jnp.exp(s - lse_blk)


def _flash_bwd_kv_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, *rest,
                         scale, block_q, seq_len, has_bias, masked,
                         single_kb=False):
    """One (bh, k-block) program: accumulate dK, dV over all query blocks.

    q/do_ref: [1, pq, d]; lse/delta_ref: [1, pq, 1] fp32; k/v_ref:
    [1, block_k, d]; outputs dk/dv [1, block_k, d].
    dV = P^T dO;  dS = P ⊙ (dO V^T − delta) · scale;  dK = dS^T Q.
    """
    bias_ref = rest[0] if has_bias else None
    dk_ref, dv_ref = rest[-2], rest[-1]
    _, pq, d = q_ref.shape
    _, block_k, _ = k_ref.shape
    kb = pl.program_id(1)
    num_qb = pq // block_q
    dtype = v_ref.dtype
    k = k_ref[0]
    v = v_ref[0]
    # this program's k block is the grid's second axis — the key-padding mask
    # matters only when it covers padded keys (decided per-tile below)

    def body(qb, carry):
        dk, dv = carry
        q_blk = q_ref[0, pl.ds(qb * block_q, block_q), :]
        do_blk = do_ref[0, pl.ds(qb * block_q, block_q), :]
        lse_blk = lse_ref[0, pl.ds(qb * block_q, block_q), :]
        delta_blk = delta_ref[0, pl.ds(qb * block_q, block_q), :]
        p = _bwd_probs(q_blk, k, lse_blk, bias_ref, kb, block_k, seq_len,
                       scale, has_bias, masked=masked, single_kb=single_kb)
        pb = p.astype(dtype)
        dv = dv + jax.lax.dot_general(
            pb, do_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do_blk, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta_blk) * scale).astype(dtype)
        dk = dk + jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd_q_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, *rest,
                        scale, block_k, seq_len, has_bias, single_kb=False):
    """One (bh, q-block) program: accumulate dQ over all key blocks.

    q/do_ref: [1, block_q, d]; lse/delta_ref: [1, block_q, 1]; k/v_ref:
    [1, pk, d]; output dq [1, block_q, d].  dQ = dS K.
    """
    bias_ref = rest[0] if has_bias else None
    dq_ref = rest[-1]
    _, block_q, d = q_ref.shape
    pk = k_ref.shape[1]
    num_kb = pk // block_k
    dtype = v_ref.dtype
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]
    delta = delta_ref[0]

    def step(kb, dq, masked):
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        p = _bwd_probs(q, k_blk, lse, bias_ref, kb, block_k, seq_len,
                       scale, has_bias, masked=masked, single_kb=single_kb)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta) * scale).astype(dtype)
        return dq + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    full_kb = num_kb if pk == seq_len else num_kb - 1
    dq = jax.lax.fori_loop(
        0, full_kb, lambda kb, c: step(kb, c, masked=False),
        jnp.zeros((block_q, d), jnp.float32),
    )
    if full_kb != num_kb:
        dq = step(num_kb - 1, dq, masked=True)
    dq_ref[0] = dq.astype(dq_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k")
)
def _flash_backward(q, k, v, bias, out, lse, g, scale, block_q=512, block_k=512):
    """Pallas flash backward: -> (dq, dk, dv), input dtypes.

    Standard FlashAttention-2 recomputation: delta = rowsum(dO ⊙ O) in XLA,
    then a (bh, k-block) kernel for dK/dV and a (bh, q-block) kernel for dQ.
    Peak memory is O(block_q · block_k) per program instead of the
    O(B·H·Nq·Nk) logits the XLA-recompute path materializes.
    """
    b, h, nq, d = q.shape
    nk = k.shape[2]
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

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
    dp_ = d if d % 2 == 0 else d + 1

    def prep(t, pn):
        if pn == t.shape[2] and dp_ == d:
            return t.reshape(b * h, pn, d)
        return jnp.pad(t, ((0, 0), (0, 0), (0, pn - t.shape[2]), (0, dp_ - d))).reshape(
            b * h, pn, dp_
        )

    def prep_rows(t, pn):  # [B, H, N] fp32 -> [BH, pn, 1]
        if pn != t.shape[2]:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, pn - t.shape[2])))
        return t.reshape(b * h, pn, 1)

    qp, dop = prep(q, pq), prep(g.astype(q.dtype), pq)
    kp, vp = prep(k, pk), prep(v, pk)
    lsep, deltap = prep_rows(lse, pq), prep_rows(delta, pq)

    has_bias = bias is not None
    bias_ops, bias_specs = [], []
    if has_bias:
        bias_ops = [jnp.pad(bias, ((0, 0), (0, pk - nk)))[:, None, :]]
        bias_specs = [pl.BlockSpec((1, 1, pk), lambda bh, i: (bh // h, 0, 0))]

    interpret = jax.default_backend() != "tpu"
    common = dict(scale=scale, seq_len=nk, has_bias=has_bias,
                  single_kb=pk // block_k == 1)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kv_kernel, block_q=block_q,
                          masked=pk != nk, **common),
        out_shape=[jax.ShapeDtypeStruct((b * h, pk, dp_), k.dtype)] * 2,
        grid=(b * h, pk // block_k),
        in_specs=[
            pl.BlockSpec((1, pq, dp_), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, pq, dp_), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, pq, 1), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, pq, 1), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, block_k, dp_), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, block_k, dp_), lambda bh, i: (bh, i, 0)),
            *bias_specs,
        ],
        out_specs=[pl.BlockSpec((1, block_k, dp_), lambda bh, i: (bh, i, 0))] * 2,
        interpret=interpret,
    )(qp, dop, lsep, deltap, kp, vp, *bias_ops)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_q_kernel, block_k=block_k, **common),
        out_shape=jax.ShapeDtypeStruct((b * h, pq, dp_), q.dtype),
        grid=(b * h, pq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dp_), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, block_q, dp_), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, pk, dp_), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, pk, dp_), lambda bh, i: (bh, 0, 0)),
            *bias_specs,
        ],
        out_specs=pl.BlockSpec((1, block_q, dp_), lambda bh, i: (bh, i, 0)),
        interpret=interpret,
    )(qp, dop, lsep, deltap, kp, vp, *bias_ops)

    unpad = lambda t, n: t.reshape(b, h, -1, dp_)[:, :, :n, :d]
    return unpad(dq, nq), unpad(dk, nk), unpad(dv, nk)


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
    out, lse = _flash_forward(q, k, v, bias, scale, with_lse=True)
    return out, (q, k, v, bias, out, lse)


# Fallback XLA-recompute backward (CPU/virtual meshes, or shapes the Pallas
# kernels decline): materializes [chunk, H, Nq, Nk] fp32 logits; cap that
# buffer by splitting the batch axis — a full-size MD17 stage-2 step
# (B'=1920, N=192) otherwise needs >16 GB of HBM for the logits alone.
# The cap is generous (~2 GB) because chunking itself costs real time:
# lax.map lowers to while + dynamic-update-slice (~230 ms on the peptide
# stage-2 step when it split into just two chunks).
_BWD_LOGITS_BUDGET = 2**29  # fp32 elements per chunk (~2 GB)

# Pallas backward keeps the FULL query panel (q + dO, input dtype) plus the
# lse/delta rows in VMEM per (bh, k-block) program — bound the panel size.
_BWD_MAX_PANEL = 1 << 22  # elements (e.g. 16k rows x 128 lanes x 2 tensors)


def _core_bwd(scale, res, g):
    q, k, v, bias, out, lse = res
    b, h, nq, d = q.shape
    nk = k.shape[2]

    on_tpu = jax.default_backend() == "tpu"
    panel = max(nq, nk) * (d + (d % 2))
    use_pallas = (
        on_tpu
        and 2 * panel <= _BWD_MAX_PANEL
        and os.environ.get("LAM_SLIDE_NO_FLASH_BWD") != "1"  # debug/A-B knob
    )
    # The short-N/huge-grid regime (MD17's spatial axis: bh=30720, N=192)
    # was suspected of pathological Mosaic compile times and routed to the
    # chunked path in round 1; measured on-chip 2026-08-17
    # (tools/measure_md17_bwd.py): the tiled kernels compile in 0.8 s at
    # that exact grid and win steady-state (72.4 ms vs 77.7 ms chunked), so
    # the tiled backward is now the default everywhere the panel fits. The
    # grouped whole-attention alternative OOMed and is retired to
    # ops/ablations/short_backward.py.
    if use_pallas:
        dq, dk, dv = _flash_backward(q, k, v, bias, out, lse, g, scale)
        return dq, dk, dv, None
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


# ---------------------------------------------------------------------------
# Packed-layout entry: [B, N, H·dh] in and out, no standalone head relayouts.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_packed_core(q, k, v, num_heads, scale):
    return _flash_forward_packed(q, k, v, num_heads, scale)


def _packed_fwd(q, k, v, num_heads, scale):
    out, lse = _flash_forward_packed(q, k, v, num_heads, scale, with_lse=True)
    return out, (q, k, v, out, lse)


def _packed_bwd(num_heads, scale, res, g):
    """Backward via the head-major kernels: transpose in, transpose grads
    back. For training this is a wash with the head-major path (whose
    forward transposes differentiate into backward transposes anyway); the
    packed layout's win is the grad-free sampling loop."""
    q, k, v, out, lse = res
    b, _, d_all = q.shape
    h = num_heads
    d = d_all // h
    hm = lambda t: t.reshape(b, -1, h, d).transpose(0, 2, 1, 3)
    dq, dk, dv, _ = _core_bwd(scale, (hm(q), hm(k), hm(v), None, hm(out), lse),
                              hm(g))
    back = lambda t: t.transpose(0, 2, 1, 3).reshape(b, -1, d_all)
    return back(dq), back(dk), back(dv)


_flash_packed_core.defvjp(_packed_fwd, _packed_bwd)


def flash_attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Flash attention over packed inputs: q/k/v [B, N, H·dh] -> [B, N, H·dh].

    Same math as ``flash_attention`` on the head-major reshape, but the head
    axis is resolved by the manual-DMA whole-panel kernel instead of
    standalone relayout copies (see ``_flash_forward_packed``). Masked calls
    fall back to the head-major path (the manual kernel carries no bias row
    — the DiT axes it serves attend unmasked).
    """
    dh = q.shape[-1] // num_heads
    scale = float(dh**-0.5 if scale is None else scale)
    # Mosaic DMA tiling rules (measured 2026-08-19, docs/PERF.md): slices on
    # the head axis must be 8-sublane-aligned AND the lane (head-feature)
    # dim 128-aligned once any minor dim is sliced — so the manual kernel is
    # only lowerable for dh % 128 == 0. At the DiT's dh=24 every in-kernel
    # relayout design is either un-lowerable or VMEM-infeasible (lane
    # padding 24→128 = 5.3x), so those shapes take the head-major path —
    # identical math, with the standalone transpose copies.
    on_tpu = jax.default_backend() == "tpu"
    kernel_ok = (mask is None and num_heads % _PACKED_GROUP == 0
                 and (not on_tpu or dh % 128 == 0)
                 and max(q.shape[1], k.shape[1]) * dh <= (1 << 20))
    if not kernel_ok:
        b, n, d_all = q.shape
        hm = lambda t: t.reshape(b, -1, num_heads, dh).transpose(0, 2, 1, 3)
        out = flash_attention(hm(q), hm(k), hm(v), mask=mask, scale=scale)
        return out.transpose(0, 2, 1, 3).reshape(b, n, d_all)
    return _flash_packed_core(q, k, v, num_heads, scale)
