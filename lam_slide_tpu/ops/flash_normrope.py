"""Flash attention with QKNorm + RoPE fused into the kernel's panel loads.

The DiT's temporal attention (latent_dit.py ParallelMLPAttention, long
axis) runs QK RMS-norm and RoPE as elementwise passes over q/k before the
flash kernel — in the default packed layout those are separate HBM
round-trips per layer, and even the head-major A/B arm
(LAM_SLIDE_HEADMAJOR_NORMROPE=1) only *hopes* XLA fuses them into the
pack→head-major transpose copies. This kernel removes the question: it
takes the RAW head-major q/k panels (straight out of the transpose), and
applies per-head RMS-norm + rotary embedding *inside* the kernel on the
panels it loads anyway — zero extra HBM traffic for norm/rope in the
sampling hot loop (reference math: QKNorm mmdit.py:127-148 + apply_rope
mmdit.py:84-90, same rounding points as ops.packed_attention's
headmajor_rmsnorm/headmajor_rope, which the parity tests pin).

Differentiation: custom VJP. The backward kernels are the
FlashAttention-2 pair from ops.flash_attention with the same in-kernel
transform applied to the raw tiles before the probability recompute; they
emit gradients w.r.t. the *transformed* q/k, which are then chained
through an XLA ``jax.vjp`` of the elementwise pre-transform to produce
gradients for the raw q/k and the learned norm scales. Enabled on the
model's temporal path with LAM_SLIDE_KERNEL_NORMROPE=1 (A/B arm
``kernel_normrope`` in tools/measure_fused_ab.py).

Constraints: head_dim must be even (RoPE pairs); key-padding masks fall
back to the unfused composition (the DiT temporal path carries none).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from lam_slide_tpu.ops.flash_attention import (
    _BWD_MAX_PANEL,
    _NEG_INF,
    _round_up,
    flash_attention,
)
from lam_slide_tpu.ops.packed_attention import (
    _pair_swap_matrix,
    headmajor_rmsnorm,
    headmajor_rope,
)

_EPS = 1e-6


def _kernel_normrope(x, scale_row, cosb, sinb, pair):
    """In-kernel QKNorm+RoPE on one [rows, dh] panel.

    x input dtype (bf16 in production); scale_row [1, dh] fp32; cosb/sinb
    [rows, dh] fp32 (angles already repeated per lane pair); pair [dh, dh]
    fp32 pair-swap matrix. Rounding points match the composition
    headmajor_rope(headmajor_rmsnorm(x, s), cos, sin) exactly: fp32 stats,
    cast to x.dtype after the norm, fp32 rotation, cast after the rope —
    so parity with the unfused path is bit-exact (tests pin this).
    The pair swap is a [rows, dh] x [dh, dh] constant matmul — one cheap
    MXU pass; Mosaic has no sub-lane-pair shuffle that lowers better.
    """
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    xn = (x32 * jax.lax.rsqrt(ms + _EPS) * scale_row).astype(x.dtype)
    xn32 = xn.astype(jnp.float32)
    partner = jax.lax.dot_general(
        xn32, pair, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return (xn32 * cosb + partner * sinb).astype(x.dtype)


def _nr_flash_kernel(q_ref, k_ref, v_ref, qs_ref, ks_ref, cq_ref, sq_ref,
                     ck_ref, sk_ref, pair_ref, o_ref, lse_ref, *,
                     scale, block_k, seq_len, with_lse):
    """Forward: one (bh, q-block) program, transforms panels then runs the
    standard running-softmax recurrence (mirrors flash_attention._flash_kernel).

    q_ref [1, block_q, d] RAW; k_ref/v_ref [1, pk, d] RAW/values;
    qs/ks [1, d] fp32; cq/sq [block_q, d]; ck/sk [pk, d]; pair [d, d].
    """
    _, block_q, d = q_ref.shape
    padded_n = k_ref.shape[1]
    num_kb = padded_n // block_k
    v_dtype = v_ref.dtype
    pair = pair_ref[...]

    q = _kernel_normrope(q_ref[0], qs_ref[...], cq_ref[...], sq_ref[...], pair)

    def k_block(kb):
        # Transform per k-block from the refs: Mosaic has no dynamic_slice
        # lowering for VALUES, so slicing a full-panel transformed k_t does
        # not compile on TC — ref reads with pl.ds do. Total transform work
        # is identical (the blocks partition the panel).
        kraw = k_ref[0, pl.ds(kb * block_k, block_k), :]
        cb = ck_ref[pl.ds(kb * block_k, block_k), :]
        sb = sk_ref[pl.ds(kb * block_k, block_k), :]
        return _kernel_normrope(kraw, ks_ref[...], cb, sb, pair)

    def logits(kb, masked):
        k = k_block(kb)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if masked:
            key_idx = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(key_idx < seq_len, s, _NEG_INF)
        return s

    def av(p, kb):
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        return jax.lax.dot_general(
            p.astype(v_dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if num_kb == 1:
        s = logits(0, masked=padded_n != seq_len)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0] = (av(p, 0) / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
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
    full_kb = num_kb if padded_n == seq_len else num_kb - 1
    carry = jax.lax.fori_loop(
        0, full_kb, lambda kb, c: step(kb, c, masked=False), (m0, l0, acc0)
    )
    if full_kb != num_kb:
        carry = step(num_kb - 1, carry, masked=True)
    m, l, acc = carry
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    if with_lse:
        lse_ref[0] = m + jnp.log(jnp.maximum(l, 1e-30))


def _prep_tables(cos, sin, n, pn, d):
    """[n, d/2] fp32 angle tables -> lane-repeated zero-padded [pn, d]."""
    rc = jnp.repeat(cos.astype(jnp.float32), 2, axis=-1)
    rs = jnp.repeat(sin.astype(jnp.float32), 2, axis=-1)
    if pn != n:
        rc = jnp.pad(rc, ((0, pn - n), (0, 0)))
        rs = jnp.pad(rs, ((0, pn - n), (0, 0)))
    return rc, rs


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "with_lse")
)
def _nr_forward(q, k, v, qs, ks, cos, sin, scale, block_q=1024, block_k=1024,
                with_lse=False):
    """q,k,v RAW [B, H, N, D] (D even); qs/ks [D]; cos/sin [N, D/2] fp32."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
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

    def prep(t, pn):
        if pn == t.shape[2]:
            return t.reshape(b * h, pn, d)
        return jnp.pad(t, ((0, 0), (0, 0), (0, pn - t.shape[2]), (0, 0))).reshape(
            b * h, pn, d
        )

    qp, kp, vp = prep(q, pq), prep(k, pk), prep(v, pk)
    cq, sq = _prep_tables(cos, sin, nq, pq, d)
    ck, sk = _prep_tables(cos, sin, nk, pk, d)
    qs_row = qs.astype(jnp.float32)[None, :]
    ks_row = ks.astype(jnp.float32)[None, :]
    pair = jnp.asarray(_pair_swap_matrix(d))

    grid = (b * h, pq // block_q)
    interpret = jax.default_backend() != "tpu"
    out_shape = [
        jax.ShapeDtypeStruct((b * h, pq, d), q.dtype),
        jax.ShapeDtypeStruct((b * h, pq, 1), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
        pl.BlockSpec((1, block_q, 1), lambda bh, i: (bh, i, 0)),
    ]
    out, lse = pl.pallas_call(
        functools.partial(
            _nr_flash_kernel, scale=scale, block_k=block_k, seq_len=nk,
            with_lse=True,
        ),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, pk, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, pk, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, d), lambda bh, i: (0, 0)),
            pl.BlockSpec((1, d), lambda bh, i: (0, 0)),
            pl.BlockSpec((block_q, d), lambda bh, i: (i, 0)),
            pl.BlockSpec((block_q, d), lambda bh, i: (i, 0)),
            pl.BlockSpec((pk, d), lambda bh, i: (0, 0)),
            pl.BlockSpec((pk, d), lambda bh, i: (0, 0)),
            pl.BlockSpec((d, d), lambda bh, i: (0, 0)),
        ],
        out_specs=out_specs,
        interpret=interpret,
    )(qp, kp, vp, qs_row, ks_row, cq, sq, ck, sk, pair)
    out = out.reshape(b, h, pq, d)[:, :, :nq, :]
    lse = lse.reshape(b, h, pq)[:, :, :nq]
    if with_lse:
        return out, lse
    return out


def _nr_bwd_probs(q_t, k_t, lse_blk, kb, block_k, seq_len, scale, masked):
    """[bq, bk] attention weights of one tile from TRANSFORMED panels, fp32."""
    s = jax.lax.dot_general(
        q_t, k_t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if masked:
        key_idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_idx < seq_len, s, _NEG_INF)
    return jnp.exp(s - lse_blk)


def _nr_bwd_kv_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                      qs_ref, ks_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                      pair_ref, dk_ref, dv_ref, *,
                      scale, block_q, seq_len, masked):
    """One (bh, k-block) program: dK_t/dV over query blocks (gradients are
    w.r.t. the TRANSFORMED k — the XLA pre-transform VJP chains them back).

    q/do_ref [1, pq, d] (q RAW); lse/delta [1, pq, 1]; k_ref [1, block_k, d]
    RAW; ck/sk arrive pre-sliced [block_k, d] via the BlockSpec.
    """
    _, pq, d = q_ref.shape
    _, block_k, _ = k_ref.shape
    kb = pl.program_id(1)
    num_qb = pq // block_q
    dtype = v_ref.dtype
    pair = pair_ref[...]
    k_t = _kernel_normrope(k_ref[0], ks_ref[...], ck_ref[...], sk_ref[...], pair)
    v = v_ref[0]

    def body(qb, carry):
        dk, dv = carry
        # Per-block transform from refs (no value dynamic_slice on TC).
        q_raw = q_ref[0, pl.ds(qb * block_q, block_q), :]
        cb = cq_ref[pl.ds(qb * block_q, block_q), :]
        sb = sq_ref[pl.ds(qb * block_q, block_q), :]
        q_t = _kernel_normrope(q_raw, qs_ref[...], cb, sb, pair)
        do_blk = do_ref[0, pl.ds(qb * block_q, block_q), :]
        lse_blk = lse_ref[0, pl.ds(qb * block_q, block_q), :]
        delta_blk = delta_ref[0, pl.ds(qb * block_q, block_q), :]
        p = _nr_bwd_probs(q_t, k_t, lse_blk, kb, block_k, seq_len, scale, masked)
        pb = p.astype(dtype)
        dv = dv + jax.lax.dot_general(
            pb, do_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do_blk, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta_blk) * scale).astype(dtype)
        dk = dk + jax.lax.dot_general(
            ds, q_t, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _nr_bwd_q_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                     qs_ref, ks_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                     pair_ref, dq_ref, *, scale, block_k, seq_len):
    """One (bh, q-block) program: dQ_t over key blocks."""
    _, block_q, d = q_ref.shape
    pk = k_ref.shape[1]
    num_kb = pk // block_k
    dtype = v_ref.dtype
    pair = pair_ref[...]
    q_t = _kernel_normrope(q_ref[0], qs_ref[...], cq_ref[...], sq_ref[...], pair)
    do = do_ref[0]
    lse = lse_ref[0]
    delta = delta_ref[0]

    def step(kb, dq, masked):
        # Per-block transform from refs (no value dynamic_slice on TC).
        k_raw = k_ref[0, pl.ds(kb * block_k, block_k), :]
        cb = ck_ref[pl.ds(kb * block_k, block_k), :]
        sb = sk_ref[pl.ds(kb * block_k, block_k), :]
        k_t = _kernel_normrope(k_raw, ks_ref[...], cb, sb, pair)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        p = _nr_bwd_probs(q_t, k_t, lse, kb, block_k, seq_len, scale, masked)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta) * scale).astype(dtype)
        return dq + jax.lax.dot_general(
            ds, k_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    full_kb = num_kb if pk == seq_len else num_kb - 1
    dq = jax.lax.fori_loop(
        0, full_kb, lambda kb, c: step(kb, c, masked=False),
        jnp.zeros((block_q, d), jnp.float32),
    )
    if full_kb != num_kb:
        dq = step(num_kb - 1, dq, masked=True)
    dq_ref[0] = dq.astype(dq_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _nr_backward(q, k, v, qs, ks, cos, sin, out, lse, g, scale,
                 block_q=512, block_k=512):
    """-> (dq_t, dk_t, dv): gradients w.r.t. the TRANSFORMED q/k plus dv."""
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

    def prep(t, pn):
        if pn == t.shape[2]:
            return t.reshape(b * h, pn, d)
        return jnp.pad(t, ((0, 0), (0, 0), (0, pn - t.shape[2]), (0, 0))).reshape(
            b * h, pn, d
        )

    def prep_rows(t, pn):
        if pn != t.shape[2]:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, pn - t.shape[2])))
        return t.reshape(b * h, pn, 1)

    qp, dop = prep(q, pq), prep(g.astype(q.dtype), pq)
    kp, vp = prep(k, pk), prep(v, pk)
    lsep, deltap = prep_rows(lse, pq), prep_rows(delta, pq)
    cq, sq = _prep_tables(cos, sin, nq, pq, d)
    ck, sk = _prep_tables(cos, sin, nk, pk, d)
    qs_row = qs.astype(jnp.float32)[None, :]
    ks_row = ks.astype(jnp.float32)[None, :]
    pair = jnp.asarray(_pair_swap_matrix(d))

    interpret = jax.default_backend() != "tpu"
    common = dict(scale=scale, seq_len=nk)
    scale_spec = pl.BlockSpec((1, d), lambda bh, i: (0, 0))
    pair_spec = pl.BlockSpec((d, d), lambda bh, i: (0, 0))

    dk, dv = pl.pallas_call(
        functools.partial(_nr_bwd_kv_kernel, block_q=block_q,
                          masked=pk != nk, **common),
        out_shape=[jax.ShapeDtypeStruct((b * h, pk, d), k.dtype)] * 2,
        grid=(b * h, pk // block_k),
        in_specs=[
            pl.BlockSpec((1, pq, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, pq, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, pq, 1), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, pq, 1), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, i: (bh, i, 0)),
            scale_spec, scale_spec,
            pl.BlockSpec((pq, d), lambda bh, i: (0, 0)),
            pl.BlockSpec((pq, d), lambda bh, i: (0, 0)),
            pl.BlockSpec((block_k, d), lambda bh, i: (i, 0)),
            pl.BlockSpec((block_k, d), lambda bh, i: (i, 0)),
            pair_spec,
        ],
        out_specs=[pl.BlockSpec((1, block_k, d), lambda bh, i: (bh, i, 0))] * 2,
        interpret=interpret,
    )(qp, dop, lsep, deltap, kp, vp, qs_row, ks_row, cq, sq, ck, sk, pair)

    dq = pl.pallas_call(
        functools.partial(_nr_bwd_q_kernel, block_k=block_k, **common),
        out_shape=jax.ShapeDtypeStruct((b * h, pq, d), q.dtype),
        grid=(b * h, pq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, pk, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, pk, d), lambda bh, i: (bh, 0, 0)),
            scale_spec, scale_spec,
            pl.BlockSpec((block_q, d), lambda bh, i: (i, 0)),
            pl.BlockSpec((block_q, d), lambda bh, i: (i, 0)),
            pl.BlockSpec((pk, d), lambda bh, i: (0, 0)),
            pl.BlockSpec((pk, d), lambda bh, i: (0, 0)),
            pair_spec,
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
        interpret=interpret,
    )(qp, dop, lsep, deltap, kp, vp, qs_row, ks_row, cq, sq, ck, sk, pair)

    unpad = lambda t, n: t.reshape(b, h, -1, d)[:, :, :n, :]
    return unpad(dq, nq), unpad(dk, nk), unpad(dv, nk)


def _pre_transform(q, k, qs, ks, cos, sin):
    """The unfused elementwise stage the kernel absorbs (exact rounding)."""
    q_t = headmajor_rope(headmajor_rmsnorm(q, qs, eps=_EPS), cos, sin)
    k_t = headmajor_rope(headmajor_rmsnorm(k, ks, eps=_EPS), cos, sin)
    return q_t, k_t


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _nr_core(q, k, v, qs, ks, cos, sin, scale, block_q=1024, block_k=1024):
    return _nr_forward(q, k, v, qs, ks, cos, sin, scale,
                       block_q=block_q, block_k=block_k)


def _nr_core_fwd(q, k, v, qs, ks, cos, sin, scale, block_q, block_k):
    out, lse = _nr_forward(q, k, v, qs, ks, cos, sin, scale,
                           block_q=block_q, block_k=block_k, with_lse=True)
    return out, (q, k, v, qs, ks, cos, sin, out, lse)


def _nr_core_bwd(scale, block_q, block_k, res, g):
    q, k, v, qs, ks, cos, sin, out, lse = res
    dq_t, dk_t, dv = _nr_backward(q, k, v, qs, ks, cos, sin, out, lse, g, scale,
                                  block_q=min(block_q, 512),
                                  block_k=min(block_k, 512))
    # Chain the transformed-space gradients back through the elementwise
    # pre-transform (rope rotation transpose + RMS-norm VJP, incl. the
    # learned per-head scales) — cheap XLA elementwise work, training-only.
    _, pre_vjp = jax.vjp(
        lambda q_, k_, qs_, ks_: _pre_transform(q_, k_, qs_, ks_, cos, sin),
        q, k, qs, ks,
    )
    dq, dk, dqs, dks = pre_vjp((dq_t.astype(q.dtype), dk_t.astype(k.dtype)))
    return dq, dk, dv, dqs, dks, None, None


_nr_core.defvjp(_nr_core_fwd, _nr_core_bwd)


def flash_attention_normrope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_scale: jnp.ndarray,
    k_scale: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Attention over RAW head-major q/k with QKNorm+RoPE fused in-kernel.

    Semantics == flash_attention(rope(rmsnorm(q, q_scale)),
    rope(rmsnorm(k, k_scale)), v, mask, scale) with the pair convention of
    ops.packed_attention.headmajor_rope. q,k,v: [B, H, N, D] (D even);
    q_scale/k_scale: [D] per-head lane scales; cos/sin: [N, D/2] fp32.
    Falls back to the unfused composition when a mask is present, D is odd,
    or the backward VMEM panel would not fit (mirrors flash_attention's
    _BWD_MAX_PANEL guard so training never routes to an unfusable shape).
    """
    b, h, nq, d = q.shape
    nk = k.shape[2]
    scale = float(d**-0.5 if scale is None else scale)
    panel = max(nq, nk) * d
    if mask is not None or d % 2 != 0 or 2 * panel > _BWD_MAX_PANEL:
        q_t, k_t = _pre_transform(q, k, q_scale, k_scale, cos, sin)
        return flash_attention(q_t, k_t, v, mask=mask, scale=scale)
    return _nr_core(q, k, v, q_scale, k_scale, cos, sin, scale)
