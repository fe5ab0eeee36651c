"""ABLATION — grouped whole-attention-in-VMEM flash backward (retired).

Candidate fix for the suspected MD17 short-N/huge-grid Mosaic compile
pathology (bh = 30720 programs over N = 192, dh = 24 — the MD17 stage-2
spatial axis, reference `src/models/composites/second_stage/md17.py`).
One program handles ``group`` whole (b·h) items, recomputing the full
[N, N] probability matrix in VMEM, shrinking the grid by the group factor.

Measured on-chip 2026-08-17 (tools/measure_md17_bwd.py) and REJECTED:

* The kernel RESOURCE_EXHAUSTs at its one target shape: every
  bf16[30720, 192, 24] operand/result is laid out in (8, 128) tiles, so
  the 24-wide lane axis pads to 128 — 5.3x expansion, 1.41 GiB per temp,
  and the six operands + three results exceed HBM.
* The pathology it was written to dodge did not reproduce: the tiled
  FlashAttention-2 backward compiles in 0.8 s at that exact grid and is
  the fastest arm (72.4 ms/step vs 77.7 ms for the chunked XLA recompute),
  so it is now the production default (ops/flash_attention.py::_core_bwd).

Kept under ablations/ with its interpreter-mode parity tests as the
record of the negative result (docs/PERF.md).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _flash_bwd_short_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                            dq_ref, dk_ref, dv_ref, *, scale, group):
    """One program = ``group`` whole (b·h) items, full attention in VMEM.

    refs: q/do [g, N, d], lse/delta [g, N, 1], k/v [g, N, d].
    """
    dtype = v_ref.dtype
    for i in range(group):
        q = q_ref[i]
        do = do_ref[i]
        lse = lse_ref[i]
        delta = delta_ref[i]
        kk = k_ref[i]
        vv = v_ref[i]
        s = jax.lax.dot_general(
            q, kk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        p = jnp.exp(s - lse)
        pb = p.astype(dtype)
        dv = jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, vv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = (p * (dp - delta) * scale).astype(dtype)
        dq = jax.lax.dot_general(
            ds, kk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dq_ref[i] = dq.astype(dq_ref.dtype)
        dk_ref[i] = dk.astype(dk_ref.dtype)
        dv_ref[i] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "group"))
def _flash_backward_short(q, k, v, out, lse, g, scale, group=8):
    """Grouped whole-attention backward for short sequences.

    Bias-free path only; the key axis is used at its true length (no block
    padding), so no padding mask is needed — the recomputed logits cover
    exactly the keys the forward's lse saw."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dp_ = d if d % 2 == 0 else d + 1
    bh = b * h
    pad_bh = (-bh) % group

    def prep(t):  # [B, H, N, d] -> [BH+pad, N, dp_]
        t = t.reshape(bh, t.shape[2], d)
        if dp_ != d:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, dp_ - d)))
        if pad_bh:
            t = jnp.pad(t, ((0, pad_bh), (0, 0), (0, 0)))
        return t

    def prep_rows(t):  # [B, H, N] fp32 -> [BH+pad, N, 1]
        t = t.reshape(bh, t.shape[2], 1)
        if pad_bh:
            t = jnp.pad(t, ((0, pad_bh), (0, 0), (0, 0)))
        return t

    qp, dop, kp, vp = prep(q), prep(g.astype(q.dtype)), prep(k), prep(v)
    lsep, deltap = prep_rows(lse), prep_rows(delta)
    n_groups = (bh + pad_bh) // group

    item = lambda n: pl.BlockSpec((group, n, dp_), lambda i: (i, 0, 0))
    rows = lambda n: pl.BlockSpec((group, n, 1), lambda i: (i, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_short_kernel, scale=scale, group=group),
        grid=(n_groups,),
        in_specs=[item(nq), item(nq), rows(nq), rows(nq), item(nk), item(nk)],
        out_specs=[item(nq), item(nk), item(nk)],
        out_shape=[jax.ShapeDtypeStruct((bh + pad_bh, nq, dp_), q.dtype),
                   jax.ShapeDtypeStruct((bh + pad_bh, nk, dp_), k.dtype),
                   jax.ShapeDtypeStruct((bh + pad_bh, nk, dp_), v.dtype)],
        interpret=jax.default_backend() != "tpu",
    )(qp, dop, lsep, deltap, kp, vp)
    unpad = lambda t, n: t[:bh, :, :d].reshape(b, h, n, d)
    return unpad(dq, nq), unpad(dk, nk), unpad(dv, nk)
