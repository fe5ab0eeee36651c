"""Pallas TPU attention for SHORT sequence axes (8 < n < 128).

The factorized DiT's temporal axis is n=20..30 frames for the MD17,
pedestrian, and NBA stage-2 configs (reference
configs/model/*/second-stage.yaml) — below the flash kernel's efficient
range and far below the 128-lane tile width. The XLA path at these shapes
is layout-bound, not FLOP-bound: the fp32 ``[B·H, n, n]`` logits pad their
minor dim 30→128 (4.27x) and make three HBM round-trips (QKᵀ write,
softmax read+write, AV read); the profiler attributes ~28% of the whole
MD17 stage-2 train step to this one op family (docs/PERF.md 2026-08-19).

Design: one program loads a panel of G·n rows of the head-major-flattened
``[B·H·n, dh]`` operands into VMEM and computes GROUPED attention — a
single ``[G·n, G·n]`` MXU matmul whose off-block-diagonal entries (cross
batch-head pairs) are masked to -inf before the row softmax, so the
padding-hostile ``n×n`` score matrices never exist in HBM at any size.
The G-fold matmul redundancy is the price of full-width MXU tiles; at
n=30, dh=32 it is ~90 GFLOP per call against a ~3 GB/call HBM bound —
still traffic-dominated, i.e. the redundancy is free.

Considered and rejected: packing 4 batch-heads into the 128-lane axis
(exactly-full lanes, 4x less HBM traffic) needs per-quarter masked matmuls
for both QKᵀ and AV — 2x the FLOPs and 4x the softmax VPU work of this
design for ~1.4x projected gain; and in-kernel head extraction from the
packed ``[B, n, H·dh]`` layout is un-lowerable at dh<128 (Mosaic DMA/lane
tiling rules, docs/PERF.md round-3 packed-relayout post-mortem).

Differentiation: custom VJP; the backward recomputes the grouped scores in
VMEM from the saved q/k/v panels (nothing O(n²) is saved) and emits
dQ/dK/dV with the same block-diagonal masking. Numerics match
``ops.attention.xla_attention``: fp32 logits and softmax statistics,
value-dtype operands into the MXU, fp32 accumulation.

Off-TPU the kernels run through the Pallas interpreter (tests, virtual
meshes); production dispatch (`ops.attention._pick_backend_packed`) only
selects this path on a real TPU.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

# Per-program panel sizing: sub-tiles of ~256 rows feed the MXU full-ish
# M/N tiles; ~8 sub-tiles per program amortize grid/DMA overhead at a
# couple of MB of VMEM per operand panel.
_SUBTILE_ROWS = 256
_ROWS_PER_PROGRAM = 2048


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _choose_group(n: int) -> int:
    """Batch-heads per sub-tile: ~_SUBTILE_ROWS rows, 16-sublane aligned."""
    g = max(1, _SUBTILE_ROWS // n)
    while (g * n) % 16 != 0:
        g += 1
    return g


def _block_diag_mask(rows: int, n: int) -> jnp.ndarray:
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    return (ri // n) == (ci // n)


def _scores(qs, ks, same, scale):
    logits = jax.lax.dot_general(
        qs, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    logits = jnp.where(same, logits, _NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)  # fp32 [rows, rows]


def _short_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, n, g, scale):
    rows = g * n
    same = _block_diag_mask(rows, n)
    for s in range(q_ref.shape[0] // rows):
        sl = pl.ds(s * rows, rows)
        w = _scores(q_ref[sl, :], k_ref[sl, :], same, scale)
        o = jax.lax.dot_general(
            w.astype(v_ref.dtype), v_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[sl, :] = o.astype(o_ref.dtype)


def _short_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                      *, n, g, scale):
    rows = g * n
    same = _block_diag_mask(rows, n)
    for s in range(q_ref.shape[0] // rows):
        sl = pl.ds(s * rows, rows)
        qs, ks, vs = q_ref[sl, :], k_ref[sl, :], v_ref[sl, :]
        dos = do_ref[sl, :]
        w = _scores(qs, ks, same, scale)  # fp32 [rows, rows]
        wl = w.astype(vs.dtype)
        # dV = Pᵀ dO  (contract the query axis)
        dv = jax.lax.dot_general(
            wl, dos, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # dP = dO Vᵀ ; dS = P ⊙ (dP - rowsum(P ⊙ dP)) · scale
        dp = jax.lax.dot_general(
            dos, vs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(w * dp, axis=-1, keepdims=True)
        ds = (w * (dp - delta) * scale).astype(qs.dtype)
        dq = jax.lax.dot_general(
            ds, ks, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            ds, qs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_ref[sl, :] = dq.astype(dq_ref.dtype)
        dk_ref[sl, :] = dk.astype(dk_ref.dtype)
        dv_ref[sl, :] = dv.astype(dv_ref.dtype)


def _pad_rows(t: jnp.ndarray, rows_pad: int) -> jnp.ndarray:
    if t.shape[0] == rows_pad:
        return t
    return jnp.pad(t, ((0, rows_pad - t.shape[0]), (0, 0)))


def _panel_geometry(bh: int, n: int):
    """(g, block_rows, rows_pad): sub-tile group, program panel, padded rows."""
    g = _choose_group(n)
    subs = max(1, _ROWS_PER_PROGRAM // (g * n))
    bg = g * subs  # batch-heads per program
    bh_pad = _round_up(bh, bg)
    return g, bg * n, bh_pad * n


@functools.partial(jax.jit, static_argnames=("n", "scale"))
def _short_fwd(q2, k2, v2, n: int, scale: float):
    """q2/k2/v2: head-major flattened [B·H·n, dh] -> [B·H·n, dh]."""
    rows, dh = q2.shape
    bh = rows // n
    g, block_rows, rows_pad = _panel_geometry(bh, n)
    qp, kp, vp = (_pad_rows(t, rows_pad) for t in (q2, k2, v2))
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_short_fwd_kernel, n=n, g=g, scale=scale),
        out_shape=jax.ShapeDtypeStruct((rows_pad, dh), q2.dtype),
        grid=(rows_pad // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, dh), lambda i: (i, 0))] * 3,
        out_specs=pl.BlockSpec((block_rows, dh), lambda i: (i, 0)),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:rows]


@functools.partial(jax.jit, static_argnames=("n", "scale"))
def _short_bwd(q2, k2, v2, do2, n: int, scale: float):
    rows, dh = q2.shape
    bh = rows // n
    g, block_rows, rows_pad = _panel_geometry(bh, n)
    qp, kp, vp, dop = (_pad_rows(t, rows_pad) for t in (q2, k2, v2, do2))
    interpret = jax.default_backend() != "tpu"
    shape = jax.ShapeDtypeStruct((rows_pad, dh), q2.dtype)
    spec = pl.BlockSpec((block_rows, dh), lambda i: (i, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_short_bwd_kernel, n=n, g=g, scale=scale),
        out_shape=[shape, shape, shape],
        grid=(rows_pad // block_rows,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        interpret=interpret,
    )(qp, kp, vp, dop)
    return dq[:rows], dk[:rows], dv[:rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _short_core(q2, k2, v2, n: int, scale: float):
    return _short_fwd(q2, k2, v2, n, scale)


def _short_core_fwd(q2, k2, v2, n, scale):
    return _short_fwd(q2, k2, v2, n, scale), (q2, k2, v2)


def _short_core_bwd(n, scale, res, do2):
    q2, k2, v2 = res
    return _short_bwd(q2, k2, v2, do2.astype(q2.dtype), n, scale)


_short_core.defvjp(_short_core_fwd, _short_core_bwd)


def short_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Unmasked attention over packed [B, n, H·dh] inputs, n in (8, 128).

    Same math as ``xla_attention`` on the head-major reshape (the reference
    semantics: torch SDPA at src/models/torch_modules.py:184), but the n×n
    score matrices live only in VMEM. q/k/v must share shape; self-attention
    lengths only (nk == nq) — the DiT temporal axis this serves is square.
    """
    b, n, d_all = q.shape
    dh = d_all // num_heads
    scale = float(dh**-0.5 if scale is None else scale)

    def to2d(t):  # [B, n, H·dh] -> [B·H·n, dh] (one fused relayout copy)
        return (t.reshape(b, n, num_heads, dh)
                 .transpose(0, 2, 1, 3)
                 .reshape(b * num_heads * n, dh))

    out2 = _short_core(to2d(q), to2d(k), to2d(v), n, scale)
    return (out2.reshape(b, num_heads, n, dh)
                .transpose(0, 2, 1, 3)
                .reshape(b, n, d_all))
