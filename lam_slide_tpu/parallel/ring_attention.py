"""Ring attention: sequence-parallel exact attention over a mesh axis.

The reference scales sequence length architecturally (factorized
spatial/temporal attention caps the axis at max(T, L) ≤ ~1000 — SURVEY.md
§2.8/§5) and has no distributed sequence parallelism. This module is that
design's declared extension point made real: when a rollout's temporal axis
outgrows one core's memory, shard T over the mesh's ``model`` axis and run
blockwise-exact attention with K/V chunks rotating around the ring
(``lax.ppermute`` over ICI neighbors), merging per-chunk softmax statistics
with the standard running (m, l, acc) recurrence — the distributed analogue
of the Pallas flash kernel's key-block loop (ops/flash_attention.py).

Math: for chunk statistics (mᵢ, lᵢ, accᵢ) with out = Σᵢ accᵢ·e^{mᵢ-m} / Σᵢ
lᵢ·e^{mᵢ-m}, the pairwise merge is associative and order-independent, so
the result is bit-equivalent to single-device attention up to fp roundoff.

Usage (see tests/test_ring_attention.py):

    mesh = make_mesh(MeshSpec(data=1, model=8))
    out = jax.jit(
        shard_map(
            functools.partial(ring_attention, axis_name="model"),
            mesh=mesh,
            in_specs=(P(None, None, "model", None),) * 3,
            out_specs=P(None, None, "model", None),
        )
    )(q, k, v)

Each device computes its local Q block against every K/V chunk; per ring
step the communication is one neighbor ppermute of the K/V chunk — ICI
bandwidth-bound, overlapping the next chunk's attention compute under XLA's
async collectives.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from lam_slide_tpu.ops.attention import xla_attention


def _chunk_stats(q, k, v, scale):
    """Blockwise softmax statistics for one K/V chunk.

    q: [B, H, Tq, D]; k, v: [B, H, Tc, D] →
    (m [B,H,Tq,1] fp32 rowmax, l [B,H,Tq,1] fp32 rowsum, acc [B,H,Tq,D] fp32).
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * jnp.float32(scale)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return m, l, acc


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Exact attention with the sequence axis sharded over ``axis_name``.

    Call inside shard_map: q/k/v are the LOCAL shards [B, H, T/P, D] of the
    global [B, H, T, D]; returns the local output shard. P = mesh size of
    the axis.
    """
    n_dev = jax.lax.axis_size(axis_name)
    scale = float(q.shape[-1] ** -0.5 if scale is None else scale)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    m, l, acc = _chunk_stats(q, k, v, scale)

    def body(_, carry):
        m, l, acc, k, v = carry
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        m_c, l_c, acc_c = _chunk_stats(q, k, v, scale)
        m_new = jnp.maximum(m, m_c)
        a = jnp.exp(m - m_new)
        b = jnp.exp(m_c - m_new)
        return m_new, l * a + l_c * b, acc * a + acc_c * b, k, v

    m, l, acc, _, _ = jax.lax.fori_loop(1, n_dev, body, (m, l, acc, k, v))
    return (acc / jnp.maximum(l, 1e-30)).astype(v.dtype)


def sequence_parallel_attention(q, k, v, mesh, axis: str = "model",
                                scale: Optional[float] = None):
    """Convenience wrapper: shard the sequence axis of global [B, H, T, D]
    arrays over ``mesh[axis]`` and run ring attention."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(None, None, axis, None)
    fn = shard_map(
        functools.partial(ring_attention, axis_name=axis, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)


def reference_attention(q, k, v, scale=None):
    """Single-device reference for parity tests."""
    return xla_attention(q, k, v, scale=scale)
