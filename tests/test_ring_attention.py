"""Sequence-parallel ring attention over the virtual 8-device mesh.

Parity with single-device attention, gradient flow, and mesh-shape
robustness — the distributed "fake backend" testing the reference never had
(SURVEY.md §4).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from lam_slide_tpu.parallel.mesh import MeshSpec, make_mesh
from lam_slide_tpu.parallel.ring_attention import (
    reference_attention,
    ring_attention,
    sequence_parallel_attention,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def _qkv(key, b=2, h=4, t=64, d=16, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (b, h, t, d), dtype) for k in ks)


class TestRingAttention:
    def test_matches_single_device(self):
        mesh = make_mesh(MeshSpec(data=1, model=8))
        q, k, v = _qkv(jax.random.PRNGKey(0))
        out = sequence_parallel_attention(q, k, v, mesh)
        ref = reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_matches_with_scale_and_odd_heads(self):
        mesh = make_mesh(MeshSpec(data=1, model=8))
        q, k, v = _qkv(jax.random.PRNGKey(1), b=1, h=3, t=40, d=8)
        out = sequence_parallel_attention(q, k, v, mesh, scale=0.3)
        ref = reference_attention(q, k, v, scale=0.3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_two_by_four_mesh(self):
        """data-parallel batch sharding composes with sequence sharding."""
        mesh = make_mesh(MeshSpec(data=2, model=4))
        q, k, v = _qkv(jax.random.PRNGKey(2), b=4, t=32)
        spec = P("data", None, "model", None)
        fn = jax.jit(shard_map(
            functools.partial(ring_attention, axis_name="model"),
            mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
        ))
        out = fn(q, k, v)
        ref = reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_gradients_flow_and_match(self):
        mesh = make_mesh(MeshSpec(data=1, model=8))
        q, k, v = _qkv(jax.random.PRNGKey(3), t=24)

        def loss_ring(q_, k_, v_):
            return jnp.sum(sequence_parallel_attention(q_, k_, v_, mesh) ** 2)

        def loss_ref(q_, k_, v_):
            return jnp.sum(reference_attention(q_, k_, v_) ** 2)

        gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, r in zip(gr, gf):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=5e-5, atol=5e-5)

    def test_long_axis_bf16(self):
        mesh = make_mesh(MeshSpec(data=1, model=8))
        q, k, v = _qkv(jax.random.PRNGKey(4), b=1, h=2, t=512, d=24,
                       dtype=jnp.bfloat16)
        out = sequence_parallel_attention(q, k, v, mesh)
        ref = reference_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2,
        )
