"""Batched jitted k-means (Lloyd's algorithm).

Replaces the reference's torch_kmeans dependency (second_stage/
pedestrian.py:190-226) for final-position-clustering (FPC) post-processing.
Fixed iteration count under lax.scan — static shapes, runs on TPU inside
the same jitted eval program as the sampler. k-means++-lite init: first
center = point 0, the rest are the points farthest from current centers
(deterministic; no RNG needed for the K≈60, C≈20 regime this serves).
"""

from functools import partial
from typing import Tuple

import jax
from jax import numpy as jnp


def _init_centers(points: jnp.ndarray, n_clusters: int) -> jnp.ndarray:
    """Farthest-point initialization. points: [N, D] -> [C, D]."""

    def step(carry, _):
        centers, n_set = carry
        d = jnp.min(
            jnp.linalg.norm(points[:, None] - centers[None], axis=-1)
            + jnp.where(jnp.arange(centers.shape[0])[None] < n_set, 0.0, jnp.inf),
            axis=1,
        )
        idx = jnp.argmax(d)
        centers = centers.at[n_set].set(points[idx])
        return (centers, n_set + 1), None

    centers0 = jnp.zeros((n_clusters, points.shape[-1]), points.dtype).at[0].set(points[0])
    (centers, _), _ = jax.lax.scan(step, (centers0, 1), None, length=n_clusters - 1)
    return centers


@partial(jax.jit, static_argnums=(1, 2))
def kmeans(points: jnp.ndarray, n_clusters: int, n_iters: int = 20) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-set k-means. points [N, D] -> (centers [C, D], assignment [N]).

    Empty clusters keep their previous center (guarded mean).
    """

    def lloyd(centers, _):
        d = jnp.linalg.norm(points[:, None] - centers[None], axis=-1)  # [N, C]
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=points.dtype)  # [N, C]
        counts = onehot.sum(axis=0)  # [C]
        sums = onehot.T @ points  # [C, D]
        new_centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers
        )
        return new_centers, None

    centers, _ = jax.lax.scan(lloyd, _init_centers(points, n_clusters), None, length=n_iters)
    d = jnp.linalg.norm(points[:, None] - centers[None], axis=-1)
    return centers, jnp.argmin(d, axis=1)


def batched_kmeans(points: jnp.ndarray, n_clusters: int, n_iters: int = 20):
    """points [B, N, D] -> (centers [B, C, D], assign [B, N])."""
    return jax.vmap(lambda p: kmeans(p, n_clusters, n_iters))(points)
