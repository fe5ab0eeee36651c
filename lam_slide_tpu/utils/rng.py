"""Explicit RNG utilities.

``per_sample_keys`` is the functional equivalent of the reference's
StackedRandomGenerator (torch_modules.py:276-299): per-sample reproducible
randomness keyed by integer seeds — here a fold_in per seed, so sample i
always draws the same stream regardless of batch composition.
"""

import zlib

import jax
from jax import numpy as jnp


def stable_seed(*parts) -> int:
    """Deterministic 32-bit seed from arbitrary values.

    Python's builtin ``hash`` of strings is randomized per process
    (PYTHONHASHSEED), so seeding numpy from it makes "deterministic"
    synthetic data differ between runs. CRC32 over the repr is stable
    across processes and platforms.
    """
    return zlib.crc32(repr(parts).encode()) & 0xFFFFFFFF


def per_sample_keys(base: jax.Array, seeds: jnp.ndarray) -> jax.Array:
    """base key + integer seeds [B] -> stacked keys [B, 2]."""
    return jax.vmap(lambda s: jax.random.fold_in(base, s))(jnp.asarray(seeds))


def stacked_normal(base: jax.Array, seeds: jnp.ndarray, shape, dtype=jnp.float32):
    """Per-sample reproducible N(0,1): shape = (B, ...) with B == len(seeds)."""
    keys = per_sample_keys(base, seeds)
    return jax.vmap(lambda k: jax.random.normal(k, shape[1:], dtype))(keys)
