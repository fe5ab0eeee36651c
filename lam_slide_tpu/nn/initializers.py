"""Weight initializers matching the reference's torch init conventions.

The reference initializes attention projections with
``nn.init.xavier_uniform_(w, gain=1/sqrt(2))`` (torch_modules.py:164-169,
latent_si_v31.py:127-156) and embedders with ``std=0.02`` normals. These are
expressed here as flax initializers so every module reproduces the same
init distribution (kernel shapes are (in, out) in flax vs (out, in) in torch;
xavier is symmetric in fan_in/fan_out so the distributions match).
"""

import math

from flax import linen as nn
from jax import numpy as jnp


def xavier_uniform(gain: float = 1.0):
    """torch.nn.init.xavier_uniform_ with gain: U(-a, a), a = gain*sqrt(6/(fan_in+fan_out))."""
    return nn.initializers.variance_scaling(gain**2, "fan_avg", "uniform")


# gain = 1/sqrt(2), used for all attention qkv projections in the reference.
attn_kernel_init = xavier_uniform(gain=1.0 / math.sqrt(2.0))

normal_002 = nn.initializers.normal(stddev=0.02)

zeros = nn.initializers.zeros
ones = nn.initializers.ones


def trunc_normal(stddev: float = 0.02):
    return nn.initializers.truncated_normal(stddev=stddev)


def orthogonal_rows():
    """Orthogonal init (rows orthonormal when n_rows <= n_cols).

    Mirrors ``torch.nn.init.orthogonal_`` used for the frozen entity
    embedding table (entity_embeddings.py:7-30): every entity ID gets a
    unit-norm, mutually orthogonal code vector.
    """

    def init(key, shape, dtype=jnp.float32):
        return nn.initializers.orthogonal(column_axis=-1)(key, shape, dtype)

    return init
