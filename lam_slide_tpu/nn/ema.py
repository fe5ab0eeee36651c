"""Exponential moving average of parameter pytrees.

The reference mutates a cloned state_dict in place
(src/modules/ema.py:44-61) and swaps weights in/out around validation.
Functionally this is a one-liner over pytrees; evaluation simply applies the
model with ``ema_params`` — no swap dance needed.
"""

import jax
from jax import numpy as jnp


def ema_init(params):
    # Real copies, not aliases: the train step donates the whole TrainState,
    # and XLA rejects donating the same buffer through two pytree leaves.
    return jax.tree.map(jnp.copy, params)


def ema_update(ema_params, params, decay: float):
    """copy = decay * copy + (1 - decay) * param (ema.py:44-61)."""
    d = jnp.asarray(decay)
    return jax.tree.map(lambda e, p: e - (1.0 - d) * (e - p.astype(e.dtype)), ema_params, params)
