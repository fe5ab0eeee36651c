"""Functional training state.

Replaces the reference's Lightning module mutation + EMA weight-swap dance
(src/models/composites/lightning_base.py:51-137) with one immutable pytree:
``{step, params, ema_params, opt_state, constants}``. Evaluation simply uses
``ema_params`` — no swap/restore; checkpoints hold both raw and EMA weights
like the reference's ``on_save_checkpoint`` (lightning_base.py:109-119).
"""

from typing import Any, Optional

import jax
import optax
from flax import struct
from jax import numpy as jnp

from lam_slide_tpu.nn.ema import ema_init


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any
    # Non-trainable collections (frozen entity-embedding tables etc.);
    # excluded from grads, optimizer and EMA, saved in checkpoints.
    constants: Any = struct.field(default=None)

    def variables(self, use_ema: bool = False):
        """Assemble the flax variable dict for apply()."""
        params = self.ema_params if use_ema else self.params
        out = {"params": params}
        if self.constants is not None:
            out["constants"] = self.constants
        return out


def create_train_state(
    variables: dict,
    tx: optax.GradientTransformation,
    ema: bool = True,
) -> TrainState:
    # Copy: the train step donates the state's param buffers; the caller's
    # ``variables`` must stay alive (re-fit, eval, a second Trainer, ...).
    params = jax.tree.map(jnp.copy, variables["params"])
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        ema_params=ema_init(params) if ema else None,
        opt_state=tx.init(params),
        constants=variables.get("constants"),
    )


def param_count(params) -> int:
    return sum(int(a.size) for a in jax.tree.leaves(params))
