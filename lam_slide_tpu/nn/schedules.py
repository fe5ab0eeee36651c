"""Learning-rate schedules.

Replaces the reference's per-step LR mutation via a Lightning callback
(src/modules/schedulers.py + src/callbacks/config_lr_scheduler.py) with a
pure optax schedule computed up-front from steps_per_epoch.
"""

import math

from jax import numpy as jnp


def linear_warmup_cosine(
    base_lr: float,
    warmup_epochs: int,
    max_epochs: int,
    steps_per_epoch: int,
    min_lr: float = 0.0,
):
    """LinearWarmupCosineAnnealingLR semantics (schedulers.py:6-41).

    Step counter is the optimizer step; warmup_epochs == 0 → pure cosine.
    """
    warmup_steps = warmup_epochs * steps_per_epoch
    max_steps = max(max_epochs * steps_per_epoch, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32) + 1.0
        warm = base_lr * step / jnp.maximum(warmup_steps, 1)
        progress = (step - warmup_steps) / jnp.maximum(max_steps - warmup_steps, 1)
        progress = jnp.clip(progress, 0.0, 1.0)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (1.0 + jnp.cos(math.pi * progress))
        return jnp.where(step <= warmup_steps, warm, cos)

    return schedule


def warmup_cosine_per_epoch(
    base_lr: float,
    warmup_epochs: int,
    total_epochs: int,
    steps_per_epoch: int,
    eta_min: float = 0.0,
):
    """Per-epoch variant (reference WarmupCosineAnnealingLR, schedulers.py:44-70):
    LR changes once per epoch, linear warmup then cosine to eta_min."""

    def schedule(step):
        epoch = jnp.floor(jnp.asarray(step, jnp.float32) / max(steps_per_epoch, 1))
        warm = base_lr * (epoch + 1.0) / jnp.maximum(warmup_epochs, 1)
        progress = (epoch - warmup_epochs) / jnp.maximum(total_epochs - warmup_epochs, 1)
        cos = eta_min + 0.5 * (base_lr - eta_min) * (
            1.0 + jnp.cos(math.pi * jnp.clip(progress, 0.0, 1.0))
        )
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule
