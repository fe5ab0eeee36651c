"""Jitted train/eval step factories.

One ``train_step`` fuses forward, backward, optimizer update and EMA into a
single XLA program with donated state buffers (the reference spreads these
over Lightning hooks: training_step → backward → optimizer →
on_before_zero_grad EMA; lightning_base.py:78-80). Under a data mesh the
same step is jitted with batch-sharded inputs and replicated state — XLA's
SPMD partitioner inserts the gradient all-reduce over ICI (the NCCL
equivalent, SURVEY.md §2.8).

``loss_fn`` contract:
    loss_fn(params, constants, batch, rng, train) -> (loss, metrics_dict)
"""

from typing import Callable, Optional

import jax
import optax
from jax import numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lam_slide_tpu.nn.ema import ema_update
from lam_slide_tpu.train.state import TrainState


def make_train_step(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    ema_decay: Optional[float] = 0.999,
    mesh: Optional[Mesh] = None,
    donate_state: bool = True,
    respect_committed: bool = False,
    grad_accum: int = 1,
):
    """Build a jitted ``(state, batch, rng) -> (state, metrics)`` step.

    rng handling: the caller passes one base key; it is folded with the step
    counter so every step (and every resume from a checkpoint) draws a
    deterministic, distinct stream — the reference leans on torch global RNG
    (SURVEY.md §7 hard part 6).

    ``grad_accum > 1``: the batch is split into that many microbatches and
    the forward+backward runs as a ``lax.scan`` over them, averaging grads
    and metrics before ONE optimizer/EMA update — same optimization
    trajectory as the full batch (per-microbatch mean losses average to the
    full-batch mean for equal microbatch sizes), at 1/accum the activation
    memory. This is how the reference's 80 GB-card batch sizes (e.g. MD17
    stage-2 bs=64, measured 18.4 GB) fit one 16 GB v5e. The leading batch
    axis of every batch leaf must divide by grad_accum.

    ``respect_committed=True`` (tensor parallelism, parallel/tp.py): no
    explicit in/out shardings are pinned — inputs keep their committed
    layouts (TP-sharded params/EMA/moments from ``tp.shard_train_state``,
    data-sharded batch from ``shard_batch``) and GSPMD propagates them
    through the step, so updated params come back in the same TP layout.
    The default replicated-params pinning would silently all-gather a TP
    state back to replicated.
    """

    def _inner(params, ema_params, opt_state, step_ct, constants, batch, rng):
        rng = jax.random.fold_in(rng, step_ct)

        if grad_accum > 1:
            micro = jax.tree.map(
                lambda x: x.reshape(grad_accum, x.shape[0] // grad_accum,
                                    *x.shape[1:]), batch)

            def body(carry, inp):
                acc_grads, acc_loss, acc_metrics, i = carry
                mb = inp

                def _loss(p):
                    return loss_fn(p, constants, mb,
                                   jax.random.fold_in(rng, i), True)

                (loss, metrics), grads = jax.value_and_grad(
                    _loss, has_aux=True)(params)
                acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
                acc_metrics = jax.tree.map(jnp.add, acc_metrics, dict(metrics))
                return (acc_grads, acc_loss + loss, acc_metrics, i + 1), None

            zero_grads = jax.tree.map(jnp.zeros_like, params)
            # abstract-trace one microbatch for the metrics structure
            metrics_shape = jax.eval_shape(
                lambda p: loss_fn(p, constants,
                                  jax.tree.map(lambda x: x[0], micro),
                                  rng, True)[1], params)
            zero_metrics = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), metrics_shape)
            (grads, loss, metrics, _), _ = jax.lax.scan(
                body, (zero_grads, jnp.zeros(()), dict(zero_metrics),
                       jnp.int32(0)), micro)
            inv = 1.0 / grad_accum
            grads = jax.tree.map(lambda g: g * inv, grads)
            loss = loss * inv
            metrics = jax.tree.map(lambda m: m * inv, metrics)
        else:
            def _loss(p):
                return loss_fn(p, constants, batch, rng, True)

            (loss, metrics), grads = jax.value_and_grad(
                _loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_params is not None:
            ema_params = ema_update(ema_params, params, ema_decay)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, ema_params, opt_state, step_ct + 1, metrics

    kwargs = {}
    if donate_state:
        # Donate only the mutated slots; constants (frozen stage-1 weights)
        # pass through untouched and must stay alive for eval/sampling code
        # holding references outside the step.
        kwargs["donate_argnums"] = (0, 1, 2, 3)
    if mesh is not None and not respect_committed:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        kwargs["in_shardings"] = (repl, repl, repl, repl, repl, data, repl)
        kwargs["out_shardings"] = repl
    jitted = jax.jit(_inner, **kwargs)

    def step(state: TrainState, batch, rng):
        params, ema_params, opt_state, step_ct, metrics = jitted(
            state.params, state.ema_params, state.opt_state, state.step,
            state.constants, batch, rng,
        )
        new_state = state.replace(
            step=step_ct, params=params, ema_params=ema_params, opt_state=opt_state
        )
        return new_state, metrics

    # The raw (unjitted) step body, exposed for measurement harnesses that
    # must chain steps in-graph with lax.scan: over the tunneled TPU each
    # dispatch+readback costs ~27 ms wall, which swamps sub-10 ms steps
    # (docs/PERF.md measurement discipline) — only an in-graph chain
    # measures those honestly.
    step.inner = _inner
    return step


def make_eval_step(loss_fn: Callable, mesh: Optional[Mesh] = None, use_ema: bool = True,
                   respect_committed: bool = False):
    """Build a jitted ``(state, batch, rng) -> metrics`` step on EMA weights.

    Mirrors the reference's EMA swap-in for validation
    (lightning_base.py:87-96) without the swap: we just evaluate
    ``state.ema_params``. ``respect_committed`` as in ``make_train_step``
    (keeps a TP-sharded state in its layout instead of gathering it).
    """

    def step(state: TrainState, batch, rng):
        params = state.ema_params if (use_ema and state.ema_params is not None) else state.params
        loss, metrics = loss_fn(params, state.constants, batch, rng, False)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    kwargs = {}
    if mesh is not None and not respect_committed:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        kwargs["in_shardings"] = (repl, data, repl)
        kwargs["out_shardings"] = repl
    return jax.jit(step, **kwargs)
