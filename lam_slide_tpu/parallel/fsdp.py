"""Fully-sharded data parallelism over the ``data`` axis (GSPMD).

The reference's only parallelism is DDP with replicated parameters
(SURVEY.md §2.8). This module adds the ZeRO-3/FSDP layout as a third
mode next to plain DP and tensor parallelism (parallel/tp.py): every
parameter, EMA and optimizer-moment leaf is sharded across the ``data``
axis on its largest divisible dimension, so per-chip state memory scales
as 1/N. Expressed purely as PartitionSpecs — GSPMD inserts the
all-gathers at parameter use and keeps grads/updates in the sharded
layout; no hand collectives, exactly the TPU-native design (the
scaling-book recipe: pick a mesh, annotate shardings, let XLA insert
collectives).

At this model family's scale (1–20 M params) FSDP is about framework
completeness and the optimizer-state memory headroom it buys for scaled
configs (AdamW triples parameter memory; bs=64 MD17 stage 2 measured
18.4 GB on a 16 GB v5e — sharded state is one of the levers, next to
``TrainerConfig.grad_accum``).

Composition: ``shard_train_state_fsdp`` lays out the state; the train
step runs with ``respect_committed=True`` (the TP path's mechanism) so
the committed layouts propagate through grads, the optimizer update, and
the EMA — updated params come back FSDP-sharded. The batch shards on
``data`` as in plain DP. Leaves with no dimension divisible by the data
size stay replicated (layout never changes semantics under GSPMD).
"""

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# Leaves below this many elements replicate. Sharding a norm scale or bias
# saves nothing (bytes are trivial) and forces the partitioner to reshard
# the activations it multiplies into — the md17 smoke run showed
# "involuntary full rematerialization" SPMD warnings on exactly those ops.
MIN_SHARD_ELEMENTS = 4096


def fsdp_spec(leaf, data_size: int, min_size: int = MIN_SHARD_ELEMENTS) -> P:
    """PartitionSpec sharding the largest data_size-divisible dim."""
    if data_size <= 1 or getattr(leaf, "ndim", 0) == 0:
        return P()
    if leaf.size < min_size:
        return P()
    dims = sorted(range(leaf.ndim), key=lambda i: (-leaf.shape[i], i))
    for i in dims:
        if leaf.shape[i] >= data_size and leaf.shape[i] % data_size == 0:
            spec = [None] * leaf.ndim
            spec[i] = "data"
            return P(*spec)
    return P()


def tree_fsdp_shardings(tree: Any, mesh: Mesh,
                        min_size: int = MIN_SHARD_ELEMENTS):
    """Map every leaf to its NamedSharding under the FSDP rule."""
    data_size = int(mesh.shape.get("data", 1))
    return jax.tree.map(
        lambda l: NamedSharding(mesh, fsdp_spec(l, data_size, min_size)), tree
    )


def shard_train_state_fsdp(state, mesh: Mesh):
    """device_put a TrainState with FSDP layout: params, EMA and optimizer
    moments shard over ``data``; constants (frozen stage-1 weights, read
    every step by the whole batch) and the step counter replicate."""
    repl = NamedSharding(mesh, P())

    def put(tree):
        if tree is None:
            return None
        return jax.tree.map(
            lambda x, s: jax.device_put(x, s), tree,
            tree_fsdp_shardings(tree, mesh)
        )

    return state.replace(
        params=put(state.params),
        ema_params=put(state.ema_params),
        opt_state=put(state.opt_state),
        constants=jax.tree.map(lambda x: jax.device_put(x, repl),
                               state.constants),
        step=jax.device_put(state.step, repl),
    )
