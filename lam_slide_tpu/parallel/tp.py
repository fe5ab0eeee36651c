"""Tensor parallelism over the mesh's ``model`` axis (GSPMD).

The reference has no tensor parallelism (SURVEY.md §2.8: DP-only; TP noted
as the designed extension if the model family is ever scaled). The mesh
(parallel/mesh.py) has carried a ``model`` axis since round 1 as a stub;
this module makes it real for the LatentDiT: Megatron-style column/row
parallel sharding of the per-block ParallelMLPAttention matmuls,
expressed as PartitionSpecs and executed by XLA's GSPMD partitioner —
no hand collectives, exactly the TPU-native design.

Layout per DiT block (names from models/latent_dit.py):

* ``linear1`` ``[din, 3D+M]``  → ``P(None, 'model')``  (column parallel:
  each model-shard owns a slice of the fused q|k|v|mlp output features)
* ``linear1_bias`` ``[3D+M]``  → ``P('model')``
* ``linear2/kernel`` ``[D+M, D]`` → ``P('model', None)`` (row parallel:
  the contraction dim is sharded; GSPMD inserts the psum)
* everything else (norm scales, modulation, embedders, heads) replicated.

Rules are path-based, so the same function shards the parameter tree, the
EMA tree, and the optimizer moments (whose subtrees repeat the parameter
paths). Leaves whose sharded dim does not divide by the model-axis size
fall back to replicated — sharding never changes semantics under GSPMD,
only layout, so partial coverage is safe.

Scope note: this is the GSPMD matmul path. The Pallas flash-attention
custom call does not partition under GSPMD, so TP deployments route
attention through the partitionable XLA path: ``train/cli.py
--model-axis N`` sets ``ops.attention.FORCE_BACKEND = "xla"`` (the
attention FLOPs are the smaller term at DiT shapes — docs/PERF.md; the
shard_map ring wrapper in parallel/ring_attention.py remains the long-T
alternative).
"""

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_names(path) -> list:
    out = []
    for k in path:
        for attr in ("key", "name", "idx"):
            if hasattr(k, attr):
                out.append(str(getattr(k, attr)))
                break
        else:
            out.append(str(k))
    return out


def dit_tp_spec(path, leaf, model_size: int) -> P:
    """PartitionSpec for one leaf of a params/EMA/optimizer tree.

    ``scan_layers`` models stack every block param with a leading depth
    axis (``blocks/layer/...``, kernels ndim 3, biases ndim 2); the rules
    key off the TRAILING dims so both layouts shard identically — the
    depth axis is never sharded.
    """
    names = _path_names(path)
    if model_size <= 1:
        return P()
    lead = (None,) * (leaf.ndim - 2)  # scan depth axes, replicated
    if "linear1" in names and leaf.ndim >= 2:
        if leaf.shape[-1] % model_size == 0:
            return P(*lead, None, "model")
    elif "linear1_bias" in names and leaf.ndim >= 1:
        if leaf.shape[-1] % model_size == 0:
            return P(*(None,) * (leaf.ndim - 1), "model")
    elif "linear2" in names and "kernel" in names and leaf.ndim >= 2:
        if leaf.shape[-2] % model_size == 0:
            return P(*lead, "model", None)
    return P()


def tree_tp_shardings(tree: Any, mesh: Mesh):
    """Map every leaf to its NamedSharding under the DiT TP rules."""
    model_size = int(mesh.shape.get("model", 1))
    return jax.tree_util.tree_map_with_path(
        lambda p, l: NamedSharding(mesh, dit_tp_spec(p, l, model_size)), tree
    )


def shard_train_state(state, mesh: Mesh):
    """device_put a TrainState for a ('data', 'model') mesh: parameters,
    EMA, and optimizer moments take the TP layout (their committed
    shardings are respected by ``make_train_step(...,
    respect_committed=True)``); constants and step replicate."""
    repl = NamedSharding(mesh, P())

    def put(tree):
        if tree is None:
            return None
        return jax.tree.map(
            lambda x, s: jax.device_put(x, s), tree, tree_tp_shardings(tree, mesh)
        )

    return state.replace(
        params=put(state.params),
        ema_params=put(state.ema_params),
        opt_state=put(state.opt_state),
        constants=jax.tree.map(lambda x: jax.device_put(x, repl), state.constants),
        step=jax.device_put(state.step, repl),
    )
