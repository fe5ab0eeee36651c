"""Device mesh + sharding helpers — the distribution layer.

The reference's only parallelism is Lightning DDP over NCCL (SURVEY.md §2.8).
The TPU-native equivalent is SPMD: a 1-D ``data`` mesh over all chips,
batches sharded on axis 0, parameters replicated, and XLA inserting the
gradient ``psum`` over ICI during jit partitioning. No hand-written
collectives are needed at this model scale (1–20M params); the mesh carries
an optional ``model`` axis as the designed extension point for tensor/
sequence sharding of the DiT if the model family is ever scaled up.

Multi-host (v5e pods and beyond): call ``jax.distributed.initialize()``
before ``make_mesh`` and the same code paths shard over DCN+ICI.
"""

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshSpec:
    """Logical mesh description. axes: ('data',) or ('data', 'model')."""

    data: int = -1  # -1 → all remaining devices
    model: int = 1

    def shape(self, n_devices: int):
        model = max(self.model, 1)
        data = self.data if self.data > 0 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} does not cover {n_devices} devices"
            )
        return data, model


def make_mesh(
    spec: Optional[MeshSpec] = None, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Build a ('data', 'model') mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    spec = spec or MeshSpec()
    data, model = spec.shape(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, full_local: bool = False):
    """Device-put every array in a batch pytree with batch-axis sharding.

    Host-side arrays (numpy) land directly in device HBM already laid out
    for the data-parallel step — no gather/scatter afterwards. Single
    process: a plain sharded device_put. Multi-host (after
    ``jax.distributed.initialize``): with ``full_local=False`` the batch is
    this process's LOCAL shard — rows for the data-axis positions owned by
    local devices — and the global array is assembled with
    ``jax.make_array_from_process_local_data`` (the per-host feeding
    pattern; each host loads only its slice, see Loader process_shard).
    With ``full_local=True`` every process holds the identical FULL batch
    (Loader.full_batch_feed — the fallback for ragged/non-divisible
    loaders); passing ``global_shape=x.shape`` makes JAX slice each host's
    addressable rows out of the full array, which also tolerates a final
    batch that does not divide evenly over the data axis.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    if full_local:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x), global_shape=np.asarray(x).shape),
            batch,
        )
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )
