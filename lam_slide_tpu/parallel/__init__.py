from lam_slide_tpu.parallel.mesh import (
    MeshSpec,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from lam_slide_tpu.parallel.fsdp import (
    shard_train_state_fsdp,
    tree_fsdp_shardings,
)
from lam_slide_tpu.parallel.ring_attention import (
    ring_attention,
    sequence_parallel_attention,
)
from lam_slide_tpu.parallel.tp import (
    shard_train_state,
    tree_tp_shardings,
)

__all__ = [
    "MeshSpec",
    "batch_sharding",
    "make_mesh",
    "replicated",
    "ring_attention",
    "sequence_parallel_attention",
    "shard_batch",
    "shard_train_state",
    "shard_train_state_fsdp",
    "tree_fsdp_shardings",
    "tree_tp_shardings",
]
