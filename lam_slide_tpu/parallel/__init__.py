from lam_slide_tpu.parallel.mesh import (
    MeshSpec,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from lam_slide_tpu.parallel.ring_attention import (
    ring_attention,
    sequence_parallel_attention,
)

__all__ = [
    "MeshSpec",
    "batch_sharding",
    "make_mesh",
    "replicated",
    "ring_attention",
    "sequence_parallel_attention",
    "shard_batch",
]
