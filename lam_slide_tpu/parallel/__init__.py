from lam_slide_tpu.parallel.mesh import (
    MeshSpec,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = ["MeshSpec", "batch_sharding", "make_mesh", "replicated", "shard_batch"]
