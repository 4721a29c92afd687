from ivf_tpu.parallel.mesh import (
    get_mesh,
    shard_batch,
    replicate,
    data_sharding,
)

__all__ = ["get_mesh", "shard_batch", "replicate", "data_sharding"]
