from ivf_tpu.parallel.mesh import (
    get_mesh,
    get_2d_mesh,
    get_multislice_mesh,
    multislice_sharding,
    shard_batch,
    replicate,
    data_sharding,
    spatial_sharding,
    tensor_parallel_variables,
)
from ivf_tpu.parallel.multihost import (
    ShardedDataset,
    global_device_batch,
    initialize as initialize_multihost,
    process_shard,
)
from ivf_tpu.parallel.pipeline import (
    i3d_stage_fns,
    pipeline_apply,
    stage_io_shapes,
)

__all__ = [
    "ShardedDataset",
    "global_device_batch",
    "initialize_multihost",
    "process_shard",
    "get_mesh",
    "get_2d_mesh",
    "get_multislice_mesh",
    "multislice_sharding",
    "shard_batch",
    "replicate",
    "data_sharding",
    "spatial_sharding",
    "tensor_parallel_variables",
    "i3d_stage_fns",
    "pipeline_apply",
    "stage_io_shapes",
]
