from .mesh import (
    make_mesh,
    param_partition_specs,
    batch_partition_specs,
    shard_params,
)
