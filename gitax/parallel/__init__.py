from .mesh import (
    make_mesh,
    make_mesh_from_shape,
    param_partition_specs,
    batch_partition_specs,
    shard_params,
)
from .mesh import (
    zero1_partition_specs,
    zero1_shard_opt_state,
)
