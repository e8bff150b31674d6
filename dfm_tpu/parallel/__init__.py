from .mesh import (DATA_AXIS, create_mesh, data_parallel_specs, replicate,
                   shard_batch)
