from .mesh import (make_mesh, data_sharding, replicated, shard_batch,
                   replicate, local_batch_slice, DATA_AXIS)
