from .mesh import make_mesh
from .sharding import (batch_spec, param_spec, replicate, shard_batch,
                       shard_params, shard_pytree_batch)
