from .mesh import batch_shard, make_mesh, sharded_batch_apply
from .scaling import weak_scaling
