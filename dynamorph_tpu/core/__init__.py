from .constants import CHANNEL_MAX, CHANNEL_VAR, EPS
from .mesh import make_mesh, batch_sharding, replicated_sharding, shard_batch
