from .constants import CHANNEL_MAX, CHANNEL_VAR, EPS
from .mesh import (make_mesh, batch_sharding, replicated_sharding,
                   shard_batch, init_multihost, put_global,
                   is_multiprocess, is_main_process)
