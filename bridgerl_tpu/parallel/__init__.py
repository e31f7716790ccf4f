
from .mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    put_replicated,
    replicated,
    shard_batch,
)
