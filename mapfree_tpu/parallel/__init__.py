from mapfree_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicated,
    shard_batch,
)
from mapfree_tpu.parallel.multihost import (
    merge_submissions,
    run_sharded_sweep,
    shard_scenes,
)
