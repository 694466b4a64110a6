from carel_tpu.parallel.mesh import make_mesh, local_device_count  # noqa: F401
from carel_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_params,
)
