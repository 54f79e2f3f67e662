"""Device-mesh parallelism utilities (data + spatial sharding)."""

from ryolo_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
    batch_sharding,
)
