from disco4est_tpu.parallel.sharding import (  # noqa: F401
    element_mesh,
    shard_mesh_data,
    shard_field,
)
