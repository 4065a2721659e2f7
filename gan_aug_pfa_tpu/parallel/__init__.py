from .mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    param_shardings,
    replicate_sharding,
    shard_batch_arrays,
)
