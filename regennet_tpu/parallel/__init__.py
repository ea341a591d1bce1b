from regennet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    param_shardings,
    shard_batch,
    shard_params,
)
