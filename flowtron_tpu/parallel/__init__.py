from flowtron_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, replicated, data_sharded, shard_batch,
)
