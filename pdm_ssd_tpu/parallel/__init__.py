from .mesh import (  # noqa: F401
    make_mesh, make_mesh_for_batch, shard_batch, replicate,
    data_parallel_shardings, pad_batch_to, padded_batch_size,
)
