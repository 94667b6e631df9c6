from xmc_gan_tpu.parallel.mesh import (
    make_mesh,
    batch_shardings,
    state_shardings,
    shard_batch,
    replicate,
)

__all__ = [
    "make_mesh",
    "batch_shardings",
    "state_shardings",
    "shard_batch",
    "replicate",
]
