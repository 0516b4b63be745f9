"""Parallelism: device meshes, shardings, collectives-by-annotation."""

from tdanet_tpu.parallel.mesh import (
    initialize_distributed,
    TDANET_TP_RULES,
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_params,
)

__all__ = [
    "TDANET_TP_RULES", "batch_sharding", "initialize_distributed",
    "make_mesh", "param_shardings",
    "replicated", "shard_params",
]
