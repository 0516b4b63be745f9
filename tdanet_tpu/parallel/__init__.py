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
from tdanet_tpu.parallel.sequence import (
    make_sp_mesh,
    pad_for_sp,
    separate_sp,
)

__all__ = [
    "TDANET_TP_RULES", "batch_sharding", "initialize_distributed",
    "make_mesh", "make_sp_mesh", "pad_for_sp", "param_shardings",
    "replicated", "separate_sp", "shard_params",
]
