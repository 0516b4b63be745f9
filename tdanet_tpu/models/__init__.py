"""Model registry and architectures (reference: look2hear/models)."""

from tdanet_tpu.models.base import (
    BaseModel,
    available_models,
    flat_torch_to_pytree,
    get,
    load_torch_checkpoint,
    pytree_to_flat_torch,
    register_model,
)
from tdanet_tpu.models.tdanet_best import TDANetBest
from tdanet_tpu.models.tdanet_variants import (
    TDANet,
    TDANetAttn,
    TDANetChunk,
    TDANetGateVariant,
    TDANetMultRes,
    TDANetNoDrop,
    TDANetOld,
    TDANetOrigin,
    TDANetULayerNum,
    TDANetYang,
)

__all__ = [
    "BaseModel", "available_models", "flat_torch_to_pytree", "get",
    "load_torch_checkpoint", "pytree_to_flat_torch", "register_model",
    "TDANetBest", "TDANet", "TDANetAttn", "TDANetChunk",
    "TDANetGateVariant", "TDANetMultRes", "TDANetNoDrop", "TDANetOld",
    "TDANetOrigin", "TDANetULayerNum", "TDANetYang",
]
