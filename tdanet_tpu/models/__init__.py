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
from tdanet_tpu.models import attentions, emcad, swin, transxnet, \
    transxnet2d
from tdanet_tpu.models.attentions import SEBasicBlock1D, SELayer1D
from tdanet_tpu.models.swin import SwinTransformer, SwinTransformerSys, \
    SwinTransformerSysCustom
from tdanet_tpu.models.tdanet_best import TDANetBest
from tdanet_tpu.models.transxnet2d import TransXNet2D
from tdanet_tpu.models.tdanet_emcad import (
    TDANetChannelFusion,
    TDANetDynamicDownsample,
    TDANetEMCAD,
    TDANetEMCAD_v1,
    TDANetEMCADF1,
    TDANetEMCADv1_3,
    TDANetEMCADv1_4,
    TDANetEMCADv1_5,
    TDANetEMCADv1_6,
    TDANetEMCADv1_6_FCDyConv,
    TDANetEMCADv1_6_Final,
    TDANetEMCADv1_6_LAOpt1,
    TDANetEMCADv1_6_noASG,
    TDANetEMCADv1_6_noCBAM,
    TDANetEMCADv1_6_noCBAM_laopt3,
    TDANetEMCADv1_6_noCBAM_laopt4,
    TDANetEMCADv1_6_noCBAM_laopt5,
    TDANetEMCADv1_6_noIDConv,
    TDANetEMCADv1_6_noMMLP,
    TDANetGateOSRA,
    TDANetMSFFN,
    TDANetTranXNet,
)
from tdanet_tpu.models.tdanet_variants import (
    TDANetV2,
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
    "TDANetChannelFusion", "TDANetDynamicDownsample", "TDANetEMCAD",
    "TDANetEMCAD_v1", "TDANetEMCADF1", "TDANetEMCADv1_3",
    "TDANetEMCADv1_4", "TDANetEMCADv1_5", "TDANetEMCADv1_6",
    "TDANetEMCADv1_6_FCDyConv", "TDANetEMCADv1_6_Final",
    "TDANetEMCADv1_6_LAOpt1", "TDANetEMCADv1_6_noASG",
    "TDANetEMCADv1_6_noCBAM", "TDANetEMCADv1_6_noCBAM_laopt3",
    "TDANetEMCADv1_6_noCBAM_laopt4", "TDANetEMCADv1_6_noCBAM_laopt5",
    "TDANetEMCADv1_6_noIDConv", "TDANetEMCADv1_6_noMMLP",
    "TDANetGateOSRA", "TDANetMSFFN", "TDANetTranXNet", "TDANetV2",
    "attentions", "emcad", "swin", "transxnet", "transxnet2d",
    "SwinTransformer", "SwinTransformerSys", "SwinTransformerSysCustom",
    "TransXNet2D",
    # name-parity with look2hear.models.__all__ (SeBlock.py:26)
    "SEBasicBlock1D", "SELayer1D",
]
