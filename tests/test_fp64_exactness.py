"""fp64 forward-exactness sweep across the full model registry.

Converts "within fp32 conv noise of torch" (rtol 2e-3..5e-3 in the
fidelity suites) into "the same math as torch": the torch oracle is
constructed under ``torch.set_default_dtype(float64)`` and run in
double, the JAX side runs under ``jax.enable_x64()`` with the oracle's
weights, and the outputs must agree to 1e-12 relative — three to four
orders tighter than anything an fp32 formula error could hide under
(the round-4 nearest-interp index find proved sub-tolerance divergences
are real; measured agreement here is ~1e-15).

Two deliberate bridge differences are handled, not papered over:
- the oracle's ``pos_enc.pe`` buffer is transferred (KEEP skip-list)
  instead of regenerated — the reference forces f32 for the PE sin/cos
  (TDANet_best.py:221-226) and numpy/torch f32 transcendentals differ
  at ~1e-5, which is reference semantics, not a formula difference;
- TDANetV2 has no runnable oracle (the reference class is
  uninstantiable, TDANet-v2.py:417 passes sample_rate to
  nn.Module.__init__) and is excluded; its building blocks are the
  shared _StandardTDANet machinery pinned by every other row.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import tdanet_tpu.models as zoo
from oracle import load_reference_module, torch_state_dict_to_numpy
from tdanet_tpu.models import flat_torch_to_pytree

# keep `.pe` (see module docstring); still drop the regenerated-int
# geometry buffers
KEEP = ("relative_position_index", "attn_mask")

RTOL = 1e-12

SMALL = dict(out_channels=64, in_channels=128, num_blocks=2,
             upsampling_depth=4, enc_kernel_size=4, num_sources=2,
             sample_rate=8000)
# EMCAD-era models: depth-5 ladder + static feat_len for the RPE tables
CFG_E = dict(out_channels=64, in_channels=128, num_blocks=1,
             upsampling_depth=5, enc_kernel_size=4, num_sources=2,
             sample_rate=8000, feat_len=258)
T_SMALL, T_E = 4000, 2000

# (ref_file, class, config, T) — the same constructor configs the fp32
# fidelity suites use, so every row has a known-instantiable oracle.
CASES = [
    ("TDANet_best.py", "TDANetBest", dict(SMALL, upsampling_depth=5),
     T_SMALL),
    ("TDANet_yang.py", "TDANetYang", dict(SMALL, feat_len=100), T_SMALL),
    ("TDANet_origin.py", "TDANetOrigin", SMALL, T_SMALL),
    ("TDANetOld.py", "TDANetOld", SMALL, T_SMALL),
    ("TDANet.py", "TDANet", dict(SMALL, feat_len=100), T_SMALL),
    ("TDANet_no_drop.py", "TDANetNoDrop", SMALL, T_SMALL),
    ("TDANet_ULayer_num.py", "TDANetULayerNum", SMALL, T_SMALL),
    ("TDANet_gate_variant.py", "TDANetGateVariant", SMALL, T_SMALL),
    ("TDANet_mult_tes.py", "TDANetMultRes",
     dict(SMALL, feat_len=100, kernels=4), T_SMALL),
    ("TDANet_attn.py", "TDANetAttn", dict(SMALL, feat_len=100), T_SMALL),
    ("TDANet_intergral.py", "TDANetEMCAD_v1", CFG_E, T_E),
    ("TDANet_intergral_v1_3.py", "TDANetEMCADv1_3", CFG_E, T_E),
    ("TDANet_intergral_v1_4.py", "TDANetEMCADv1_4",
     dict(CFG_E, in_channels=256), T_E),
    ("TDANet_intergral_v1_5.py", "TDANetEMCADv1_5", CFG_E, T_E),
    ("TDANet_intergral_v1_6.py", "TDANetEMCADv1_6", CFG_E, T_E),
    ("TDANet_intergral_v1_6_final.py", "TDANetEMCADv1_6_Final", CFG_E, T_E),
    ("TDANet_intergralV1_6_noIDConv.py", "TDANetEMCADv1_6_noIDConv",
     CFG_E, T_E),
    ("TDANet_intergral_v1_6_FCDyConv.py", "TDANetEMCADv1_6_FCDyConv",
     CFG_E, T_E),
    ("TDANet_intergral_v1_6_LAOpt1.py", "TDANetEMCADv1_6_LAOpt1",
     CFG_E, T_E),
    ("TDANet_intergral_v1_6_noASG.py", "TDANetEMCADv1_6_noASG", CFG_E, T_E),
    ("TDANet_intergral_v1_6_noCBAM.py", "TDANetEMCADv1_6_noCBAM",
     CFG_E, T_E),
    ("TDANet_intergral_v1_6_noMMLP.py", "TDANetEMCADv1_6_noMMLP",
     CFG_E, T_E),
    ("TDANet_intergral_v1_6_noCBAM_laopt3.py",
     "TDANetEMCADv1_6_noCBAM_laopt3", CFG_E, T_E),
    ("TDANet_intergral_v1_6_noCBAM_laopt4.py",
     "TDANetEMCADv1_6_noCBAM_laopt4", CFG_E, T_E),
    ("TDANet_intergral_v1_6_noCBAM_laopt5.py",
     "TDANetEMCADv1_6_noCBAM_laopt5", CFG_E, T_E),
    ("TDANet_EMCAD.py", "TDANetEMCAD", CFG_E, T_E),
    ("TDANet_EMCAD_f1.py", "TDANetEMCADF1", CFG_E, T_E),
    ("TDANet_dynamic_down.py", "TDANetDynamicDownsample", CFG_E, T_E),
    ("TDANet_OSRA_gated.py", "TDANetGateOSRA", CFG_E, T_E),
    ("TDANet_channel_fusion.py", "TDANetChannelFusion",
     {k: v for k, v in CFG_E.items() if k != "feat_len"}, T_E),
    ("TDANet_MSFFN.py", "TDANetMSFFN", CFG_E, T_E),
    ("TDANet_transxnet.py", "TDANetTranXNet", CFG_E, T_E),
]


def _double_oracle(ref_file, cls, cfg):
    ref = load_reference_module(ref_file)
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        torch.manual_seed(0)
        tmodel = getattr(ref, cls)(**cfg)
    finally:
        torch.set_default_dtype(prev)
    return tmodel.double().eval()


def _assert_fp64_match(tmodel, jmodel, T):
    state = torch_state_dict_to_numpy(tmodel)
    torch.manual_seed(1)
    x = torch.randn(2, T, dtype=torch.float64)
    with torch.no_grad():
        want = tmodel(x).numpy()
    with jax.enable_x64():
        params = flat_torch_to_pytree(state, skip=KEEP)
        got = np.asarray(jmodel.apply(params, jnp.asarray(x.numpy()),
                                      compute_dtype=jnp.float64))
    assert got.dtype == np.float64
    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=RTOL * scale)


@pytest.mark.parametrize("ref_file,cls,cfg,T",
                         CASES, ids=[c[1] for c in CASES])
def test_fp64_exactness(ref_file, cls, cfg, T):
    tmodel = _double_oracle(ref_file, cls, cfg)
    jmodel = getattr(zoo, cls)(**cfg)
    _assert_fp64_match(tmodel, jmodel, T)


def test_fp64_exactness_chunk():
    cfg = dict(out_channels=64, in_channels=128, num_blocks=2,
               upsampling_depth=4, num_sources=2, sample_rate=8000,
               n_chunk=32)
    tmodel = _double_oracle("TDANet_chunk.py", "TDANetChunk", cfg)
    jmodel = zoo.TDANetChunk(**cfg)
    # the reference class defines an unused encoder/decoder; our tree
    # omits them
    state = torch_state_dict_to_numpy(tmodel)
    state = {k: v for k, v in state.items()
             if not k.startswith(("encoder", "decoder"))}
    torch.manual_seed(1)
    x = torch.randn(2, 32 * 125, dtype=torch.float64)
    with torch.no_grad():
        want = tmodel(x).numpy()
    with jax.enable_x64():
        params = flat_torch_to_pytree(state, skip=KEEP)
        got = np.asarray(jmodel.apply(params, jnp.asarray(x.numpy()),
                                      compute_dtype=jnp.float64))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=RTOL * scale)


def test_registry_coverage():
    """Every registered model appears in this sweep (or is the one
    documented oracle-less exclusion)."""
    from tdanet_tpu.models.base import _MODEL_REGISTRY
    covered = {c[1] for c in CASES} | {"TDANetChunk", "TDANetV2"}
    registered = {c.__name__ for c in _MODEL_REGISTRY.values()}
    assert registered == covered, registered ^ covered
