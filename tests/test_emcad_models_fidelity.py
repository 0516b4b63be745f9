"""Forward fidelity of the EMCAD-era TDANet variants vs the reference."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import tdanet_tpu.models as zoo
from oracle import load_reference_module, torch_state_dict_to_numpy
from tdanet_tpu.models import flat_torch_to_pytree

T = 2000
FEAT_LEN = 258  # frames at scale 0 for T=2000, 4ms @ 8 kHz
CFG = dict(out_channels=64, in_channels=128, num_blocks=1,
           upsampling_depth=5, enc_kernel_size=4, num_sources=2,
           sample_rate=8000, feat_len=FEAT_LEN)

CASES = [
    ("TDANet_intergral.py", "TDANetEMCAD_v1"),
    ("TDANet_intergral_v1_3.py", "TDANetEMCADv1_3"),
    ("TDANet_intergral_v1_4.py", "TDANetEMCADv1_4"),
    ("TDANet_intergral_v1_5.py", "TDANetEMCADv1_5"),
    ("TDANet_intergral_v1_6.py", "TDANetEMCADv1_6"),
    ("TDANet_intergral_v1_6_final.py", "TDANetEMCADv1_6_Final"),
    ("TDANet_intergralV1_6_noIDConv.py", "TDANetEMCADv1_6_noIDConv"),
    ("TDANet_intergral_v1_6_FCDyConv.py", "TDANetEMCADv1_6_FCDyConv"),
    ("TDANet_intergral_v1_6_LAOpt1.py", "TDANetEMCADv1_6_LAOpt1"),
    ("TDANet_intergral_v1_6_noASG.py", "TDANetEMCADv1_6_noASG"),
    ("TDANet_intergral_v1_6_noCBAM.py", "TDANetEMCADv1_6_noCBAM"),
    ("TDANet_intergral_v1_6_noMMLP.py", "TDANetEMCADv1_6_noMMLP"),
    ("TDANet_intergral_v1_6_noCBAM_laopt3.py",
     "TDANetEMCADv1_6_noCBAM_laopt3"),
    ("TDANet_intergral_v1_6_noCBAM_laopt4.py",
     "TDANetEMCADv1_6_noCBAM_laopt4"),
    ("TDANet_intergral_v1_6_noCBAM_laopt5.py",
     "TDANetEMCADv1_6_noCBAM_laopt5"),
    ("TDANet_EMCAD.py", "TDANetEMCAD"),
    ("TDANet_EMCAD_f1.py", "TDANetEMCADF1"),
    ("TDANet_dynamic_down.py", "TDANetDynamicDownsample"),
    ("TDANet_OSRA_gated.py", "TDANetGateOSRA"),
    ("TDANet_channel_fusion.py", "TDANetChannelFusion"),
    ("TDANet_MSFFN.py", "TDANetMSFFN"),
    ("TDANet_transxnet.py", "TDANetTranXNet"),
]


@pytest.mark.parametrize("ref_file,cls", CASES)
def test_era_model_matches_reference(ref_file, cls):
    ref = load_reference_module(ref_file)
    torch.manual_seed(0)
    cfg = dict(CFG)
    if cls == "TDANetChannelFusion":
        cfg.pop("feat_len")  # its Recurrent takes no feat_len
    if cls == "TDANetEMCADv1_4":
        cfg["in_channels"] = 256  # LGAG3 groups=256 hard-coded
    tmodel = getattr(ref, cls)(**cfg)
    tmodel.eval()
    jmodel = getattr(zoo, cls)(**cfg)
    state = torch_state_dict_to_numpy(tmodel)
    params = flat_torch_to_pytree(state)
    torch.manual_seed(1)
    x = torch.randn(2, T)
    with torch.no_grad():
        want = tmodel(x).numpy()
    got = np.asarray(jmodel.apply(params, jnp.asarray(x.numpy())))
    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3 * scale)
    # exact param-tree structural match
    init = jmodel.init(jax.random.PRNGKey(0))
    pt = {jax.tree_util.keystr(p): v.shape
          for p, v in jax.tree_util.tree_leaves_with_path(params)}
    pi = {jax.tree_util.keystr(p): v.shape
          for p, v in jax.tree_util.tree_leaves_with_path(init)}
    assert pt == pi
