"""Forward fidelity of the TDANet variant family vs the PyTorch reference
(weights transferred through the structural bridge)."""
import numpy as np
import pytest
import torch

import jax

import tdanet_tpu.models as zoo
from oracle import load_reference_module, torch_state_dict_to_numpy
from tdanet_tpu.models import flat_torch_to_pytree

SMALL = dict(out_channels=64, in_channels=128, num_blocks=2,
             upsampling_depth=4, enc_kernel_size=4, num_sources=2,
             sample_rate=8000)

CASES = [
    # (ref_file, class_name, extra torch kwargs, extra jax kwargs)
    ("TDANet_yang.py", "TDANetYang", {"feat_len": 100}, {"feat_len": 100}),
    ("TDANet_origin.py", "TDANetOrigin", {}, {}),
    ("TDANetOld.py", "TDANetOld", {}, {}),
    ("TDANet.py", "TDANet", {"feat_len": 100}, {"feat_len": 100}),
    ("TDANet_no_drop.py", "TDANetNoDrop", {}, {}),
    ("TDANet_ULayer_num.py", "TDANetULayerNum", {}, {}),
    ("TDANet_gate_variant.py", "TDANetGateVariant", {}, {}),
    ("TDANet_mult_tes.py", "TDANetMultRes",
     {"feat_len": 100, "kernels": 4}, {"feat_len": 100, "kernels": 4}),
    ("TDANet_attn.py", "TDANetAttn", {"feat_len": 100}, {"feat_len": 100}),
]


def compare(ref_file, cls_name, tkw, jkw, T=4000, config=None):
    cfg = dict(config or SMALL)
    ref = load_reference_module(ref_file)
    torch.manual_seed(0)
    tmodel = getattr(ref, cls_name)(**cfg, **tkw)
    tmodel.eval()
    jmodel = getattr(zoo, cls_name)(**cfg, **jkw)
    params = flat_torch_to_pytree(torch_state_dict_to_numpy(tmodel))
    torch.manual_seed(1)
    x = torch.randn(2, T)
    with torch.no_grad():
        want = tmodel(x).numpy()
    got = np.asarray(jmodel.apply(params, jax.numpy.asarray(x.numpy())))
    assert got.shape == want.shape, (got.shape, want.shape)
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4 * scale)
    # init must produce the exact same pytree structure/shapes
    init = jmodel.init(jax.random.PRNGKey(0))
    paths_t = {jax.tree_util.keystr(p): v.shape
               for p, v in jax.tree_util.tree_leaves_with_path(params)}
    paths_i = {jax.tree_util.keystr(p): v.shape
               for p, v in jax.tree_util.tree_leaves_with_path(init)}
    assert paths_t == paths_i


@pytest.mark.parametrize("ref_file,cls,tkw,jkw", CASES)
def test_variant_forward_matches_reference(ref_file, cls, tkw, jkw):
    compare(ref_file, cls, tkw, jkw)


def test_tdanet_chunk_matches_reference():
    cfg = dict(out_channels=64, in_channels=128, num_blocks=2,
               upsampling_depth=4, num_sources=2, sample_rate=8000)
    ref = load_reference_module("TDANet_chunk.py")
    torch.manual_seed(0)
    tmodel = ref.TDANetChunk(**cfg, n_chunk=32)
    tmodel.eval()
    jmodel = zoo.TDANetChunk(**cfg, n_chunk=32)
    state = torch_state_dict_to_numpy(tmodel)
    # the reference class defines an unused encoder/decoder; our init
    # omits them, so drop before the structural check
    state = {k: v for k, v in state.items()
             if not k.startswith(("encoder", "decoder"))}
    params = flat_torch_to_pytree(state)
    torch.manual_seed(1)
    x = torch.randn(2, 32 * 125)  # divisible by n_chunk
    with torch.no_grad():
        want = tmodel(x).numpy()
    got = np.asarray(jmodel.apply(params, jax.numpy.asarray(x.numpy())))
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4 * scale)


def test_tdanet_attn_stride_mode():
    ref = load_reference_module("TDANet_attn.py")
    cfg = dict(SMALL)
    torch.manual_seed(0)
    tmodel = getattr(ref, "TDANetAttn")(**cfg, feat_len=100, fixed_len=256,
                                        stride=8)
    tmodel.eval()
    jmodel = zoo.TDANetAttn(**cfg, feat_len=100, fixed_len=256, stride=8)
    params = flat_torch_to_pytree(torch_state_dict_to_numpy(tmodel))
    torch.manual_seed(1)
    x = torch.randn(2, 1600)
    with torch.no_grad():
        want = tmodel(x).numpy()
    got = np.asarray(jmodel.apply(params, jax.numpy.asarray(x.numpy())))
    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4 * scale)


def test_registry_has_all_variants():
    from tdanet_tpu.models import available_models
    names = available_models()
    for n in ("tdanetbest", "tdanetyang", "tdanetorigin", "tdanetold",
              "tdanet", "tdanetnodrop", "tdanetulayernum", "tdanetchunk",
              "tdanetmultres", "tdanetattn", "tdanetgatevariant"):
        assert n in names, n
