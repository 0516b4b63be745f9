"""Swin Transformer / Swin-UNet fidelity vs the PyTorch reference."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from oracle import load_reference_module, torch_state_dict_to_numpy
from tdanet_tpu.models import flat_torch_to_pytree
from tdanet_tpu.models import swin as js


def transfer(t):
    return flat_torch_to_pytree(torch_state_dict_to_numpy(t))


def test_swin_transformer_matches_reference():
    ref = load_reference_module("swin_transformer.py")
    torch.manual_seed(0)
    kw = dict(img_size=16, patch_size=2, in_chans=8, num_classes=10,
              embed_dim=24, depths=[2, 2], num_heads=[3, 6], window_size=2,
              drop_path_rate=0.1)
    t = ref.SwinTransformer(**kw)
    t.eval()
    x = torch.randn(2, 8, 16, 16)
    with torch.no_grad():
        want = t(x).numpy()
    j = js.SwinTransformer(**kw)
    params = flat_torch_to_pytree(torch_state_dict_to_numpy(t))
    got = np.asarray(j.apply(params, jnp.asarray(x.numpy())))
    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4 * scale)
    init = j.init(jax.random.PRNGKey(0))
    pt = {jax.tree_util.keystr(p): v.shape
          for p, v in jax.tree_util.tree_leaves_with_path(params)}
    pi = {jax.tree_util.keystr(p): v.shape
          for p, v in jax.tree_util.tree_leaves_with_path(init)}
    assert pt == pi


def test_swin_transformer_shifted_windows():
    # larger resolution so shifted (SW-MSA) paths with masks are exercised
    ref = load_reference_module("swin_transformer.py")
    torch.manual_seed(1)
    kw = dict(img_size=32, patch_size=2, in_chans=4, num_classes=5,
              embed_dim=16, depths=[2], num_heads=[2], window_size=4)
    t = ref.SwinTransformer(**kw)
    t.eval()
    x = torch.randn(2, 4, 32, 32)
    with torch.no_grad():
        want = t(x).numpy()
    j = js.SwinTransformer(**kw)
    got = np.asarray(j.apply(transfer(t), jnp.asarray(x.numpy())))
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4 * scale)


def test_swin_unet_sys_matches_reference():
    ref = load_reference_module("swin_unet.py")
    torch.manual_seed(2)
    # the reference decoder hard-codes x_downsample[3 - inx]
    # (swin_unet.py:783) so it only works with exactly 4 stages
    kw = dict(img_size=16, patch_size=2, in_chans=12, num_classes=12,
              embed_dim=8, depths=[1, 1, 1, 1], depths_decoder=[1, 1, 1, 1],
              num_heads=[1, 2, 4, 8], window_size=2, dim_scale=2)
    t = ref.SwinTransformerSys(**kw)
    t.eval()
    # reference forward reshapes (B, L, C) tokens into sqrt(C) images
    x = torch.randn(2, 12, 256)  # C=256 -> 16x16
    with torch.no_grad():
        want = t(x).numpy()
    j = js.SwinTransformerSys(**kw)
    params = transfer(t)
    got = np.asarray(j.apply(params, jnp.asarray(x.numpy())))
    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4 * scale)
    init = j.init(jax.random.PRNGKey(0))
    pt = {jax.tree_util.keystr(p): v.shape
          for p, v in jax.tree_util.tree_leaves_with_path(params)}
    pi = {jax.tree_util.keystr(p): v.shape
          for p, v in jax.tree_util.tree_leaves_with_path(init)}
    assert pt == pi


def test_swin_unet_custom_matches_reference():
    ref = load_reference_module("swin_unet.py")
    torch.manual_seed(3)
    kw = dict(img_size=(16, 16), patch_size=(2, 2), in_chans=3,
              num_classes=5, embed_dim=8, depths=[1, 1, 1, 1],
              depths_decoder=[1, 1, 1, 1], num_heads=[1, 2, 4, 8],
              window_size=2)
    t = ref.SwinTransformerSysCustom(**kw)
    t.eval()
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        want = t(x).numpy()
    j = js.SwinTransformerSysCustom(**kw)
    params = transfer(t)
    got = np.asarray(j.apply(params, jnp.asarray(x.numpy())))
    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4 * scale)
