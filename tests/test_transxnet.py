"""TransXNet 1-D library parity vs the PyTorch reference."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from oracle import load_reference_module, torch_state_dict_to_numpy
from tdanet_tpu.models import flat_torch_to_pytree
from tdanet_tpu.models import transxnet as tx

ref = None


def setup_module(module):
    global ref
    ref = load_reference_module("TransXNet.py")


def transfer(tmod):
    return flat_torch_to_pytree(torch_state_dict_to_numpy(tmod))


def check(tmod, jmod, x, atol=1e-4, args=(), jargs=None):
    tmod.eval()
    with torch.no_grad():
        want = tmod(x, *args).numpy()
    params = transfer(tmod)
    got = np.asarray(jmod.apply(params, jnp.asarray(x.numpy()),
                                *(jargs or ())))
    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=atol * scale)
    # structural init check
    init = jmod.init(jax.random.PRNGKey(0))
    pt = {jax.tree_util.keystr(p): v.shape
          for p, v in jax.tree_util.tree_leaves_with_path(params)}
    pi = {jax.tree_util.keystr(p): v.shape
          for p, v in jax.tree_util.tree_leaves_with_path(init)}
    assert pt == pi


def test_dynamic_conv1d():
    torch.manual_seed(0)
    t = ref.DynamicConv1d(32, kernel_size=3, num_groups=4)
    x = torch.randn(2, 32, 40)
    check(t, tx.DynamicConv1d(32, kernel_size=3, num_groups=4), x)


def test_dynamic_conv1d_strided():
    torch.manual_seed(1)
    t = ref.DynamicConv1d(32, kernel_size=5, num_groups=2, stride=2)
    x = torch.randn(2, 32, 40)
    check(t, tx.DynamicConv1d(32, kernel_size=5, num_groups=2, stride=2), x)


def test_fcdyconv1d():
    torch.manual_seed(2)
    t = ref.FCDyConv1d(32, in_feat=40, kernel_size=3, num_groups=4)
    x = torch.randn(2, 32, 40)
    check(t, tx.FCDyConv1d(32, in_feat=40, kernel_size=3, num_groups=4), x)


@pytest.mark.parametrize("sr_ratio,heads", [(1, 1), (2, 4)])
def test_osra_attention1d(sr_ratio, heads):
    torch.manual_seed(3)
    t = ref.Attention1D(32, num_heads=heads, sr_ratio=sr_ratio)
    x = torch.randn(2, 32, 40)
    check(t, tx.Attention1D(32, num_heads=heads, sr_ratio=sr_ratio), x)


def test_cross_attention1d():
    torch.manual_seed(4)
    t = ref.CrossAttention1D(32, num_heads=2, sr_ratio=2)
    x = torch.randn(2, 32, 40)
    ctx = torch.randn(2, 32, 24)
    t.eval()
    with torch.no_grad():
        want = t(x, context=ctx).numpy()
    jm = tx.CrossAttention1D(32, num_heads=2, sr_ratio=2)
    got = np.asarray(jm.apply(transfer(t), jnp.asarray(x.numpy()),
                              jnp.asarray(ctx.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-3,
                               atol=1e-4 * np.abs(want).max())


def test_multiscale_dwconv1d():
    torch.manual_seed(5)
    t = ref.MultiScaleDWConv1D(30)
    x = torch.randn(2, 30, 40)
    check(t, tx.MultiScaleDWConv1D(30), x)


@pytest.mark.parametrize("act", ["GELU", "ReLU", "PReLU"])
def test_mlp1d(act):
    torch.manual_seed(6)
    t = ref.Mlp1D(32, 64, act_cfg=dict(type=act))
    x = torch.randn(2, 32, 40)
    check(t, tx.Mlp1D(32, 64, act=act.lower()), x)


def test_layer_scale1d():
    torch.manual_seed(7)
    t = ref.LayerScale1D(16)
    with torch.no_grad():
        t.weight.normal_()
        t.bias.normal_()
    x = torch.randn(2, 16, 10)
    check(t, tx.LayerScale1D(16), x)


def test_hybrid_token_mixer1d():
    torch.manual_seed(8)
    t = ref.HybridTokenMixer1D(32, num_groups=2, num_heads=2, sr_ratio=2)
    x = torch.randn(2, 32, 40)
    check(t, tx.HybridTokenMixer1D(32, num_groups=2, num_heads=2,
                                   sr_ratio=2), x)


def test_block1d():
    torch.manual_seed(9)
    t = ref.Block1D(dim=32, num_groups=2, num_heads=2, sr_ratio=2,
                    act_cfg=dict(type="ReLU"))
    x = torch.randn(2, 32, 40)
    check(t, tx.Block1D(dim=32, num_groups=2, num_heads=2, sr_ratio=2,
                        act="relu"), x)
