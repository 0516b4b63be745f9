"""attentions zoo + SE block parity vs the reference."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from oracle import load_reference_module, torch_state_dict_to_numpy
from tdanet_tpu.models import attentions as az
from tdanet_tpu.models import flat_torch_to_pytree


def transfer(t):
    return flat_torch_to_pytree(torch_state_dict_to_numpy(t))


def test_linear_attention():
    ref = load_reference_module("attentions.py")
    torch.manual_seed(0)
    C = 32
    t = ref.LinearAttention(C, heads=4)
    t.eval()
    x = torch.randn(2, C, C)  # reference only works when L == C
    with torch.no_grad():
        want = t(x).numpy()
    j = az.LinearAttention(C, heads=4)
    got = np.asarray(j.apply(transfer(t), jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-3,
                               atol=1e-4 * np.abs(want).max())


def test_cross_attention():
    ref = load_reference_module("attentions.py")
    # reference bug: einops.einsum called with torch.einsum argument order
    # (attentions.py:114) crashes at runtime; patch to the evident intent
    # so it can serve as the numeric oracle
    ref.einsum = torch.einsum
    torch.manual_seed(1)
    t = ref.CrossAttention(48, context_dim=32, heads=4, dim_head=16)
    t.eval()
    x = torch.randn(2, 10, 48)
    ctx = torch.randn(2, 7, 32)
    with torch.no_grad():
        want = t(x, context=ctx).numpy()
    j = az.CrossAttention(48, context_dim=32, heads=4, dim_head=16)
    got = np.asarray(j.apply(transfer(t), jnp.asarray(x.numpy()),
                             jnp.asarray(ctx.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-3,
                               atol=1e-4 * np.abs(want).max())


def test_cross_attention_conv():
    ref = load_reference_module("attentions.py")
    torch.manual_seed(2)
    t = ref.CrossAttentionConv(48, heads=4, dim_head=8)
    t.eval()
    x = torch.randn(2, 10, 48)
    with torch.no_grad():
        want = t(x).numpy()
    j = az.CrossAttentionConv(48, heads=4, dim_head=8)
    got = np.asarray(j.apply(transfer(t), jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-3,
                               atol=1e-4 * np.abs(want).max())


def test_se_layer():
    ref = load_reference_module("SeBlock.py")
    torch.manual_seed(3)
    t = ref.SELayer1D(32)
    t.eval()
    x = torch.randn(2, 32, 20)
    with torch.no_grad():
        want = t(x).numpy()
    j = az.SELayer1D(32)
    got = np.asarray(j.apply(transfer(t), jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_se_basic_block():
    ref = load_reference_module("SeBlock.py")
    torch.manual_seed(4)
    t = ref.SEBasicBlock1D(32, 32)
    t.eval()  # BN eval mode = running stats, like our implementation
    x = torch.randn(2, 32, 20)
    with torch.no_grad():
        want = t(x).numpy()
    j = az.SEBasicBlock1D(32, 32)
    got = np.asarray(j.apply(transfer(t), jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
