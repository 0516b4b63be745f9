"""Fidelity for the reference's unused-but-defined TDANet.py research
modules (SAM1D, Mlp, SAMLA, AdaLN, UConvBlockV1) — weight transfer +
forward parity and init pytree structure."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from oracle import load_reference_module, torch_state_dict_to_numpy
from tdanet_tpu.models import flat_torch_to_pytree
from tdanet_tpu.models import tdanet_experimental as tx


def transfer(t):
    return flat_torch_to_pytree(torch_state_dict_to_numpy(t))


def _same_tree(a, b, path=""):
    assert isinstance(a, dict) == isinstance(b, dict), path
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _same_tree(a[k], b[k], f"{path}.{k}")


def check(jmod, tmod, want, *args, rtol=2e-3):
    tmod.eval()
    with torch.no_grad():
        want = want().numpy()
    got = np.asarray(jmod.apply(transfer(tmod), *args))
    _same_tree(jmod.init(jax.random.PRNGKey(0)), transfer(tmod))
    np.testing.assert_allclose(got, want, rtol=rtol,
                               atol=1e-4 * np.abs(want).max())


def test_sam1d():
    ref = load_reference_module("TDANet.py")
    torch.manual_seed(0)
    t = ref.SAM1D(32, ca_num_heads=4)
    x = torch.randn(2, 32, 20)
    check(tx.SAM1D(32, ca_num_heads=4), t, lambda: t(x),
          jnp.asarray(x.numpy()))


def test_mlp():
    ref = load_reference_module("TDANet.py")
    torch.manual_seed(1)
    t = ref.Mlp(24, 48)
    x = torch.randn(2, 24, 30)
    check(tx.Mlp(24, 48), t, lambda: t(x), jnp.asarray(x.numpy()))


def test_samla_discards_conv_stack():
    ref = load_reference_module("TDANet.py")
    torch.manual_seed(2)
    t = ref.SAMLA(32, 32, 32, kernel=5)
    xl = torch.randn(2, 32, 40)
    xg = torch.randn(2, 32, 10)
    check(tx.SAMLA(32, 32, 32, kernel=5), t, lambda: t(xl, xg),
          jnp.asarray(xl.numpy()), jnp.asarray(xg.numpy()))


def test_adaln():
    ref = load_reference_module("TDANet.py")
    torch.manual_seed(3)
    t = ref.AdaLN(40, 10, 16)
    xl = torch.randn(2, 16, 40)
    xg = torch.randn(2, 16, 10)
    check(tx.AdaLN(40, 10, 16), t, lambda: t(xl, xg),
          jnp.asarray(xl.numpy()), jnp.asarray(xg.numpy()))


def test_uconvblock_v1():
    ref = load_reference_module("TDANet.py")
    torch.manual_seed(4)
    t = ref.UConvBlockV1(out_channels=16, in_channels=32,
                         upsampling_depth=4, feat_len=40)
    x = torch.randn(2, 16, 40)
    check(tx.UConvBlockV1(out_channels=16, in_channels=32,
                          upsampling_depth=4), t, lambda: t(x),
          jnp.asarray(x.numpy()))


def test_yang_conv_encoder():
    ref = load_reference_module("TDANet_yang.py")
    torch.manual_seed(5)
    t = ref.ConvEncoder(enc_kernel_size=4, sample_rate=8000, kernels=3)
    x = torch.randn(2, 1, 4000)
    check(tx.YangConvEncoder(enc_kernel_size=4, sample_rate=8000,
                             kernels=3), t, lambda: t(x),
          jnp.asarray(x.numpy()))
