"""End-to-end forward fidelity: TDANetBest (JAX) vs the PyTorch reference,
with weights transferred through the torch-state-dict bridge."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from oracle import load_reference_module, torch_state_dict_to_numpy
from tdanet_tpu.models import TDANetBest, flat_torch_to_pytree


def build_pair(num_blocks=2, upsampling_depth=5, enc_kernel_size=4,
               sample_rate=16000, seed=0):
    ref = load_reference_module("TDANet_best.py")
    torch.manual_seed(seed)
    tmodel = ref.TDANetBest(
        out_channels=128, in_channels=512, num_blocks=num_blocks,
        upsampling_depth=upsampling_depth, enc_kernel_size=enc_kernel_size,
        num_sources=2, sample_rate=sample_rate)
    tmodel.eval()
    jmodel = TDANetBest(
        out_channels=128, in_channels=512, num_blocks=num_blocks,
        upsampling_depth=upsampling_depth, enc_kernel_size=enc_kernel_size,
        num_sources=2, sample_rate=sample_rate)
    params = flat_torch_to_pytree(torch_state_dict_to_numpy(tmodel))
    return tmodel, jmodel, params


@pytest.mark.parametrize("T", [8000, 16000])
def test_forward_matches_reference(T):
    tmodel, jmodel, params = build_pair(num_blocks=2)
    torch.manual_seed(42)
    x = torch.randn(2, T)
    with torch.no_grad():
        want = tmodel(x).numpy()
    got = np.asarray(jmodel.apply(params, jnp.asarray(x.numpy())))
    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4 * scale)


def test_forward_matches_reference_full_depth():
    # full 16-block released-config topology (small input to keep it fast)
    tmodel, jmodel, params = build_pair(num_blocks=16)
    torch.manual_seed(7)
    x = torch.randn(1, 8000)
    with torch.no_grad():
        want = tmodel(x).numpy()
    got = np.asarray(jmodel.apply(params, jnp.asarray(x.numpy())))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4 * scale)


def test_param_count_matches_reference():
    tmodel, jmodel, params = build_pair(num_blocks=16)
    n_torch = sum(p.numel() for p in tmodel.parameters())
    n_jax = sum(int(np.prod(v.shape))
                for v in jax.tree_util.tree_leaves(params))
    assert n_jax == n_torch  # 2.35M, results.png "2.3M params"


def test_init_shapes_match_torch_state_dict():
    tmodel, jmodel, params_torch = build_pair(num_blocks=2)
    params_init = jmodel.init(jax.random.PRNGKey(0))
    flat_t = jax.tree_util.tree_leaves_with_path(params_torch)
    flat_i = jax.tree_util.tree_leaves_with_path(params_init)
    paths_t = {jax.tree_util.keystr(p): v.shape for p, v in flat_t}
    paths_i = {jax.tree_util.keystr(p): v.shape for p, v in flat_i}
    assert paths_t == paths_i
