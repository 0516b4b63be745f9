"""2-D TransXNet classifier parity vs the PyTorch reference."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from oracle import load_reference_module, torch_state_dict_to_numpy
from tdanet_tpu.models import flat_torch_to_pytree
from tdanet_tpu.models.transxnet2d import TransXNet2D

TINY = {"layers": [1, 1, 1, 1], "embed_dims": [16, 32, 48, 64],
        "kernel_size": [3] * 4, "num_groups": [2] * 4,
        "sr_ratio": [4, 2, 2, 1], "num_heads": [1, 2, 2, 4],
        "mlp_ratios": [2] * 4, "layer_scale_init_value": 1e-5}


def test_transxnet2d_matches_reference():
    ref = load_reference_module("TransXNet.py")
    torch.manual_seed(0)
    t = ref.TransXNet(image_size=32, arch=TINY, in_chans=3, num_classes=7)
    t.eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        want = t(x).numpy()
    j = TransXNet2D(image_size=32, arch=TINY, in_chans=3, num_classes=7)
    params = flat_torch_to_pytree(torch_state_dict_to_numpy(t))
    got = np.asarray(j.apply(params, jnp.asarray(x.numpy())))
    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3 * scale)
    init = j.init(jax.random.PRNGKey(0))
    pt = {jax.tree_util.keystr(p): v.shape
          for p, v in jax.tree_util.tree_leaves_with_path(params)}
    pi = {jax.tree_util.keystr(p): v.shape
          for p, v in jax.tree_util.tree_leaves_with_path(init)}
    assert pt == pi
