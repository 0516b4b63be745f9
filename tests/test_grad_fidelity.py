"""Training-path fidelity: gradients of the PIT loss w.r.t. parameters
match torch autograd on identical weights (eval mode, no stochastic ops).
This is the strongest guarantee that training in this framework follows
the same loss surface as the reference."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from oracle import load_reference_module, torch_state_dict_to_numpy
from tdanet_tpu.losses import PITLossWrapper, pairwise_neg_snr
from tdanet_tpu.models import TDANetBest, flat_torch_to_pytree


def test_gradients_match_torch():
    import importlib.util
    import sys
    ref = load_reference_module("TDANet_best.py")

    def load_ref_loss(fname, name):
        if name in sys.modules:
            return sys.modules[name]
        spec = importlib.util.spec_from_file_location(
            name, f"/root/reference/look2hear/losses/{fname}")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    ref_matrix = load_ref_loss("matrix.py", "ref_matrix")
    ref_pit = load_ref_loss("pit_wrapper.py", "ref_pit")

    torch.manual_seed(0)
    cfg = dict(out_channels=64, in_channels=128, num_blocks=2,
               upsampling_depth=4, enc_kernel_size=4, num_sources=2,
               sample_rate=8000)
    tmodel = ref.TDANetBest(**cfg)
    tmodel.eval()  # disable dropout/droppath so grads are deterministic
    tloss = ref_pit.PITLossWrapper(ref_matrix.PairwiseNegSDR("snr"),
                                   pit_from="pw_mtx", threshold_byloss=True)
    torch.manual_seed(1)
    mix = torch.randn(2, 4000) * 0.1
    tgt = torch.randn(2, 2, 4000) * 0.1

    loss_t = tloss(tmodel(mix), tgt)
    loss_t.backward()
    tgrads = {k: p.grad.detach().numpy()
              for k, p in tmodel.named_parameters() if p.grad is not None}

    jmodel = TDANetBest(**cfg)
    params = flat_torch_to_pytree(torch_state_dict_to_numpy(tmodel))
    jloss = PITLossWrapper(pairwise_neg_snr, pit_from="pw_mtx",
                           threshold_byloss=True)

    def loss_fn(p):
        est = jmodel.apply(p, jnp.asarray(mix.numpy()), training=False)
        return jloss(est, jnp.asarray(tgt.numpy()))

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)

    flat = {}

    def rec(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{prefix}.{k}" if prefix else k)
        else:
            flat[prefix] = np.asarray(v if not hasattr(node, "shape")
                                      else node)
    rec(grads, "")

    n_checked = 0
    for name, tg in tgrads.items():
        jg = flat.get(name)
        assert jg is not None, f"missing grad for {name}"
        scale = max(np.abs(tg).max(), 1e-6)
        np.testing.assert_allclose(
            jg, tg, rtol=2e-2, atol=2e-3 * scale,
            err_msg=f"grad mismatch at {name}")
        n_checked += 1
    assert n_checked > 50  # every torch parameter was compared
