"""Non-default-config differential fidelity ("config fuzzing").

Every registered model is fidelity-tested at one (or two) canonical
configs elsewhere; a transcription bug that hardcodes a default
(a 128-channel assumption, a depth-5 loop bound, an even-stride
lattice shortcut) would pass those and silently break users who train
at other hyperparameters — the reference supports arbitrary
out/in_channels, upsampling_depth, enc_kernel_size, num_sources and
sample_rate (TDANet_best.py:402-427 derives kernel/stride/lattice from
them). This suite sweeps deliberately awkward corners of that space
against the torch oracle, forward and gradient.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import tdanet_tpu.models as zoo
from oracle import load_reference_module, torch_state_dict_to_numpy
from tdanet_tpu.losses import PITLossWrapper, pairwise_neg_snr
from tdanet_tpu.models import TDANetBest, flat_torch_to_pytree

# (config overrides, input length) — all far from the tested defaults
BEST_CASES = [
    # 3 sources, shallow pyramid, 8 kHz
    (dict(out_channels=64, in_channels=128, upsampling_depth=3,
          enc_kernel_size=4, num_sources=3, sample_rate=8000), 4000),
    # 4 sources, depth 6 (one past the recipe's 5)
    (dict(out_channels=48, in_channels=96, upsampling_depth=6,
          enc_kernel_size=8, num_sources=4, sample_rate=8000), 6000),
    # the CLASS-DEFAULT kernel (21 ms -> K=336, stride 84) nobody trains
    (dict(out_channels=64, in_channels=128, upsampling_depth=4,
          enc_kernel_size=21, num_sources=2, sample_rate=16000), 8000),
    # odd lattice: K = 22.05 kHz * 1 ms = 22 -> stride 22//4 = 5
    # (kernel not divisible by 4; exercises the gcd/lcm pad math)
    (dict(out_channels=32, in_channels=64, upsampling_depth=4,
          enc_kernel_size=1, num_sources=2, sample_rate=22050), 5000),
    # wide bottleneck relative to separator width
    (dict(out_channels=128, in_channels=160, upsampling_depth=5,
          enc_kernel_size=2, num_sources=2, sample_rate=16000), 6000),
]


def _best_pair(cfg):
    ref = load_reference_module("TDANet_best.py")
    torch.manual_seed(0)
    full = dict(num_blocks=2, **cfg)
    tmodel = ref.TDANetBest(**full)
    tmodel.eval()
    jmodel = TDANetBest(**full)
    params = flat_torch_to_pytree(torch_state_dict_to_numpy(tmodel))
    return tmodel, jmodel, params


@pytest.mark.parametrize("cfg,T", BEST_CASES)
def test_tdanet_best_config_fuzz(cfg, T):
    tmodel, jmodel, params = _best_pair(cfg)
    torch.manual_seed(1)
    x = torch.randn(2, T)
    with torch.no_grad():
        want = tmodel(x).numpy()
    got = np.asarray(jmodel.apply(params, jnp.asarray(x.numpy())))
    assert got.shape == want.shape, (got.shape, want.shape)
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4 * scale)
    # init tree must match the torch state_dict tree at this config too
    init = jmodel.init(jax.random.PRNGKey(0))
    paths_t = {jax.tree_util.keystr(p): v.shape
               for p, v in jax.tree_util.tree_leaves_with_path(params)}
    paths_i = {jax.tree_util.keystr(p): v.shape
               for p, v in jax.tree_util.tree_leaves_with_path(init)}
    assert paths_t == paths_i


def test_gradients_match_torch_nondefault_config():
    """Grad parity away from the defaults: 3 sources (the factorial n=3
    PIT branch, pit_wrapper.py:106-131) and a depth-6 pyramid."""
    import importlib.util
    import sys

    def load_ref_loss(fname, name):
        if name in sys.modules:
            return sys.modules[name]
        spec = importlib.util.spec_from_file_location(
            name, f"/root/reference/look2hear/losses/{fname}")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    ref = load_reference_module("TDANet_best.py")
    ref_matrix = load_ref_loss("matrix.py", "ref_matrix")
    ref_pit = load_ref_loss("pit_wrapper.py", "ref_pit")

    cfg = dict(out_channels=48, in_channels=96, num_blocks=2,
               upsampling_depth=6, enc_kernel_size=4, num_sources=3,
               sample_rate=8000)
    torch.manual_seed(0)
    tmodel = ref.TDANetBest(**cfg)
    tmodel.eval()
    tloss = ref_pit.PITLossWrapper(ref_matrix.PairwiseNegSDR("snr"),
                                   pit_from="pw_mtx", threshold_byloss=True)
    torch.manual_seed(1)
    mix = torch.randn(2, 6000) * 0.1
    tgt = torch.randn(2, 3, 6000) * 0.1
    loss_t = tloss(tmodel(mix), tgt)
    loss_t.backward()
    loss_t = loss_t.detach()
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
            flat[prefix] = np.asarray(node)

    rec(grads, "")
    missing = set(tgrads) - set(flat)
    assert not missing, f"bridge lost grads for {sorted(missing)[:5]}"
    bad = []
    for name, tg in tgrads.items():
        jg = flat[name]
        scale = max(np.abs(tg).max(), 1e-6)
        err = np.abs(jg - tg).max() / scale
        if err > 5e-3:
            bad.append((name, float(err)))
    assert not bad, f"gradient mismatch at non-default config: {bad[:8]}"


VARIANT_DEPTH_CASES = [
    ("TDANet_origin.py", "TDANetOrigin", {}),
    ("TDANetOld.py", "TDANetOld", {}),
    ("TDANet_gate_variant.py", "TDANetGateVariant", {}),
]


@pytest.mark.parametrize("ref_file,cls,kw", VARIANT_DEPTH_CASES)
def test_variant_nondefault_depth_and_sources(ref_file, cls, kw):
    """Variant family at depth 5 + 3 sources (their canonical test runs
    depth 4 / 2 sources)."""
    cfg = dict(out_channels=48, in_channels=96, num_blocks=2,
               upsampling_depth=5, enc_kernel_size=4, num_sources=3,
               sample_rate=8000)
    ref = load_reference_module(ref_file)
    torch.manual_seed(0)
    tmodel = getattr(ref, cls)(**cfg, **kw)
    tmodel.eval()
    jmodel = getattr(zoo, cls)(**cfg, **kw)
    params = flat_torch_to_pytree(torch_state_dict_to_numpy(tmodel))
    torch.manual_seed(1)
    x = torch.randn(2, 4000)
    with torch.no_grad():
        want = tmodel(x).numpy()
    got = np.asarray(jmodel.apply(params, jnp.asarray(x.numpy())))
    assert got.shape == want.shape, (got.shape, want.shape)
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4 * scale)
