"""Non-default-config fidelity fuzz for the EMCAD-era family.

Same intent as test_config_fuzz_fidelity for TDANetBest: the 22
EMCAD-era models are the most transcription-heavy code in the repo
(tdanet_tpu/models/tdanet_emcad.py collapses ~10.6k LoC of reference
variants into a flag matrix), so every family member is checked at TWO
deliberately awkward non-default configs, forward vs the torch oracle,
plus gradient parity for three structurally distinct representatives.

Constraints discovered by probing the reference itself (the oracle is
the arbiter of what is a supported config):
- every class with an EMCAD decoder ladder supports upsampling_depth=5
  ONLY (the MSDC/EUCB chain indexes a fixed 5-scale list — e.g.
  reference TDANet_intergral_v1_6.py:335 builds
  ``channels=[in_channels]*upsampling_depth`` but the decode loop walks
  a hardcoded ladder; depth 3/4 raise IndexError in torch too);
- TDANetEMCADv1_4 hardcodes LGAG groups=256, so in_channels must be 256
  (TDANet_intergral_v1_4.py lite-v2 grouped pconvs);
- the non-EMCAD-decoder classes (DynamicDownsample, GateOSRA,
  ChannelFusion, MSFFN, TranXNet) accept arbitrary depths — they get
  the odd-depth (3, 4) configs.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import tdanet_tpu.models as zoo
from oracle import load_reference_module, torch_state_dict_to_numpy
from tdanet_tpu.losses import PITLossWrapper, pairwise_neg_snr
from tdanet_tpu.models import flat_torch_to_pytree


from tdanet_tpu.models.tdanet_emcad import feat_len_for  # noqa: E402


# name -> (config overrides, input length)
FUZZ_CFGS = {
    # 3 sources, non-default channel ratio, 8 kHz
    "A": (dict(out_channels=48, in_channels=96, num_blocks=1,
               upsampling_depth=5, enc_kernel_size=4, num_sources=3,
               sample_rate=8000), 1600),
    # depth 4, 4 sources, wider kernel, 16 kHz (flexible classes only)
    "B": (dict(out_channels=64, in_channels=128, num_blocks=1,
               upsampling_depth=4, enc_kernel_size=8, num_sources=4,
               sample_rate=16000), 3200),
    # odd depth 3, tight channels (flexible classes only)
    "C": (dict(out_channels=32, in_channels=64, num_blocks=1,
               upsampling_depth=3, enc_kernel_size=4, num_sources=2,
               sample_rate=8000), 1600),
    # v1_4-compatible: in_channels=256 fixed, vary everything else
    "D": (dict(out_channels=96, in_channels=256, num_blocks=1,
               upsampling_depth=5, enc_kernel_size=8, num_sources=3,
               sample_rate=8000), 2400),
    # 4 sources, 2 ms kernel, 16 kHz
    "E": (dict(out_channels=80, in_channels=160, num_blocks=1,
               upsampling_depth=5, enc_kernel_size=2, num_sources=4,
               sample_rate=16000), 2000),
    # v1_4-compatible second point: 4 sources, 16 kHz
    "F": (dict(out_channels=64, in_channels=256, num_blocks=1,
               upsampling_depth=5, enc_kernel_size=4, num_sources=4,
               sample_rate=16000), 2000),
}

EMCAD_DECODER_CLASSES = [
    ("TDANet_intergral.py", "TDANetEMCAD_v1"),
    ("TDANet_intergral_v1_3.py", "TDANetEMCADv1_3"),
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
]

FLEXIBLE_CLASSES = [
    ("TDANet_dynamic_down.py", "TDANetDynamicDownsample"),
    ("TDANet_OSRA_gated.py", "TDANetGateOSRA"),
    ("TDANet_channel_fusion.py", "TDANetChannelFusion"),
    ("TDANet_MSFFN.py", "TDANetMSFFN"),
    ("TDANet_transxnet.py", "TDANetTranXNet"),
]

CASES = (
    [(f, c, k) for f, c in EMCAD_DECODER_CLASSES for k in ("A", "E")]
    + [("TDANet_intergral_v1_4.py", "TDANetEMCADv1_4", k)
       for k in ("D", "F")]
    + [(f, c, k) for f, c in FLEXIBLE_CLASSES for k in ("B", "C")]
)


def _pair(ref_file, cls, cfg_key):
    overrides, T = FUZZ_CFGS[cfg_key]
    cfg = dict(overrides)
    cfg["feat_len"] = feat_len_for(T, cfg["enc_kernel_size"],
                                   cfg["sample_rate"])
    if cls == "TDANetChannelFusion":
        cfg.pop("feat_len")  # its Recurrent takes no feat_len
    ref = load_reference_module(ref_file)
    torch.manual_seed(0)
    tmodel = getattr(ref, cls)(**cfg)
    tmodel.eval()
    jmodel = getattr(zoo, cls)(**cfg)
    params = flat_torch_to_pytree(torch_state_dict_to_numpy(tmodel))
    return tmodel, jmodel, params, T


@pytest.mark.parametrize("ref_file,cls,cfg_key", CASES)
def test_emcad_family_config_fuzz(ref_file, cls, cfg_key):
    tmodel, jmodel, params, T = _pair(ref_file, cls, cfg_key)
    torch.manual_seed(1)
    x = torch.randn(2, T)
    with torch.no_grad():
        want = tmodel(x).numpy()
    got = np.asarray(jmodel.apply(params, jnp.asarray(x.numpy())))
    assert got.shape == want.shape, (got.shape, want.shape)
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3 * scale)
    # init tree must structurally match the torch state_dict at this
    # config too (shape-hardcoding bugs show up here first)
    init = jmodel.init(jax.random.PRNGKey(0))
    pt = {jax.tree_util.keystr(p): v.shape
          for p, v in jax.tree_util.tree_leaves_with_path(params)}
    pi = {jax.tree_util.keystr(p): v.shape
          for p, v in jax.tree_util.tree_leaves_with_path(init)}
    assert pt == pi


# gradient parity at a non-default config for three structurally
# distinct representatives: the flagship ablation line (v1_6), the
# grouped-pconv lite-v2 line (v1_4), and a non-EMCAD-decoder line
# (TranXNet) at odd depth.
GRAD_CASES = [
    ("TDANet_intergral_v1_6.py", "TDANetEMCADv1_6", "A"),
    ("TDANet_intergral_v1_4.py", "TDANetEMCADv1_4", "D"),
    ("TDANet_transxnet.py", "TDANetTranXNet", "C"),
]


@pytest.mark.parametrize("ref_file,cls,cfg_key", GRAD_CASES)
def test_emcad_family_grad_fuzz(ref_file, cls, cfg_key):
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

    ref_matrix = load_ref_loss("matrix.py", "ref_matrix")
    ref_pit = load_ref_loss("pit_wrapper.py", "ref_pit")

    tmodel, jmodel, params, T = _pair(ref_file, cls, cfg_key)
    tmodel.train(False)
    n_src = tmodel(torch.zeros(1, T)).shape[1]

    tloss = ref_pit.PITLossWrapper(ref_matrix.PairwiseNegSDR("snr"),
                                   pit_from="pw_mtx",
                                   threshold_byloss=True)
    torch.manual_seed(1)
    mix = torch.randn(2, T) * 0.1
    tgt = torch.randn(2, n_src, T) * 0.1
    loss_t = tloss(tmodel(mix), tgt)
    loss_t.backward()
    tgrads = {k: p.grad.detach().numpy()
              for k, p in tmodel.named_parameters()
              if p.grad is not None}

    jloss = PITLossWrapper(pairwise_neg_snr, pit_from="pw_mtx",
                           threshold_byloss=True)

    def loss_fn(p):
        est = jmodel.apply(p, jnp.asarray(mix.numpy()), training=False)
        return jloss(est, jnp.asarray(tgt.numpy()))

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    # the random-init loss lands near zero at some configs (|loss| ~
    # 1e-4), so a pure rtol on the scalar amplifies fp32 round-off
    # (~2e-7 abs) into a false failure; atol covers the near-zero case
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-4, atol=1e-6)

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
