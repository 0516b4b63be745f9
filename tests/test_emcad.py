"""EMCAD decoder library parity vs the PyTorch reference."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from oracle import load_reference_module, torch_state_dict_to_numpy
from tdanet_tpu.models import emcad as em
from tdanet_tpu.models import flat_torch_to_pytree

C = 64
FEAT_LEN = 40  # scale lengths 40, 20, 10, 5, 3


def stage_lengths(feat_len, depth=5):
    out = [feat_len]
    for _ in range(depth - 1):
        out.append((out[-1] + 1) // 2)
    return out  # fine -> coarse


def make_inputs(seed=0):
    torch.manual_seed(seed)
    lens = stage_lengths(FEAT_LEN)
    skips = [torch.randn(2, C, L) for L in lens]
    x = torch.randn(2, C, lens[-1])
    return x, skips


def struct_check(params, jmod):
    init = jmod.init(jax.random.PRNGKey(0))
    pt = {jax.tree_util.keystr(p): v.shape
          for p, v in jax.tree_util.tree_leaves_with_path(params)}
    pi = {jax.tree_util.keystr(p): v.shape
          for p, v in jax.tree_util.tree_leaves_with_path(init)}
    assert pt == pi


def run_pair(ref_file, tcls_name, jcls, activation="prelu",
             expansion_factor=2, seed=0):
    ref = load_reference_module(ref_file)
    torch.manual_seed(seed)
    t = getattr(ref, tcls_name)(channels=[C] * 5,
                                expansion_factor=expansion_factor,
                                activation=activation, feat_len=FEAT_LEN)
    t.eval()
    j = jcls(channels=[C] * 5, expansion_factor=expansion_factor,
             activation=activation, feat_len=FEAT_LEN)
    x, skips = make_inputs(seed)
    with torch.no_grad():
        want = t(x, skips)
    params = flat_torch_to_pytree(torch_state_dict_to_numpy(t))
    got = j.apply(params, jnp.asarray(x.numpy()),
                  [jnp.asarray(s.numpy()) for s in skips])
    if isinstance(want, list):
        assert isinstance(got, list) and len(got) == len(want)
        pairs = zip(got, want)
    else:
        pairs = [(got, want)]
    for g, w in pairs:
        w = w.numpy()
        assert np.asarray(g).shape == w.shape
        scale = max(np.abs(w).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(g), w, rtol=2e-3,
                                   atol=2e-4 * scale)
    struct_check(params, j)


@pytest.mark.parametrize("act", ["prelu", "relu6"])
def test_emcad_full(act):
    run_pair("EMCAD.py", "EMCAD", em.EMCAD, activation=act)


def test_emcad_noinit():
    run_pair("EMCAD_noInit.py", "EMCADNoInit", em.EMCADNoInit)


def test_emcad_f1():
    run_pair("EMCAD.py", "EMCADF1", em.EMCADF1)


def test_emcad_test_lite_v2():
    run_pair("EMCAD_test.py", "EMCADTest", em.EMCADTest)


def test_emcad_v1_6():
    run_pair("EMCAD_v1_6.py", "EMCADv1_6", em.EMCADv1_6,
             expansion_factor=0.5)


def test_emcad_v1_6_noasg():
    run_pair("EMCAD_v1_6_noASG.py", "EMCADv1_6_noASG", em.EMCADv1_6_noASG,
             expansion_factor=0.5)


def test_emcad_v1_6_nocbam():
    run_pair("EMCAD_v1_6_noCBAM.py", "EMCADv1_6_noCBAM",
             em.EMCADv1_6_noCBAM, expansion_factor=0.5)


def test_emcad_v1_6_nommlp():
    run_pair("EMCAD_v1_6_noMMLP.py", "EMCADv1_6_noMMLP",
             em.EMCADv1_6_noMMLP, expansion_factor=0.5)


def test_emcad_v1_6_final():
    run_pair("EMCAD_v1_6_final.py", "EMCADv1_6_Final", em.EMCADv1_6_Final,
             expansion_factor=0.5)


def test_lgag3():
    ref = load_reference_module("EMCAD_test.py")
    torch.manual_seed(1)
    t = ref.LGAG3(F_g=C, F_l=C, F_int=C // 2, kernel_size=3,
                  groups=C // 2, activation="prelu")
    t.eval()
    g = torch.randn(2, C, 20)
    x = torch.randn(2, C, 20)
    xb = torch.randn(2, C, 20)
    with torch.no_grad():
        want = t(g, x, xb).numpy()
    j = em.LGAG3(C, C, C // 2, kernel_size=3, groups=C // 2,
                 activation="prelu")
    params = flat_torch_to_pytree(torch_state_dict_to_numpy(t))
    got = j.apply(params, jnp.asarray(g.numpy()), jnp.asarray(x.numpy()),
                  jnp.asarray(xb.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3,
                               atol=1e-4 * np.abs(want).max())
