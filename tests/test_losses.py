"""Loss parity vs the PyTorch reference (losses/matrix.py, pit_wrapper.py)."""
import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tdanet_tpu import losses

REF = "/root/reference/look2hear/losses"


def _load(fname, name):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{fname}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


ref_matrix = _load("matrix.py", "ref_matrix")


@pytest.fixture
def batch():
    torch.manual_seed(0)
    ests = torch.randn(4, 2, 4000)
    targets = torch.randn(4, 2, 4000)
    return ests, targets


@pytest.mark.parametrize("sdr_type", ["snr", "sisdr", "sdsdr"])
def test_pairwise_neg_sdr(batch, sdr_type):
    ests, targets = batch
    ref = ref_matrix.PairwiseNegSDR(sdr_type)
    want = ref(ests, targets).numpy()
    got = np.asarray(losses.pairwise_neg_sdr(
        jnp.asarray(ests.numpy()), jnp.asarray(targets.numpy()),
        sdr_type=sdr_type))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("sdr_type", ["snr", "sisdr", "sdsdr"])
def test_singlesrc_neg_sdr(batch, sdr_type):
    ests, targets = batch
    ref = ref_matrix.SingleSrcNegSDR(sdr_type)
    want = ref(ests[:, 0], targets[:, 0]).numpy()
    got = np.asarray(losses.singlesrc_neg_sdr(
        jnp.asarray(ests[:, 0].numpy()), jnp.asarray(targets[:, 0].numpy()),
        sdr_type=sdr_type))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("sdr_type", ["snr", "sisdr", "sdsdr"])
def test_multisrc_neg_sdr(batch, sdr_type):
    ests, targets = batch
    ref = ref_matrix.MultiSrcNegSDR(sdr_type)
    want = ref(ests, targets).numpy()
    got = np.asarray(losses.multisrc_neg_sdr(
        jnp.asarray(ests.numpy()), jnp.asarray(targets.numpy()),
        sdr_type=sdr_type))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pit_wrapper_matches_reference(batch):
    ref_pit = _load("pit_wrapper.py", "ref_pit")
    ests, targets = batch
    # make one pair clearly permuted so PIT matters
    targets[0] = torch.flip(ests[0], dims=[0]) + 0.01 * targets[0]
    twrap = ref_pit.PITLossWrapper(ref_matrix.PairwiseNegSDR("sisdr"),
                                   pit_from="pw_mtx", threshold_byloss=True)
    want = float(twrap(ests, targets))
    jwrap = losses.PITLossWrapper(losses.pairwise_neg_sisdr,
                                  pit_from="pw_mtx", threshold_byloss=True)
    got = float(jwrap(jnp.asarray(ests.numpy()), jnp.asarray(targets.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pit_wrapper_return_ests(batch):
    ests, targets = batch
    perm_targets = targets.flip(dims=[1])  # swap sources
    jwrap = losses.PITLossWrapper(losses.pairwise_neg_sisdr)
    loss, reordered = jwrap(jnp.asarray(ests.numpy()),
                            jnp.asarray(perm_targets.numpy()),
                            return_ests=True)
    # reordering the perfect case: ests reordered to match swapped targets
    loss2 = losses.PITLossWrapper(losses.pairwise_neg_sisdr)(
        reordered, jnp.asarray(perm_targets.numpy()))
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-5)


def test_hungarian_matches_factorial():
    # n_src = 3 runs factorial; compare hungarian on the same matrix
    key = jax.random.PRNGKey(0)
    pwl = jax.random.normal(key, (5, 3, 3))
    f_loss, f_idx = losses.find_best_perm_factorial(pwl)
    h_loss, h_idx = losses.find_best_perm_hungarian(pwl)
    np.testing.assert_allclose(np.asarray(f_loss), np.asarray(h_loss),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(f_idx), np.asarray(h_idx))


def test_callback_free_backend_falls_back_to_factorial(monkeypatch):
    # On backends whose PJRT runtime cannot host pure_callback (the
    # tunneled axon TPU), n_src=4/5 must route through the factorial
    # einsum instead of the Hungarian host callback — identical argmin.
    from tdanet_tpu.losses import pit
    key = jax.random.PRNGKey(2)
    pwl = jax.random.normal(key, (4, 4, 4))
    h_loss, h_idx = pit.find_best_perm(pwl)  # CPU default: hungarian
    monkeypatch.setattr(pit, "_CALLBACK_FREE_BACKENDS",
                        (jax.default_backend(),))
    f_loss, f_idx = pit.find_best_perm(pwl)  # now: factorial fallback
    np.testing.assert_allclose(np.asarray(f_loss), np.asarray(h_loss),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(f_idx), np.asarray(h_idx))


def test_pit_is_jittable_and_differentiable():
    jwrap = losses.PITLossWrapper(losses.pairwise_neg_snr)

    @jax.jit
    def loss_fn(e, t):
        return jwrap(e, t)

    key = jax.random.PRNGKey(1)
    e = jax.random.normal(key, (2, 2, 1000))
    t = jax.random.normal(jax.random.fold_in(key, 1), (2, 2, 1000))
    g = jax.grad(loss_fn)(e, t)
    assert np.isfinite(np.asarray(g)).all()


def test_freq_mae_wavl1_matches_reference(batch):
    ests, targets = batch
    ref = ref_matrix.freq_MAE_WavL1Loss()
    want = ref(ests, targets).numpy()
    got = np.asarray(losses.freq_mae_wavl1(
        jnp.asarray(ests.numpy()), jnp.asarray(targets.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
