"""STFT bank / complex utils / SISNRi parity + property tests."""
import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tdanet_tpu.utils import stft as jstft
from tdanet_tpu.utils import complex_utils as cu


def load_ref_stft():
    name = "ref_stft"
    if name in sys.modules:
        return sys.modules[name]
    # stub librosa.filters (unavailable in the image)
    if "librosa" not in sys.modules:
        lib = types.ModuleType("librosa")
        filt = types.ModuleType("librosa.filters")
        filt.mel = lambda *a, **k: np.zeros((1, 1))
        lib.filters = filt
        sys.modules["librosa"] = lib
        sys.modules["librosa.filters"] = filt
    spec = importlib.util.spec_from_file_location(
        name, "/root/reference/look2hear/utils/stft.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("wnd", ["hann", "hamm", "blackman", "bartlett",
                                 "rect", "sqrthann"])
def test_window_matches_torch(wnd):
    ref = load_ref_stft()
    want = ref.init_window(wnd, 400).numpy()
    got = jstft.init_window(wnd, 400)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode,frame_len", [("librosa", 400),
                                            ("kaldi", 400),
                                            ("librosa", 512)])
def test_kernel_matches_reference(mode, frame_len):
    ref = load_ref_stft()
    w = ref.init_window("hann", frame_len)
    K_t, w_t = ref.init_kernel(frame_len, 160, w, mode=mode)
    K_j, w_j = jstft.init_kernel(frame_len, 160,
                                 jstft.init_window("hann", frame_len),
                                 mode=mode)
    np.testing.assert_allclose(K_j, K_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(w_j, w_t.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("center,polar", [(False, False), (True, True)])
def test_forward_stft_matches_reference(center, polar):
    ref = load_ref_stft()
    torch.manual_seed(0)
    tmod = ref.STFT(400, 160, window="hann", center=center)
    x = torch.randn(2, 4000)
    with torch.no_grad():
        want = tmod(x, return_polar=polar).numpy()
    jmod = jstft.STFT(400, 160, window="hann", center=center)
    got = np.asarray(jmod(jnp.asarray(x.numpy()), return_polar=polar))
    assert got.shape == want.shape
    if polar:
        # magnitudes directly; phases circularly (atan2 branch cut at +-pi)
        np.testing.assert_allclose(got[..., 0], want[..., 0], rtol=1e-3,
                                   atol=1e-3)
        dphi = np.angle(np.exp(1j * (got[..., 1] - want[..., 1])))
        # weight by magnitude: phase is meaningless in near-zero bins
        assert np.abs(dphi * want[..., 0]).max() < 1e-2
    else:
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_stft_istft_roundtrip():
    # perfect reconstruction through our forward+inverse pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    fwd = jstft.STFT(400, 100, window="hann", center=True)
    inv = jstft.iSTFT(400, 100, window="hann", center=True)
    spec = fwd(jnp.asarray(x))
    back = np.asarray(inv(spec))
    # ignore edges (window envelope)
    np.testing.assert_allclose(back[:, 400:-400], x[:, 400:-400],
                               rtol=1e-3, atol=1e-3)


def test_istft_matches_reference():
    ref = load_ref_stft()
    torch.manual_seed(1)
    spec = torch.randn(2, 257, 20, 2)
    tmod = ref.iSTFT(400, 160, window="hann", center=False)
    with torch.no_grad():
        want = tmod(spec).numpy()
    jmod = jstft.iSTFT(400, 160, window="hann", center=False)
    got = np.asarray(jmod(jnp.asarray(spec.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("polar,normalized,channels",
                         [(False, False, None), (True, True, 2)])
def test_pytorch_stft_matches_reference(polar, normalized, channels):
    ref = load_ref_stft()
    torch.manual_seed(3)
    tmod = ref.STFT(400, 160, window="hann", center=True,
                    normalized=normalized, mode="torch")
    shape = (2, 4000) if channels is None else (2, channels, 4000)
    x = torch.randn(*shape)
    with torch.no_grad():
        want = tmod(x, return_polar=polar).numpy()
    jmod = jstft.STFT(400, 160, window="hann", center=True,
                      normalized=normalized, mode="torch")
    assert jmod.num_bins == tmod.num_bins
    assert jmod.win_length == tmod.win_length
    got = np.asarray(jmod(jnp.asarray(x.numpy()), return_polar=polar))
    assert got.shape == want.shape
    if polar:
        np.testing.assert_allclose(got[..., 0], want[..., 0], rtol=1e-3,
                                   atol=1e-3)
        dphi = np.angle(np.exp(1j * (got[..., 1] - want[..., 1])))
        assert np.abs(dphi * want[..., 0]).max() < 1e-2
    else:
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_pytorch_istft_matches_reference():
    ref = load_ref_stft()
    torch.manual_seed(4)
    # synthesize a consistent spectrum so istft is well-posed
    x = torch.randn(2, 4000)
    fwd = ref.STFT(400, 160, window="hann", center=True, mode="torch")
    with torch.no_grad():
        spec = fwd(x)
        want = ref.iSTFT(400, 160, window="hann", center=True,
                         mode="torch")(spec).numpy()
    got = np.asarray(jstft.iSTFT(400, 160, window="hann", center=True,
                                 mode="torch")(jnp.asarray(spec.numpy())))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_pytorch_stft_istft_roundtrip():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    fwd = jstft.STFT(400, 100, window="hann", center=True, mode="torch")
    inv = jstft.iSTFT(400, 100, window="hann", center=True, mode="torch")
    back = np.asarray(inv(fwd(jnp.asarray(x))))
    np.testing.assert_allclose(back[:, 512:-512], x[:, 512:-512],
                               rtol=1e-3, atol=1e-3)


def test_speed_perturb_filter_matches_reference():
    ref = load_ref_stft()
    want = ref.speed_perturb_filter(16000, 15200).numpy()
    got = jstft.speed_perturb_filter(16000, 15200)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_splice_feature_matches_reference():
    ref = load_ref_stft()
    torch.manual_seed(2)
    feats = torch.randn(2, 10, 8)
    want = ref.splice_feature(feats, 2, 1, "cat").numpy()
    got = np.asarray(jstft.splice_feature(jnp.asarray(feats.numpy()),
                                          2, 1, "cat"))
    np.testing.assert_allclose(got, want, atol=0)


def test_mel_filter_properties():
    fb = jstft.mel_filter(400, sr=16000, num_mels=40)
    assert fb.shape == (40, 257)
    assert (fb >= 0).all()
    # triangles tile the band: every interior bin is covered
    coverage = fb.sum(0)
    assert (coverage[5:-5] > 0).all()


def test_complex_utils():
    a = jnp.asarray(np.random.default_rng(0).standard_normal((3, 3))
                    + 1j * np.random.default_rng(1).standard_normal((3, 3)))
    inv = cu.inverse(a)
    np.testing.assert_allclose(np.asarray(cu.matmul(a, inv)), np.eye(3),
                               atol=1e-6)
    b = jnp.ones((3,), jnp.complex64)
    x = cu.solve(b, a)
    np.testing.assert_allclose(np.asarray(a @ x), np.ones(3), atol=1e-5)
    assert cu.is_complex(a)
    assert cu.complex_norm(a).shape == (3,)


def test_sisnri():
    from tdanet_tpu.losses.sisnri import SISNRi, sisnr_improvement
    rng = np.random.default_rng(0)
    s1 = rng.standard_normal((2, 4000)).astype(np.float32)
    s2 = rng.standard_normal((2, 4000)).astype(np.float32)
    mix = s1 + s2
    # perfect estimates -> large positive improvement -> very negative loss
    loss = SISNRi().compute_loss(jnp.asarray(mix),
                                 [jnp.asarray(s1), jnp.asarray(s2)],
                                 [jnp.asarray(s1), jnp.asarray(s2)])
    assert float(loss) < -20
    imp = sisnr_improvement(jnp.asarray(mix), jnp.asarray(s1),
                            jnp.asarray(s1))
    assert float(imp.mean()) > 20
