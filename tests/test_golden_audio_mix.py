"""Golden end-to-end: separate the repository's bundled real mixture
(audio_mix.wav, mono 16 kHz 2 s — the clip inference.py demos on) with
seeded random weights and match the PyTorch reference sample-by-sample.
This is the SURVEY §7 'minimum end-to-end slice' acceptance check, run
on real audio rather than noise."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from oracle import load_reference_module, torch_state_dict_to_numpy
from tdanet_tpu.models import TDANetBest, flat_torch_to_pytree
from tdanet_tpu.utils import read_wav

WAV = "/root/reference/audio_mix.wav"


def test_bundled_mixture_separation_matches_reference():
    wav, sr = read_wav(WAV)
    assert sr == 16000
    ref = load_reference_module("TDANet_best.py")
    torch.manual_seed(0)
    cfg = dict(out_channels=128, in_channels=512, num_blocks=4,
               upsampling_depth=5, enc_kernel_size=4, num_sources=2,
               sample_rate=16000)
    tmodel = ref.TDANetBest(**cfg)
    tmodel.eval()
    with torch.no_grad():
        want = tmodel(torch.from_numpy(wav)[None]).numpy()

    jmodel = TDANetBest(**cfg)
    params = flat_torch_to_pytree(torch_state_dict_to_numpy(tmodel))
    got = np.asarray(jmodel.apply(params, jnp.asarray(wav)[None]))
    assert got.shape == want.shape == (1, 2, wav.shape[0])
    # whole-signal SNR criterion (a handful of samples differ in the last
    # fp32 bits through 4 recurrent blocks; elementwise rtol is the wrong
    # lens for near-zero audio samples)
    # 40 dB implementation-noise floor: a perturbation 40 dB below the
    # estimate changes a ~15 dB SI-SNR measurement by < 0.02 dB, well
    # inside the BASELINE 0.1 dB fidelity budget. (Measured: ~45 dB; the
    # residual comes from fp32 trig/accumulation ordering amplified by
    # the self-residual recurrence.)
    snr = 10 * np.log10((want ** 2).sum() / ((want - got) ** 2).sum())
    assert snr > 40.0, f"golden SNR too low: {snr:.1f} dB"
    # and the 99.9th-percentile absolute error stays tiny
    err = np.abs(want - got)
    assert np.quantile(err, 0.999) < 2e-2 * np.abs(want).max()


def test_bundled_mixture_bf16_within_quality_budget():
    """The headline bench (bench.py) serves in bfloat16; pin the numeric
    cost. Measured: bf16 output is ~38 dB below the f32 output on the
    bundled real mixture. A perturbation 34+ dB below the estimate
    changes a ~15 dB SI-SNR measurement by < 0.06 dB, inside the
    BASELINE 0.1 dB fidelity budget."""
    wav, sr = read_wav(WAV)
    ref = load_reference_module("TDANet_best.py")
    torch.manual_seed(0)
    cfg = dict(out_channels=128, in_channels=512, num_blocks=4,
               upsampling_depth=5, enc_kernel_size=4, num_sources=2,
               sample_rate=16000)
    tmodel = ref.TDANetBest(**cfg)
    jmodel = TDANetBest(**cfg)
    params = flat_torch_to_pytree(torch_state_dict_to_numpy(tmodel))
    x = jnp.asarray(wav)[None]
    f32 = np.asarray(jmodel.apply(params, x))
    b16 = np.asarray(jmodel.apply(params, x, compute_dtype=jnp.bfloat16)
                     ).astype(np.float32)
    assert b16.shape == f32.shape
    snr = 10 * np.log10((f32 ** 2).sum() / ((f32 - b16) ** 2).sum())
    assert snr > 34.0, f"bf16 deviation too large: {snr:.1f} dB"
