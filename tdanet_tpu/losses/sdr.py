"""SDR-family losses (reference: look2hear/losses/matrix.py).

All losses are pure jittable functions over (B, n_src, T) arrays. The
pairwise matrix forms are written as single einsum contractions so XLA
keeps them on the MXU; accumulations are float32 regardless of input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

EPS = 1e-8


def _zero_mean(ests, targets, axis):
    targets = targets - jnp.mean(targets, axis=axis, keepdims=True)
    ests = ests - jnp.mean(ests, axis=axis, keepdims=True)
    return ests, targets


def pairwise_neg_sdr(ests, targets, *, sdr_type="sisdr", zero_mean=True,
                     take_log=True, eps=EPS):
    """(B, n_src, T) x2 -> (B, n_src_est, n_src_tgt) negative SDR matrix
    (matrix.py:12-56)."""
    assert ests.ndim == 3 and ests.shape == targets.shape
    ests = ests.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    if zero_mean:
        ests, targets = _zero_mean(ests, targets, axis=2)

    if sdr_type in ("sisdr", "sdsdr"):
        # dot[b, i, j] = <est_i, tgt_j>
        dot = jnp.einsum("bit,bjt->bij", ests, targets)
        tgt_energy = jnp.sum(targets ** 2, axis=2) + eps        # (B, j)
        coeff = dot / tgt_energy[:, None, :]                    # (B, i, j)
        # ||proj||^2 = coeff^2 * ||tgt||^2
        proj_energy = coeff ** 2 * tgt_energy[:, None, :]
    else:  # snr: "projection" is the target itself
        proj_energy = jnp.broadcast_to(
            jnp.sum(targets ** 2, axis=2)[:, None, :],
            (ests.shape[0], ests.shape[1], targets.shape[1]))

    est_energy = jnp.sum(ests ** 2, axis=2)                     # (B, i)
    cross = jnp.einsum("bit,bjt->bij", ests, targets)           # (B, i, j)
    tgt_sq = jnp.sum(targets ** 2, axis=2)                      # (B, j)

    if sdr_type in ("sdsdr", "snr"):
        # e = est - tgt
        noise_energy = (est_energy[:, :, None] - 2 * cross
                        + tgt_sq[:, None, :])
    else:
        # e = est - proj; <est, proj> = coeff * dot = ||proj||^2, so
        # ||e||^2 = ||est||^2 - ||proj||^2
        noise_energy = est_energy[:, :, None] - proj_energy

    ratio = proj_energy / (noise_energy + eps)
    if take_log:
        return -10.0 * jnp.log10(ratio + eps)
    return -ratio


def singlesrc_neg_sdr(ests, targets, *, sdr_type="sisdr", zero_mean=True,
                      take_log=True, eps=EPS):
    """(B, T) x2 -> (B,) (matrix.py:59-105)."""
    assert ests.ndim == 2
    ests = ests.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    if zero_mean:
        ests, targets = _zero_mean(ests, targets, axis=1)
    if sdr_type in ("sisdr", "sdsdr"):
        dot = jnp.sum(ests * targets, axis=1, keepdims=True)
        tgt_energy = jnp.sum(targets ** 2, axis=1, keepdims=True) + eps
        scaled = dot * targets / tgt_energy
    else:
        scaled = targets
    e_noise = ests - (targets if sdr_type in ("sdsdr", "snr") else scaled)
    ratio = jnp.sum(scaled ** 2, axis=1) / (jnp.sum(e_noise ** 2, axis=1)
                                            + eps)
    if take_log:
        return -10.0 * jnp.log10(ratio + eps)
    return -ratio


def multisrc_neg_sdr(ests, targets, *, sdr_type="sisdr", zero_mean=True,
                     take_log=True, eps=EPS):
    """(B, n_src, T) x2 -> (B,), no permutation (matrix.py:108-150)."""
    assert ests.ndim == 3
    ests = ests.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    if zero_mean:
        ests, targets = _zero_mean(ests, targets, axis=2)
    if sdr_type in ("sisdr", "sdsdr"):
        dot = jnp.sum(ests * targets, axis=2, keepdims=True)
        tgt_energy = jnp.sum(targets ** 2, axis=2, keepdims=True) + eps
        scaled = dot * targets / tgt_energy
    else:
        scaled = targets
    e_noise = ests - (targets if sdr_type in ("sdsdr", "snr") else scaled)
    ratio = jnp.sum(scaled ** 2, axis=2) / (jnp.sum(e_noise ** 2, axis=2)
                                            + eps)
    if take_log:
        ratio = 10.0 * jnp.log10(ratio + eps)
    return -jnp.mean(ratio, axis=-1)


def freq_mae_wavl1(ests, targets, *, win=2048, stride=512):
    """STFT-L1 + waveform-L1 (matrix.py:152-173)."""
    B, nsrc, T = ests.shape
    window = jnp.hanning(win + 1)[:-1].astype(jnp.float32)

    def stft(x):
        x = x.reshape(-1, T)
        # torch.stft(center=True): reflect-pad by win//2
        x = jnp.pad(x, ((0, 0), (win // 2, win // 2)), mode="reflect")
        n_frames = 1 + (x.shape[-1] - win) // stride
        idx = (jnp.arange(n_frames)[:, None] * stride
               + jnp.arange(win)[None, :])
        frames = x[:, idx] * window
        return jnp.fft.rfft(frames, axis=-1).transpose(0, 2, 1)

    es, ts = stft(ests.astype(jnp.float32)), stft(targets.astype(jnp.float32))
    freq_l1 = (jnp.abs(es.real - ts.real).mean((1, 2))
               + jnp.abs(es.imag - ts.imag).mean((1, 2)))
    freq_l1 = freq_l1.reshape(B, nsrc).mean(-1)
    wave_l1 = jnp.abs(ests - targets).mean(-1).reshape(B, nsrc).mean(-1)
    return freq_l1 + wave_l1


# class-style factories for name parity with the reference's nn.Module
# loss classes (matrix.py:12-150): calling one returns the configured
# jittable function, so PITLossWrapper(PairwiseNegSDR("sisdr",
# zero_mean=True)) reads exactly like the reference.
def PairwiseNegSDR(sdr_type, zero_mean=True, take_log=True, EPS=1e-8):
    return functools.partial(pairwise_neg_sdr, sdr_type=sdr_type,
                             zero_mean=zero_mean, take_log=take_log, eps=EPS)


def SingleSrcNegSDR(sdr_type, zero_mean=True, take_log=True,
                    reduction="none", EPS=1e-8):
    assert reduction != "sum", NotImplementedError  # matrix.py:63 quirk
    fn = functools.partial(singlesrc_neg_sdr, sdr_type=sdr_type,
                           zero_mean=zero_mean, take_log=take_log, eps=EPS)
    if reduction == "mean":
        return lambda e, t, **kw: jnp.mean(fn(e, t, **kw))
    return fn


def MultiSrcNegSDR(sdr_type, zero_mean=True, take_log=True, EPS=1e-8):
    return functools.partial(multisrc_neg_sdr, sdr_type=sdr_type,
                             zero_mean=zero_mean, take_log=take_log, eps=EPS)


# instance alias mirroring matrix.py:185
freq_mae_wavl1loss = freq_mae_wavl1


# aliases mirroring matrix.py:176-185
pairwise_neg_sisdr = functools.partial(pairwise_neg_sdr, sdr_type="sisdr")
pairwise_neg_sdsdr = functools.partial(pairwise_neg_sdr, sdr_type="sdsdr")
pairwise_neg_snr = functools.partial(pairwise_neg_sdr, sdr_type="snr")
singlesrc_neg_sisdr = functools.partial(singlesrc_neg_sdr, sdr_type="sisdr")
singlesrc_neg_sdsdr = functools.partial(singlesrc_neg_sdr, sdr_type="sdsdr")
singlesrc_neg_snr = functools.partial(singlesrc_neg_sdr, sdr_type="snr")
multisrc_neg_sisdr = functools.partial(multisrc_neg_sdr, sdr_type="sisdr")
multisrc_neg_sdsdr = functools.partial(multisrc_neg_sdr, sdr_type="sdsdr")
multisrc_neg_snr = functools.partial(multisrc_neg_sdr, sdr_type="snr")
