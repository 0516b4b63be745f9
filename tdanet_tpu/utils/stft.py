"""STFT bank (reference: look2hear/utils/stft.py — conv-based STFT/iSTFT
with librosa/kaldi framing modes, DFT-kernel builders, mel filters,
speed-perturb filter, feature splicing).

JAX-functional: kernels are precomputed numpy constants closed over by the
jitted transforms; the framed DFT is a single matmul on the MXU.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

EPSILON = float(np.finfo(np.float32).eps)


def init_window(wnd: str, frame_len: int) -> np.ndarray:
    """Window coefficients (stft.py:32-59); periodic windows match torch."""
    n = np.arange(frame_len)
    if wnd == "rect":
        return np.ones(frame_len, np.float32)
    if wnd in ("hann", "sqrthann"):
        w = 0.5 - 0.5 * np.cos(2 * np.pi * n / frame_len)
        return (np.sqrt(w) if wnd == "sqrthann" else w).astype(np.float32)
    if wnd == "hamm":
        return (0.54 - 0.46 * np.cos(2 * np.pi * n / frame_len)) \
            .astype(np.float32)
    if wnd == "blackman":
        x = 2 * np.pi * n / frame_len
        return (0.42 - 0.5 * np.cos(x) + 0.08 * np.cos(2 * x)) \
            .astype(np.float32)
    if wnd == "bartlett":
        # torch.bartlett_window(periodic=True)
        m = frame_len
        w = 1.0 - np.abs(2 * n / m - 1.0)
        return w.astype(np.float32)
    raise RuntimeError(f"Unknown window type: {wnd}")


def init_kernel(frame_len: int, frame_hop: int, window: np.ndarray,
                round_pow_of_two: bool = True, normalized: bool = False,
                inverse: bool = False,
                mode: str = "librosa") -> Tuple[np.ndarray, np.ndarray]:
    """DFT kernels, (2B, 1, W) layout like the reference (stft.py:62-116)."""
    if mode not in ("librosa", "kaldi"):
        raise ValueError(f"Unsupported mode: {mode}")
    if round_pow_of_two or mode == "kaldi":
        fft_size = 2 ** math.ceil(math.log2(frame_len))
    else:
        fft_size = frame_len
    if mode == "librosa" and fft_size != frame_len:
        lpad = (fft_size - frame_len) // 2
        window = np.pad(window, (lpad, fft_size - frame_len - lpad))
    S = fft_size ** 0.5 if normalized else 1.0
    K = np.fft.fft(np.eye(fft_size) / S, axis=-1)
    K = np.stack([K.real, K.imag], axis=-1)          # W x B x 2
    if mode == "kaldi":
        K = K[:frame_len]
    if inverse and not normalized:
        K = K / fft_size
    K = np.transpose(K, (2, 1, 0))                   # 2 x B x W
    K = K.reshape(fft_size * 2, 1, K.shape[-1])
    return K.astype(np.float32), window.astype(np.float32)


def mel_filter(frame_len: int, round_pow_of_two: bool = True,
               num_bins: Optional[int] = None, sr: int = 16000,
               num_mels: int = 80, fmin: float = 0.0,
               fmax: Optional[float] = None,
               norm: bool = False) -> np.ndarray:
    """HTK-style triangular mel filterbank, (num_mels, N//2+1)
    (stft.py:117-163; librosa.filters.mel with htk=True)."""
    if num_bins is None:
        N = 2 ** math.ceil(math.log2(frame_len)) if round_pow_of_two \
            else frame_len
    else:
        N = (num_bins - 1) * 2
    upper = sr // 2
    fmax = upper if fmax is None else min(
        fmax + upper if fmax < 0 else fmax, upper)
    fmin = max(0.0, fmin)

    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    mel_pts = np.linspace(hz2mel(fmin), hz2mel(fmax), num_mels + 2)
    hz_pts = mel2hz(mel_pts)
    fft_freqs = np.linspace(0, sr / 2, N // 2 + 1)
    weights = np.zeros((num_mels, N // 2 + 1))
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    for i in range(num_mels):
        lower = -ramps[i] / fdiff[i]
        upper_r = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper_r))
    if norm:  # slaney area normalization
        enorm = 2.0 / (hz_pts[2:num_mels + 2] - hz_pts[:num_mels])
        weights *= enorm[:, None]
    return weights.astype(np.float32)


def speed_perturb_filter(src_sr: int, dst_sr: int, cutoff_ratio: float = 0.95,
                         num_zeros: int = 64) -> np.ndarray:
    """Polyphase resampling filter bank, (dst_sr, src_sr, K)
    (stft.py:164-198)."""
    if src_sr == dst_sr:
        raise ValueError("src_sr should not be equal to dst_sr")
    gcd = math.gcd(src_sr, dst_sr)
    src_sr, dst_sr = src_sr // gcd, dst_sr // gcd
    if src_sr == 1 or dst_sr == 1:
        raise ValueError("do not support integer downsample/upsample")
    zeros_per_block = min(src_sr, dst_sr) * cutoff_ratio
    padding = 1 + int(num_zeros / zeros_per_block)
    times = (np.arange(dst_sr)[:, None, None] / float(dst_sr)
             - np.arange(src_sr)[None, :, None] / float(src_sr)
             - np.arange(2 * padding + 1)[None, None, :] + padding)
    window = np.heaviside(1 - np.abs(times / padding), 0.0) * (
        0.5 + 0.5 * np.cos(times / padding * math.pi))
    weight = (np.sinc(times * zeros_per_block) * window * zeros_per_block
              / float(src_sr))
    return weight.astype(np.float32)


def splice_feature(feats, lctx: int = 1, rctx: int = 1, op: str = "cat"):
    """Splice neighboring frames (stft.py:199-231); feats (..., T, F)."""
    if lctx + rctx == 0:
        return feats
    if op not in ("cat", "stack"):
        raise ValueError(f"Unknown op for feature splicing: {op}")
    T = feats.shape[-2]
    ctx = []
    for c in range(-lctx, rctx + 1):
        idx = np.clip(np.arange(c, c + T), 0, T - 1)
        ctx.append(jnp.take(feats, jnp.asarray(idx), axis=-2))
    return jnp.concatenate(ctx, -1) if op == "cat" else jnp.stack(ctx, -1)


def forward_stft(wav, kernel, window, *, return_polar=False,
                 pre_emphasis=0.0, frame_hop=256, onesided=False,
                 center=False, eps=EPSILON):
    """Conv-based STFT (stft.py:232-298). wav (N, S) or (N, C, S) ->
    (N, (C), B, T, 2)."""
    kernel = jnp.asarray(kernel) * jnp.asarray(window)
    wav_dim = wav.ndim
    N, S = wav.shape[0], wav.shape[-1]
    x = wav.reshape(-1, 1, S)
    if center:
        pad = kernel.shape[-1] // 2
        x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="reflect")
    W = kernel.shape[-1]
    # frame into (NC, T, W)
    T = (x.shape[-1] - W) // frame_hop + 1
    idx = (np.arange(T)[:, None] * frame_hop + np.arange(W)[None, :])
    frames = x[:, 0][:, jnp.asarray(idx)]
    if pre_emphasis > 0:
        first = frames[..., :1] * (1 - pre_emphasis)
        rest = frames[..., 1:] - pre_emphasis * frames[..., :-1]
        frames = jnp.concatenate([first, rest], axis=-1)
    # (NC, T, W) @ (W, 2B) -> (NC, 2B, T)
    packed = jnp.einsum("ntw,bw->nbt", frames, kernel[:, 0, :],
                        preferred_element_type=jnp.float32)
    if wav_dim == 3:
        packed = packed.reshape(N, -1, packed.shape[-2], packed.shape[-1])
    real, imag = jnp.split(packed, 2, axis=-2)
    if onesided:
        num_bins = kernel.shape[0] // 4 + 1
        real = real[..., :num_bins, :]
        imag = imag[..., :num_bins, :]
    if return_polar:
        mag = jnp.sqrt(real ** 2 + imag ** 2 + eps)
        pha = jnp.arctan2(imag, real)
        return jnp.stack([mag, pha], axis=-1)
    return jnp.stack([real, imag], axis=-1)


def inverse_stft(transform, kernel, window, *, return_polar=False,
                 frame_hop=256, onesided=False, center=False, eps=EPSILON):
    """Conv-transpose iSTFT with window-envelope normalization
    (stft.py:300-367). transform (N, F, T, 2) -> (N, S)."""
    kernel = jnp.asarray(kernel)
    window = jnp.asarray(window)
    if transform.ndim == 3:
        transform = transform[None]
    if return_polar:
        real = transform[..., 0] * jnp.cos(transform[..., 1])
        imag = transform[..., 0] * jnp.sin(transform[..., 1])
    else:
        real, imag = transform[..., 0], transform[..., 1]
    if onesided:
        rev = list(range(kernel.shape[0] // 4 - 1, 0, -1))
        real = jnp.concatenate([real, real[:, rev]], 1)
        imag = jnp.concatenate([imag, -imag[:, rev]], 1)
    packed = jnp.concatenate([real, imag], axis=1)   # N x 2B x T
    kw = (kernel * window)[:, 0, :]                  # (2B, W)
    N, _, T = packed.shape
    W = kw.shape[-1]
    S = (T - 1) * frame_hop + W
    # overlap-add via scatter of per-frame contributions
    frames = jnp.einsum("nbt,bw->ntw", packed, kw,
                        preferred_element_type=jnp.float32)
    idx = (np.arange(T)[:, None] * frame_hop + np.arange(W)[None, :])
    wav = jnp.zeros((N, S), frames.dtype) \
        .at[:, jnp.asarray(idx)].add(frames)
    win_sq = jnp.broadcast_to((window ** 2)[None, :], (T, W))
    denorm = jnp.zeros((S,), frames.dtype) \
        .at[jnp.asarray(idx)].add(win_sq)
    if center:
        pad = kernel.shape[-1] // 2
        wav = wav[..., pad:-pad]
        denorm = denorm[pad:-pad]
    return wav / (denorm + eps)


def pytorch_stft(wav, frame_len, frame_hop, n_fft=512, *, return_polar=False,
                 window=None, normalized=False, onesided=True, center=False,
                 eps=EPSILON):
    """torch.stft framing mode (stft.py:369-425, `_pytorch_stft`).

    Mirrors torch.stft semantics: window centered-padded to n_fft,
    optional reflect center pad of n_fft//2, rfft per frame, and
    1/sqrt(n_fft) scaling when normalized. wav (N, S) or (N, C, S) ->
    (N, (C), F, T, 2).
    """
    wav_dim = wav.ndim
    if wav_dim not in (2, 3):
        raise RuntimeError(f"STFT expect 2D/3D tensor, but got {wav_dim}D")
    x = wav.reshape(-1, wav.shape[-1])
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    win = np.asarray(window, np.float32)
    lpad = (n_fft - win.shape[-1]) // 2
    win = np.pad(win, (lpad, n_fft - win.shape[-1] - lpad))
    T = (x.shape[-1] - n_fft) // frame_hop + 1
    idx = np.arange(T)[:, None] * frame_hop + np.arange(n_fft)[None, :]
    frames = x[:, jnp.asarray(idx)] * jnp.asarray(win)   # (NC, T, W)
    spec = jnp.fft.rfft(frames, n_fft, axis=-1) if onesided \
        else jnp.fft.fft(frames, n_fft, axis=-1)
    if normalized:
        spec = spec * (n_fft ** -0.5)
    # (NC, T, F) -> (NC, F, T, 2)
    out = jnp.stack([spec.real, spec.imag], axis=-1).swapaxes(-3, -2)
    out = out.astype(wav.dtype)
    if wav_dim == 3:
        # reference quirk (stft.py:415-417): it unpacks N AFTER folding
        # channels, so 3D input yields (N*C, 1, F, T, 2), not (N, C, ...)
        out = out.reshape((out.shape[0], -1) + out.shape[1:])
    if not return_polar:
        return out
    real, imag = out[..., 0], out[..., 1]
    mag = (real ** 2 + imag ** 2 + eps) ** 0.5
    pha = jnp.arctan2(imag, real)
    return jnp.stack([mag, pha], axis=-1)


def pytorch_istft(transform, frame_len, frame_hop, window, n_fft=512, *,
                  return_polar=False, normalized=False, onesided=True,
                  center=False, eps=EPSILON):
    """torch.istft framing mode (stft.py:428-483, `_pytorch_istft`).

    Overlap-add of windowed irfft frames normalized by the window-square
    envelope (torch.istft asserts NOLA; we clamp by eps). transform
    (N, F, T, 2) or (F, T, 2) -> (N, S).
    """
    tdim = transform.ndim
    if tdim == 3:
        # Deliberate divergence: the reference's 3D unsqueeze is DEAD code
        # (its dim check at stft.py:458-462 tests the pre-unsqueeze dim, so
        # 3D (F,T,2) input always raises there). We keep the sensible 3D
        # support; don't "fix" this back to a raise in a fidelity pass —
        # see the annotated 3D stft reshape quirk above for the pattern.
        transform = transform[None]
    elif tdim != 4:
        raise RuntimeError(f"Expect 4D tensor, but got {tdim}D")
    if return_polar:
        real = transform[..., 0] * jnp.cos(transform[..., 1])
        imag = transform[..., 0] * jnp.sin(transform[..., 1])
    else:
        real, imag = transform[..., 0], transform[..., 1]
    spec = (real + 1j * imag).swapaxes(-2, -1)           # (N, T, F)
    if normalized:
        spec = spec * (n_fft ** 0.5)
    if onesided:
        frames = jnp.fft.irfft(spec, n_fft, axis=-1)
    else:
        frames = jnp.fft.ifft(spec, n_fft, axis=-1).real
    win = np.asarray(window, np.float32)
    lpad = (n_fft - win.shape[-1]) // 2
    win = np.pad(win, (lpad, n_fft - win.shape[-1] - lpad))
    frames = frames * jnp.asarray(win)
    N, T = frames.shape[0], frames.shape[1]
    S = (T - 1) * frame_hop + n_fft
    idx = np.arange(T)[:, None] * frame_hop + np.arange(n_fft)[None, :]
    wav = jnp.zeros((N, S), frames.dtype).at[:, jnp.asarray(idx)].add(frames)
    win_sq = np.zeros((S,), np.float32)
    np.add.at(win_sq, idx.reshape(-1), np.tile(win ** 2, T))
    wav = wav / jnp.asarray(np.maximum(win_sq, 1e-11))
    if center:
        pad = n_fft // 2
        wav = wav[:, pad:S - pad]
    return wav.astype(transform.dtype)


class STFTBase:
    """(i)STFT layer (stft.py:622-710)."""

    def __init__(self, frame_len, frame_hop, window="sqrthann",
                 round_pow_of_two=True, normalized=False, pre_emphasis=0.0,
                 onesided=True, inverse=False, center=False,
                 mode="librosa"):
        if mode == "torch":
            # stft.py:668-677: no conv kernel; win_length is the fft size
            self.K = None
            self.w = init_window(window, frame_len)
            fft_size = 2 ** math.ceil(math.log2(frame_len)) \
                if round_pow_of_two else frame_len
            self.num_bins = fft_size // 2 + 1
            self.pre_emphasis = 0.0
            self.win_length = fft_size
        else:
            self.K, self.w = init_kernel(
                frame_len, frame_hop, init_window(window, frame_len),
                round_pow_of_two=round_pow_of_two, normalized=normalized,
                inverse=inverse, mode=mode)
            self.num_bins = self.K.shape[0] // 4 + 1
            self.pre_emphasis = pre_emphasis
            self.win_length = self.K.shape[2]
        self.frame_len, self.frame_hop = frame_len, frame_hop
        self.window = window
        self.normalized = normalized
        self.onesided = onesided
        self.center = center
        self.mode = mode

    def num_frames(self, wav_len):
        wav_len = np.asarray(wav_len)
        if self.center:
            wav_len = wav_len + self.win_length
        return (wav_len - self.win_length) // self.frame_hop + 1


class STFT(STFTBase):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, inverse=False, **kwargs)

    def __call__(self, wav, return_polar=False, eps=EPSILON):
        if self.mode == "torch":
            return pytorch_stft(
                wav, self.frame_len, self.frame_hop,
                n_fft=(self.num_bins - 1) * 2, return_polar=return_polar,
                window=self.w, normalized=self.normalized,
                onesided=self.onesided, center=self.center, eps=eps)
        return forward_stft(
            wav, self.K, self.w, return_polar=return_polar,
            frame_hop=self.frame_hop, pre_emphasis=self.pre_emphasis,
            onesided=self.onesided, center=self.center, eps=eps)


class iSTFT(STFTBase):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, inverse=True, **kwargs)

    def __call__(self, transform, return_polar=False, eps=EPSILON):
        if self.mode == "torch":
            return pytorch_istft(
                transform, self.frame_len, self.frame_hop, self.w,
                n_fft=(self.num_bins - 1) * 2, return_polar=return_polar,
                normalized=self.normalized, onesided=self.onesided,
                center=self.center, eps=eps)
        return inverse_stft(
            transform, self.K, self.w, return_polar=return_polar,
            frame_hop=self.frame_hop, onesided=self.onesided,
            center=self.center, eps=eps)
