"""TDANet variant family — paper baselines and research ablations.

Reference files (per-class cites in docstrings): TDANet_yang.py,
TDANet_origin.py, TDANetOld.py, TDANet.py, TDANet_no_drop.py,
TDANet_ULayer_num.py, TDANet_chunk.py, TDANet_mult_tes.py,
TDANet_attn.py, TDANet_gate_variant.py.

All share the TasNet masking pipeline of TDANetBest; they differ in the
separator block topology (inject-sum vs LA fusion, avg-pool vs conv-pool
global branch, downsampling stride), the MHA flavor, the recurrence
(plain vs GRU-gated), and the front end (framed conv vs multi-kernel
bank vs waveform chunking).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from tdanet_tpu import ops
from tdanet_tpu.models.base import BaseModel, register_model, \
    warn_unused_kwargs
from tdanet_tpu.models.components import (
    GatedRecurrent,
    Recurrent,
    UConvBlockInject,
)


class _StandardTDANet(BaseModel):
    """Shared lattice-pad -> encode -> norm -> bottleneck -> separate ->
    mask -> decode -> trim pipeline (identical across the family; e.g.
    TDANet_yang.py:441-560)."""

    NORM = "gn"          # GroupNorm flavor everywhere except Best
    FIXED_MHA = False
    POOL = "avg"
    DOWN_STRIDE = 2
    INJECT = "add"
    EXPAND_PAIR = "prev"
    MHA_KWARGS = None
    GA_USE_ATTN = True
    DROPS = dict(drop_path=0.1, attn_dropout=0.1, ffn_drop=0.1)
    GATED = False

    def __init__(self, out_channels=128, in_channels=512, num_blocks=16,
                 upsampling_depth=4, enc_kernel_size=21, num_sources=2,
                 sample_rate=16000, remat=False, **unused):
        warn_unused_kwargs(type(self).__name__, unused)
        super().__init__(sample_rate=sample_rate)
        self.out_channels = out_channels
        self.in_channels = in_channels
        self.num_blocks = num_blocks
        self.upsampling_depth = upsampling_depth
        self.enc_kernel_size_ms = enc_kernel_size
        self.enc_kernel_size = enc_kernel_size * sample_rate // 1000
        self.enc_num_basis = self.enc_kernel_size // 2 + 1
        self.num_sources = num_sources
        self.lcm = abs(self.enc_kernel_size // 4 * 4 ** upsampling_depth) \
            // math.gcd(self.enc_kernel_size // 4, 4 ** upsampling_depth)
        block = UConvBlockInject(
            out_channels, in_channels, upsampling_depth, norm=self.NORM,
            pool=self.POOL, down_stride=self.DOWN_STRIDE,
            fixed_mha=self.FIXED_MHA, inject=self.INJECT,
            expand_pair=self.EXPAND_PAIR, mha_kwargs=self.MHA_KWARGS,
            ga_use_attn=self.GA_USE_ATTN, **self.DROPS)
        if self.GATED:
            self.sm = GatedRecurrent(out_channels, in_channels,
                                     upsampling_depth, num_blocks,
                                     block=block)
        else:
            self.sm = Recurrent(out_channels, in_channels, upsampling_depth,
                                num_blocks, norm=self.NORM, remat=remat,
                                block=block)

    def init(self, key):
        ks = jax.random.split(key, 6)
        C, B = self.enc_num_basis, self.out_channels
        return {
            "encoder": ops.conv1d_xavier_init(ks[0], 1, C,
                                              self.enc_kernel_size),
            "ln": ops.layer_norm_init(C) if self.NORM == "gn"
            else ops.glob_ln_init(C),
            "bottleneck": ops.conv1d_init(ks[1], C, B, 1),
            "sm": self.sm.init(ks[2]),
            "mask_net": {"0": ops.prelu_init(),
                         "1": ops.conv1d_init(ks[3], B,
                                              self.num_sources * C, 1)},
            "decoder": ops.conv_transpose1d_xavier_init(
                ks[4], C * self.num_sources, self.num_sources,
                self.enc_kernel_size),
        }

    def _apply_ln(self, p, x):
        if self.NORM == "gn":
            return ops.group_norm1(x, p)
        return ops.glob_ln(x, p)

    def apply(self, params, input_wav, *, training=False, rng=None,
              compute_dtype=None):
        was_one_d = input_wav.ndim == 1
        if was_one_d:
            input_wav = input_wav[None]
        if input_wav.ndim == 3:
            input_wav = input_wav.squeeze(1)
        if compute_dtype is not None:
            input_wav = input_wav.astype(compute_dtype)
        K, S = self.enc_kernel_size, self.enc_kernel_size // 4
        x, rest = ops.pad_signal(input_wav, K, S)
        x = ops.conv1d(x[:, None, :], params["encoder"], stride=S,
                       padding=K // 2)
        s = x
        x = self._apply_ln(params["ln"], x)
        x = ops.conv1d(x, params["bottleneck"])
        x = self.sm.apply(params["sm"], x, training=training, rng=rng)
        x = ops.prelu(x, params["mask_net"]["0"])
        x = ops.conv1d(x, params["mask_net"]["1"])
        Bs = x.shape[0]
        x = jax.nn.relu(x.reshape(Bs, self.num_sources, self.enc_num_basis,
                                  -1))
        x = x * s[:, None]
        est = ops.conv_transpose1d(
            x.reshape(Bs, self.num_sources * self.enc_num_basis, -1),
            params["decoder"], stride=S, padding=K // 2)
        est = est[:, :, K - S: est.shape[-1] - (rest + K - S)]
        return est[0] if was_one_d else est

    def get_model_args(self):
        return {"out_channels": self.out_channels,
                "in_channels": self.in_channels,
                "num_blocks": self.num_blocks,
                "upsampling_depth": self.upsampling_depth,
                "enc_kernel_size": self.enc_kernel_size_ms,
                "num_sources": self.num_sources,
                "sample_rate": self._sample_rate}


@register_model
class TDANetYang(_StandardTDANet):
    """Default model of configs/tdanet.yml:3 — paper topology with
    GroupNorm + avg-pool inject-sum; instantiates the unfixed MHA
    (TDANet_yang.py:271,441-560). Accepts the unused feat_len arg."""

    def __init__(self, *args, feat_len=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.feat_len = feat_len


@register_model
class TDANetOrigin(_StandardTDANet):
    """Faithful ICLR-paper baseline (TDANet_origin.py:292-455)."""


@register_model
class TDANetOld(_StandardTDANet):
    """Older paper baseline: batch_first=True MHA (true attention over
    frames), multiplicative sigmoid injection gate, and the corrected
    first expansion pairing x_fused[i+1] (TDANetOld.py:226-360)."""

    INJECT = "gate"
    EXPAND_PAIR = "next"
    MHA_KWARGS = dict(batch_first=True, self_residual=True)


@register_model
class TDANet(_StandardTDANet):
    """Modified research version: the global branch downsamples with
    strided separable "conv-pool" convs instead of adaptive avg-pool,
    applied in reverse scale order (TDANet.py:528-617,788-913)."""

    POOL = "conv"

    def __init__(self, *args, feat_len=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.feat_len = feat_len


@register_model
class TDANetNoDrop(_StandardTDANet):
    """All dropout/droppath -> 0 ablation (TDANet_no_drop.py)."""

    DROPS = dict(drop_path=0.0, attn_dropout=0.0, ffn_drop=0.0)


@register_model
class TDANetULayerNum(_StandardTDANet):
    """Depth ablation: downsampling stride hacked to 16 (kernel 33) and
    the GlobalAttention's MHA commented out — MLP-only global branch
    (TDANet_ULayer_num.py:250-260,310-321)."""

    DOWN_STRIDE = 16
    GA_USE_ATTN = False


@register_model
class TDANetGateVariant(_StandardTDANet):
    """GRU-style reset/update convolution gates around the shared U-block
    iteration (TDANet_gate_variant.py:392-533)."""

    GATED = True


@register_model
class TDANetChunk(BaseModel):
    """Replaces the learned frame encoder with a waveform reshape into
    ``n_chunk`` channels; the masked chunks are reshaped straight back to
    waveforms (no transposed-conv decode) (TDANet_chunk.py:393-520)."""

    NORM = "gn"

    def __init__(self, out_channels=128, in_channels=512, num_blocks=16,
                 upsampling_depth=4, n_chunk=32, num_sources=2,
                 sample_rate=16000, **unused):
        warn_unused_kwargs(type(self).__name__, unused)
        super().__init__(sample_rate=sample_rate)
        self.out_channels = out_channels
        self.in_channels = in_channels
        self.num_blocks = num_blocks
        self.upsampling_depth = upsampling_depth
        self.n_chunk = n_chunk
        self.num_sources = num_sources
        block = UConvBlockInject(out_channels, in_channels,
                                 upsampling_depth, norm=self.NORM)
        self.sm = Recurrent(out_channels, in_channels, upsampling_depth,
                            num_blocks, norm=self.NORM, block=block)

    def init(self, key):
        ks = jax.random.split(key, 4)
        C, B = self.n_chunk, self.out_channels
        return {
            "ln": ops.layer_norm_init(C),
            "bottleneck": ops.conv1d_init(ks[0], C, B, 1),
            "sm": self.sm.init(ks[1]),
            "mask_net": {"0": ops.prelu_init(),
                         "1": ops.conv1d_init(ks[2], B,
                                              self.num_sources * C, 1)},
        }

    def apply(self, params, input_wav, *, training=False, rng=None,
              compute_dtype=None):
        if input_wav.ndim == 1:
            input_wav = input_wav[None]
        if input_wav.ndim == 3:
            input_wav = input_wav.squeeze(1)
        if compute_dtype is not None:
            input_wav = input_wav.astype(compute_dtype)
        Bs = input_wav.shape[0]
        x = input_wav.reshape(Bs, self.n_chunk, -1)
        s = x
        x = ops.group_norm1(x, params["ln"])
        x = ops.conv1d(x, params["bottleneck"])
        x = self.sm.apply(params["sm"], x, training=training, rng=rng)
        x = ops.prelu(x, params["mask_net"]["0"])
        x = ops.conv1d(x, params["mask_net"]["1"])
        x = jax.nn.relu(x.reshape(Bs, self.num_sources, self.n_chunk, -1))
        x = x * s[:, None]
        return x.reshape(Bs, self.num_sources, -1)

    def get_model_args(self):
        return {"out_channels": self.out_channels,
                "in_channels": self.in_channels,
                "num_blocks": self.num_blocks,
                "upsampling_depth": self.upsampling_depth,
                "n_chunk": self.n_chunk,
                "num_sources": self.num_sources,
                "sample_rate": self._sample_rate}


@register_model
class TDANetMultRes(_StandardTDANet):
    """Multi-resolution front end: ``kernels`` parallel Conv1d banks with
    kernel k*base_ks (shared stride base_ks//4), channel-concatenated to
    out_channels; no bottleneck; mask/decoder sized on out_channels; the
    GlobalAttention uses MultiHeadAttentionFixed
    (TDANet_mult_tes.py:278,317-344,455-640)."""

    FIXED_MHA = True

    def __init__(self, out_channels=128, in_channels=512, num_blocks=16,
                 upsampling_depth=4, enc_kernel_size=21, num_sources=2,
                 sample_rate=16000, feat_len=None, kernels=3, **unused):
        warn_unused_kwargs(type(self).__name__, unused)
        assert out_channels % kernels == 0
        super().__init__(out_channels, in_channels, num_blocks,
                         upsampling_depth, enc_kernel_size, num_sources,
                         sample_rate)
        self.kernels = kernels
        self.feat_len = feat_len

    def init(self, key):
        ks = jax.random.split(key, 5 + self.kernels)
        B = self.out_channels
        enc = {}
        for k in range(1, self.kernels + 1):
            enc[str(k - 1)] = ops.conv1d_xavier_init(
                ks[k - 1], 1, B // self.kernels, k * self.enc_kernel_size)
        return {
            "encoder": {"conv_list": enc},
            "ln": ops.layer_norm_init(B),
            "sm": self.sm.init(ks[-3]),
            "mask_net": {"0": ops.prelu_init(),
                         "1": ops.conv1d_init(ks[-2], B,
                                              self.num_sources * B, 1)},
            "decoder": ops.conv_transpose1d_xavier_init(
                ks[-1], B * self.num_sources, self.num_sources,
                self.enc_kernel_size),
        }

    def apply(self, params, input_wav, *, training=False, rng=None,
              compute_dtype=None):
        was_one_d = input_wav.ndim == 1
        if was_one_d:
            input_wav = input_wav[None]
        if input_wav.ndim == 3:
            input_wav = input_wav.squeeze(1)
        if compute_dtype is not None:
            input_wav = input_wav.astype(compute_dtype)
        K, S = self.enc_kernel_size, self.enc_kernel_size // 4
        x, rest = ops.pad_signal(input_wav, K, S)
        x = x[:, None, :]
        embs = []
        for k in range(1, self.kernels + 1):
            conv_ks = k * K
            embs.append(ops.conv1d(x, params["encoder"]["conv_list"]
                                   [str(k - 1)], stride=S,
                                   padding=conv_ks // 2))
        L = min(e.shape[-1] for e in embs)
        x = jnp.concatenate([e[..., :L] for e in embs], axis=1)
        s = x
        x = ops.group_norm1(x, params["ln"])
        x = self.sm.apply(params["sm"], x, training=training, rng=rng)
        x = ops.prelu(x, params["mask_net"]["0"])
        x = ops.conv1d(x, params["mask_net"]["1"])
        Bs = x.shape[0]
        x = jax.nn.relu(x.reshape(Bs, self.num_sources, self.out_channels,
                                  -1))
        x = x * s[:, None]
        est = ops.conv_transpose1d(
            x.reshape(Bs, self.num_sources * self.out_channels, -1),
            params["decoder"], stride=S, padding=K // 2)
        est = est[:, :, K - S: est.shape[-1] - (rest + K - S)]
        return est[0] if was_one_d else est

    def get_model_args(self):
        args = super().get_model_args()
        args["kernels"] = self.kernels
        return args


@register_model
class TDANetAttn(_StandardTDANet):
    """Adds fixed_len/stride ctor args that reparameterize the encoder
    kernel/stride (kernel = 4*stride, padding = 2*stride) and a
    center-padding mode to a fixed frame count (TDANet_attn.py:397-560)."""

    def __init__(self, out_channels=128, in_channels=512, num_blocks=16,
                 upsampling_depth=4, enc_kernel_size=21, num_sources=2,
                 sample_rate=16000, feat_len=None, fixed_len=None,
                 stride=None, **unused):
        warn_unused_kwargs(type(self).__name__, unused)
        super().__init__(out_channels, in_channels, num_blocks,
                         upsampling_depth, enc_kernel_size, num_sources,
                         sample_rate)
        self.feat_len = feat_len
        self.fixed_len = fixed_len
        self.stride = stride
        if stride is not None:
            self.win_k, self.win_s, self.win_p = (
                stride * 4, stride, stride * 2)
        else:
            self.win_k, self.win_s, self.win_p = (
                self.enc_kernel_size, self.enc_kernel_size // 4,
                self.enc_kernel_size // 2)

    def init(self, key):
        p = super().init(key)
        C = self.enc_num_basis
        k1, k2 = jax.random.split(key)
        p["encoder"] = ops.conv1d_xavier_init(k1, 1, C, self.win_k)
        p["decoder"] = ops.conv_transpose1d_xavier_init(
            k2, C * self.num_sources, self.num_sources, self.win_k)
        return p

    def apply(self, params, input_wav, *, training=False, rng=None,
              compute_dtype=None):
        was_one_d = input_wav.ndim == 1
        if was_one_d:
            input_wav = input_wav[None]
        if input_wav.ndim == 3:
            input_wav = input_wav.squeeze(1)
        if compute_dtype is not None:
            input_wav = input_wav.astype(compute_dtype)
        K, S, P = self.win_k, self.win_s, self.win_p
        if self.fixed_len is not None:
            # center-pad to (fixed_len-1)*stride (TDANet_attn.py pad_input)
            target = (self.fixed_len - 1) * S
            T = input_wav.shape[-1]
            rest = (target - T) // 2
            x = jnp.pad(input_wav, ((0, 0), (rest, target - T - rest)))
        else:
            x, rest = ops.pad_signal(input_wav, K, S)
        x = ops.conv1d(x[:, None, :], params["encoder"], stride=S,
                       padding=P)
        s = x
        x = self._apply_ln(params["ln"], x)
        x = ops.conv1d(x, params["bottleneck"])
        x = self.sm.apply(params["sm"], x, training=training, rng=rng)
        x = ops.prelu(x, params["mask_net"]["0"])
        x = ops.conv1d(x, params["mask_net"]["1"])
        Bs = x.shape[0]
        x = jax.nn.relu(x.reshape(Bs, self.num_sources, self.enc_num_basis,
                                  -1))
        x = x * s[:, None]
        est = ops.conv_transpose1d(
            x.reshape(Bs, self.num_sources * self.enc_num_basis, -1),
            params["decoder"], stride=S, padding=P)
        if self.fixed_len is not None:
            est = est[:, :, rest:est.shape[-1] - rest]
        else:
            est = est[:, :, K - S: est.shape[-1] - (rest + K - S)]
        return est[0] if was_one_d else est


@register_model
class TDANetV2(_StandardTDANet):
    """TDANetBlock restructure: inject-sum fusion with the corrected
    first expansion pairing x_fused[i+1] and the unfixed MHA active
    (TDANet-v2.py:308-404,406-). NOTE: the reference class itself is
    uninstantiable (it subclasses nn.Module but passes sample_rate to
    super().__init__, TDANet-v2.py:417) and is not exported; this is the
    working equivalent of its evident intent."""

    EXPAND_PAIR = "next"
    MHA_KWARGS = dict(batch_first=False, self_residual=True)
