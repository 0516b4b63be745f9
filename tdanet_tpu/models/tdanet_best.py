"""TDANetBest — the flagship separator (reference: TDANet_best.py:402-525).

TasNet-style masking pipeline: lattice pad -> Conv1d frame encoder ->
GlobLN -> 1x1 bottleneck -> shared-weight recurrent UConvBlock separator ->
PReLU+1x1 mask head -> ReLU mask x encoder features -> ConvTranspose1d
overlap-add decoder -> trim. Loads the released 2ms/4ms LRS2 checkpoints
via the structural torch bridge.
"""

from __future__ import annotations

import math

import jax

from tdanet_tpu import ops
from tdanet_tpu.models.base import BaseModel, register_model, \
    warn_unused_kwargs
from tdanet_tpu.models.components import Recurrent


@register_model
class TDANetBest(BaseModel):
    def __init__(self, out_channels=128, in_channels=512, num_blocks=16,
                 upsampling_depth=4, enc_kernel_size=21, num_sources=2,
                 sample_rate=16000, fixed_mha=False, remat=False, **unused):
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
        # lattice for arbitrary-length inference (TDANet_best.py:425-427)
        self.lcm = abs(self.enc_kernel_size // 4 * 4 ** upsampling_depth) \
            // math.gcd(self.enc_kernel_size // 4, 4 ** upsampling_depth)
        self.sm = Recurrent(out_channels, in_channels, upsampling_depth,
                            num_blocks, fixed_mha=fixed_mha, remat=remat)

    def init(self, key):
        ks = jax.random.split(key, 6)
        C, B = self.enc_num_basis, self.out_channels
        return {
            "encoder": ops.conv1d_xavier_init(
                ks[0], 1, C, self.enc_kernel_size, bias=False),
            "ln": ops.glob_ln_init(C),
            "bottleneck": ops.conv1d_init(ks[1], C, B, 1),
            "sm": self.sm.init(ks[2]),
            "mask_net": {"0": ops.prelu_init(),
                         "1": ops.conv1d_init(
                             ks[3], B, self.num_sources * C, 1)},
            "decoder": ops.conv_transpose1d_xavier_init(
                ks[4], C * self.num_sources, self.num_sources,
                self.enc_kernel_size),
        }

    def _norm_wav(self, input_wav, compute_dtype):
        was_one_d = input_wav.ndim == 1
        if was_one_d:
            input_wav = input_wav[None]
        if input_wav.ndim == 3:
            input_wav = input_wav.squeeze(1)
        if compute_dtype is not None:
            input_wav = input_wav.astype(compute_dtype)
        return input_wav, was_one_d

    def _front(self, params, wav):
        """Framed conv encoder -> GlobLN -> 1x1 bottleneck. Returns
        (bottleneck_feats, encoder_feats, rest). The named_scope makes
        SURVEY §7(a) (fused frame+encode) attributable in profiles."""
        K = self.enc_kernel_size
        S = K // 4
        with jax.named_scope("frame_encode"):
            x, rest = ops.pad_signal(wav, K, S)
            x = ops.conv1d(x[:, None, :], params["encoder"], stride=S,
                           padding=K // 2)
            s = x
            x = ops.glob_ln(x, params["ln"])
            x = ops.conv1d(x, params["bottleneck"])
        return x, s, rest

    def _back(self, params, x, s, rest):
        """Mask head -> mask x encoder feats -> overlap-add decoder ->
        lattice trim (TDANet_best.py:512-518). named_scope = SURVEY
        §7(c) (fused mask + OLA decode) profile attribution."""
        K = self.enc_kernel_size
        S = K // 4
        with jax.named_scope("mask_decode"):
            x = ops.prelu(x, params["mask_net"]["0"])
            x = ops.conv1d(x, params["mask_net"]["1"])
            Bsz = x.shape[0]
            x = x.reshape(Bsz, self.num_sources, self.enc_num_basis, -1)
            x = jax.nn.relu(x)
            x = x * s[:, None]
            est = ops.conv_transpose1d(
                x.reshape(Bsz, self.num_sources * self.enc_num_basis, -1),
                params["decoder"], stride=S, padding=K // 2)
        return est[:, :, K - S: est.shape[-1] - (rest + K - S)]

    def apply(self, params, input_wav, *, training=False, rng=None,
              compute_dtype=None, num_blocks=None):
        """``num_blocks`` overrides the recurrence depth at apply time
        (early-exit inference over the shared-weight separator; see
        Recurrent.apply n_iter)."""
        input_wav, was_one_d = self._norm_wav(input_wav, compute_dtype)
        x, s, rest = self._front(params, input_wav)
        x = self.sm.apply(params["sm"], x, training=training, rng=rng,
                          n_iter=num_blocks)
        est = self._back(params, x, s, rest)
        if was_one_d:
            return est[0]
        return est

    def pad_rest(self, T: int) -> int:
        """Host-side mirror of ops.pad_signal's ``rest`` for a length-T
        input (needed as a STATIC arg when jitting apply_stage2, whose
        state crosses a jit boundary)."""
        K = self.enc_kernel_size
        S = K // 4
        return K - (S + T % K) % K

    def apply_stage1(self, params, input_wav, *, depth,
                     compute_dtype=None):
        """Progressive separation, stage 1 (inference-only): a
        depth-``depth`` forward that ALSO returns the continuation
        state. Returns ``(est, state)`` where ``est`` equals
        ``apply(num_blocks=depth)`` and ``state`` is an array-only
        pytree: bottleneck mixture feats, recurrence carry, encoder
        feats, and ``delta`` — the per-example convergence proxy
        (relative change of the last two iterates). Utterances whose
        recurrence already converged gain little from more depth;
        ``apply_stage2`` continues only the ones that haven't
        (docs/PERF.md progressive study)."""
        input_wav, _ = self._norm_wav(input_wav, compute_dtype)
        feats, s, rest = self._front(params, input_wav)
        x, delta = self.sm.apply_with_state(params["sm"], feats,
                                            n_iter=depth)
        est = self._back(params, x, s, rest)
        return est, {"mixture": feats, "carry": x, "enc": s,
                     "delta": delta}

    def apply_stage2(self, params, state, *, n_more, rest):
        """Progressive separation, stage 2: EXACT continuation of
        ``n_more`` further shared-weight iterations from stage 1's
        carry — output equals ``apply(num_blocks=depth + n_more)``.
        ``rest`` is the static lattice padding for the original input
        length (``pad_rest(T)``)."""
        x = self.sm.continue_apply(params["sm"], state["mixture"],
                                   state["carry"], n_more)
        return self._back(params, x, state["enc"], rest)

    def get_model_args(self):
        return {
            "out_channels": self.out_channels,
            "in_channels": self.in_channels,
            "num_blocks": self.num_blocks,
            "upsampling_depth": self.upsampling_depth,
            "enc_kernel_size": self.enc_kernel_size_ms,
            "num_sources": self.num_sources,
            "sample_rate": self._sample_rate,
        }
