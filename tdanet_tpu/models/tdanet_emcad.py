"""EMCAD-integrated and TransXNet-flavored TDANet variants.

Reference files: TDANet_intergral*.py, TDANet_EMCAD*.py,
TDANet_dynamic_down.py, TDANet_OSRA_gated.py, TDANet_channel_fusion.py,
TDANet_MSFFN.py, TDANet_transxnet.py. The family shares the TasNet
masking pipeline; the separator's U-block swaps in:

- downsampling: IDConv DynamicConv1d / fixed-length FCDyConv1d / plain
  depthwise convs (TDANet_intergral_v1_6.py:307-334, ..._final.py:318-348);
- global attention: MLP-only (MHA commented out in the whole family),
  OSRA Attention1D with a learned relative-pos bias
  (TDANet_OSRA_gated.py:259-278,349-356), MS-FFN Mlp1D
  (TDANet_MSFFN.py:260-272), or the unfixed MHA (TDANet_EMCAD_f1.py);
- fusion: inject-sum or per-scale CrossAttention1D mixers
  (TDANet_transxnet.py:330-366,402-405);
- an EMCAD decoder over (global, x_fused) skips before the LA expansion
  (TDANet_intergral_v1_6.py:376-385), or as the direct output (EMCADF1);
- last-layer fusion: LA or the LAOpt1/2/3/4/5 research variants.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from tdanet_tpu import ops
from tdanet_tpu.models import emcad as em
from tdanet_tpu.models import transxnet as tx
from tdanet_tpu.models.base import BaseModel, register_model, \
    warn_unused_kwargs
from tdanet_tpu.models.components import (
    ConvNorm,
    ConvNormAct,
    DilatedConvNorm,
    FFN,
    LA,
    MultiHeadAttentionModule,
    Recurrent,
    _fold,
)


def feat_len_ladder(feat_len, depth):
    """Scale lengths fine->coarse: L0=feat_len, L_{k+1}=(L_k+1)//2."""
    out = [feat_len]
    for _ in range(depth - 1):
        out.append((out[-1] + 1) // 2)
    return out


def feat_len_for(T, enc_kernel_ms, sample_rate):
    """Scale-0 frame count for an input of ``T`` samples — the static
    ``feat_len`` the era models' RPE tables need at construction
    (mirrors ops.pad_signal + the stride-K/4 framed encoder with K//2
    padding; enc_kernel_ms in milliseconds, as in the configs)."""
    K = enc_kernel_ms * sample_rate // 1000
    S = K // 4
    rest = K - (S + T % K) % K
    T_p = T + (rest if rest > 0 else 0) + 2 * (K - S)
    return (T_p + 2 * (K // 2) - K) // S + 1


# ---------------------------------------------------------------------------
# LAOpt research fusions (used as last_layer in laopt variants)
# ---------------------------------------------------------------------------


class LAOpt1:
    """x_l * sigmoid(interp(global_act(x_g))) + x_l
    (TDANet_intergral_v1_6_LAOpt1.py:293-314)."""

    def __init__(self, inp, oup, kernel=1, norm="gn"):
        groups = inp if inp == oup else 1
        self.global_act = ConvNorm(inp, oup, kernel, groups=groups,
                                   bias=False, norm=norm)

    def init(self, key):
        return {"global_act": self.global_act.init(key)}

    def apply(self, p, x_l, x_g):
        sig = ops.interpolate_nearest(
            jax.nn.sigmoid(self.global_act.apply(p["global_act"], x_g)),
            x_l.shape[-1])
        return x_l * sig + x_l


class LAOpt2:
    """gated + CAB(ratio 32) channel re-weighting, no residual
    (TDANet_channel_fusion.py:292-314)."""

    def __init__(self, inp, oup, kernel=1, norm="gn", ratio=32):
        groups = inp if inp == oup else 1
        self.global_act = ConvNorm(inp, oup, kernel, groups=groups,
                                   bias=False, norm=norm)
        self.cab = em.CAB(inp, oup, ratio=ratio)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"global_act": self.global_act.init(k1),
                "cab": self.cab.init(k2)}

    def apply(self, p, x_l, x_g):
        sig = ops.interpolate_nearest(
            jax.nn.sigmoid(self.global_act.apply(p["global_act"], x_g)),
            x_l.shape[-1])
        out = x_l * sig
        return self.cab.apply(p["cab"], out) * out


class LAOpt3(LAOpt2):
    """LAOpt2 with ratio 16 and a residual
    (TDANet_intergral_v1_6_noCBAM_laopt3.py:293-315)."""

    def __init__(self, inp, oup, kernel=1, norm="gn"):
        super().__init__(inp, oup, kernel, norm, ratio=16)

    def apply(self, p, x_l, x_g):
        out = x_l * ops.interpolate_nearest(
            jax.nn.sigmoid(self.global_act.apply(p["global_act"], x_g)),
            x_l.shape[-1])
        out = self.cab.apply(p["cab"], out) * out
        return x_l + out


class LAOpt4:
    """Transposed-conv upsampled gate + CAB + residual
    (..._laopt4.py:293-316): global_act = ConvTranspose1d(k=3, s=2, p=0)
    on F.pad(x_g, (0,1)), sliced to the local length."""

    def __init__(self, inp, oup, kernel=1, norm="gn", use_cab=True):
        self.groups = inp if inp == oup else 1
        self.inp, self.oup = inp, oup
        self.use_cab = use_cab
        if use_cab:
            self.cab = em.CAB(inp, oup, ratio=16)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        bound = 1.0 / math.sqrt((self.inp // self.groups) * 3)
        p = {"global_act": {"weight": jax.random.uniform(
            k1, (self.inp, self.oup // self.groups, 3), jnp.float32,
            -bound, bound)}}
        if self.use_cab:
            p["cab"] = self.cab.init(k2)
        return p

    def apply(self, p, x_l, x_g):
        g = jnp.pad(x_g, ((0, 0), (0, 0), (0, 1)))
        up = ops.conv_transpose1d(g, p["global_act"], stride=2, padding=0,
                                  groups=self.groups)
        sig = jax.nn.sigmoid(up[:, :, :x_l.shape[-1]])
        out = x_l * sig
        if self.use_cab:
            out = self.cab.apply(p["cab"], out) * out
        return x_l + out


class LAOpt5(LAOpt4):
    """LAOpt4 without the CAB (..._laopt5.py:264-283)."""

    def __init__(self, inp, oup, kernel=1, norm="gn"):
        super().__init__(inp, oup, kernel, norm, use_cab=False)


# ---------------------------------------------------------------------------
# Global-attention flavors
# ---------------------------------------------------------------------------


class GAEra:
    """GlobalAttention as found across the EMCAD-era files: optionally an
    attention sublayer (None / unfixed MHA / OSRA), plus an FFN ("Mlp") or
    MS-FFN ("Mlp1D") sublayer, with DropPath residuals."""

    def __init__(self, out_chan, drop_path=0.0, attn="none", mlp="ffn",
                 mlp_drop=0.1, norm="gn", num_heads=4, sr_ratio=4):
        self.attn_kind = attn
        self.drop_path = drop_path
        if attn == "mha":
            self.attn = MultiHeadAttentionModule(out_chan, 8, 0.1)
        elif attn == "osra":
            self.attn = tx.Attention1D(out_chan, num_heads=num_heads,
                                       sr_ratio=sr_ratio)
        if mlp == "ffn":
            self.mlp = FFN(out_chan, out_chan * 2, drop=mlp_drop, norm=norm)
        else:  # ms-ffn
            self.mlp = tx.Mlp1D(out_chan, out_chan * 2, act="relu",
                                drop=mlp_drop)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        p = {"mlp": self.mlp.init(k2)}
        if self.attn_kind != "none":
            p["attn"] = self.attn.init(k1)
        return p

    def apply(self, p, x, *, training=False, rng=None, rpe=None):
        def dp(v, i):
            if training and self.drop_path > 0:
                return ops.drop_path(v, _fold(rng, i), self.drop_path, True)
            return v

        if self.attn_kind == "mha":
            x = x + dp(self.attn.apply(p["attn"], x, training=training,
                                       rng=_fold(rng, 1)), 2)
        elif self.attn_kind == "osra":
            x = x + dp(self.attn.apply(p["attn"], x, training=training,
                                       rng=_fold(rng, 1), rpe=rpe), 2)
        x = x + dp(self.mlp.apply(p["mlp"], x, training=training,
                                  rng=_fold(rng, 3)), 4)
        return x


# ---------------------------------------------------------------------------
# The parameterized U-block of the EMCAD era
# ---------------------------------------------------------------------------

_LAST_LAYERS = {"la": LA, "laopt1": LAOpt1, "laopt2": LAOpt2,
                "laopt3": LAOpt3, "laopt4": LAOpt4, "laopt5": LAOpt5}


class UConvBlockEra:
    def __init__(self, out_channels=128, in_channels=512,
                 upsampling_depth=5, feat_len=None, down="idconv",
                 ga=None, emcad_cls=None, emcad_kw=None, fusion="inject",
                 last="la", emcad_direct=False, norm="gn"):
        self.depth = upsampling_depth
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.feat_len = feat_len
        self.down = down
        self.fusion = fusion
        self.emcad_direct = emcad_direct
        self.proj_1x1 = ConvNormAct(out_channels, in_channels, 1, norm=norm)
        lens = feat_len_ladder(feat_len, upsampling_depth) \
            if feat_len else None
        self.spp_dw = []
        for i in range(upsampling_depth):
            stride = 1 if i == 0 else 2
            k = 2 * stride + 1 if i > 0 else 5
            if down == "idconv":
                self.spp_dw.append(tx.DynamicConv1d(
                    in_channels, kernel_size=k, reduction_ratio=4,
                    num_groups=2, stride=stride, act=None, bias=True))
            elif down == "fcdy":
                in_feat = lens[max(i - 1, 0)]
                self.spp_dw.append(tx.FCDyConv1d(
                    in_channels, in_feat, kernel_size=k, reduction_ratio=4,
                    num_groups=2, stride=stride, act=None, bias=True))
            else:
                self.spp_dw.append(DilatedConvNorm(
                    in_channels, in_channels, k, stride=stride,
                    groups=in_channels, norm=norm))
        self.globalatt = ga if ga is not None else GAEra(in_channels)
        if getattr(self.globalatt, "attn_kind", "") == "osra":
            rpe_attn = self.globalatt.attn
        elif isinstance(self.globalatt, tx.Block1D):
            rpe_attn = self.globalatt.token_mixer.global_unit
        else:
            rpe_attn = None
        self.use_rpe = rpe_attn is not None
        if self.use_rpe:
            self.rpe_shape = (1, rpe_attn.num_heads, lens[-1],
                              -(-lens[-1] // rpe_attn.sr_ratio))
        if fusion == "mixers":
            self.global_mixers = [tx.CrossAttention1D(in_channels,
                                                      num_heads=1,
                                                      sr_ratio=1)
                                  for _ in range(upsampling_depth)]
        self.emcad = None
        if emcad_cls is not None:
            self.emcad = emcad_cls(
                channels=[in_channels] * upsampling_depth,
                feat_len=feat_len, **(emcad_kw or {}))
        last_cls = _LAST_LAYERS[last]
        self.last_layer = [last_cls(in_channels, in_channels, 5, norm=norm)
                           for _ in range(upsampling_depth - 1)]

    def init(self, key):
        ks = iter(jax.random.split(key, 8 + 3 * self.depth))
        p = {"proj_1x1": self.proj_1x1.init(next(ks)),
             "spp_dw": {str(i): m.init(next(ks))
                        for i, m in enumerate(self.spp_dw)},
             "globalatt": self.globalatt.init(next(ks)),
             "last_layer": {str(i): m.init(next(ks))
                            for i, m in enumerate(self.last_layer)},
             "res_conv": ops.conv1d_init(next(ks), self.in_channels,
                                         self.out_channels, 1)}
        if self.use_rpe:
            p["relative_pos_enc"] = jnp.zeros(self.rpe_shape)
        if self.fusion == "mixers":
            p["global_mixers"] = {str(i): m.init(next(ks))
                                  for i, m in enumerate(self.global_mixers)}
        if self.emcad is not None:
            p["emcad"] = self.emcad.init(next(ks))
        return p

    def apply(self, p, x, *, training=False, rng=None):
        residual = x
        output1 = self.proj_1x1.apply(p["proj_1x1"], x)
        output = [self.spp_dw[0].apply(p["spp_dw"]["0"], output1)]
        for k in range(1, self.depth):
            output.append(self.spp_dw[k].apply(p["spp_dw"][str(k)],
                                               output[-1]))
        coarsest = output[-1].shape[-1]
        global_f = output[-1]
        for fea in output[:-1]:
            global_f = global_f + ops.adaptive_avg_pool1d(fea, coarsest)
        rpe = p.get("relative_pos_enc")
        global_f = self.globalatt.apply(p["globalatt"], global_f,
                                        training=training,
                                        rng=_fold(rng, 7), rpe=rpe)

        if self.fusion == "mixers":
            x_fused = [self.global_mixers[i].apply(
                p["global_mixers"][str(i)], output[i], global_f,
                training=training, rng=_fold(rng, 20 + i))
                for i in range(self.depth)]
        else:
            x_fused = [ops.interpolate_nearest(global_f, o.shape[-1]) + o
                       for o in output]

        if self.emcad is not None:
            if self.emcad_direct:
                expanded = self.emcad.apply(p["emcad"], global_f, x_fused)
                return ops.conv1d(expanded, p["res_conv"]) + residual
            emcaded = self.emcad.apply(p["emcad"], global_f, x_fused)
            emcaded = list(reversed(emcaded))  # fine -> coarse
            x_fused = emcaded

        expanded = None
        for i in range(self.depth - 2, -1, -1):
            g = x_fused[i - 1] if i == self.depth - 2 else expanded
            expanded = self.last_layer[i].apply(p["last_layer"][str(i)],
                                                x_fused[i], g)
        return ops.conv1d(expanded, p["res_conv"]) + residual


class UConvBlockV14:
    """The v1_4 inline LGAG3 composition (TDANet_intergral_v1_4.py:300-415):
    per-scale CAB/SAB enhancement, bottom-up LGAG3 chain building x_fused,
    then the standard LA expansion."""

    def __init__(self, out_channels=128, in_channels=512,
                 upsampling_depth=5, feat_len=None, norm="gn"):
        self.depth = upsampling_depth
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.proj_1x1 = ConvNormAct(out_channels, in_channels, 1, norm=norm)
        self.spp_dw = []
        for i in range(upsampling_depth):
            stride = 1 if i == 0 else 2
            k = 2 * stride + 1 if i > 0 else 5
            self.spp_dw.append(tx.DynamicConv1d(
                in_channels, kernel_size=k, reduction_ratio=4, num_groups=2,
                stride=stride, act=None, bias=True))
        self.cab = [em.CAB(in_channels) for _ in range(upsampling_depth)]
        self.sab = em.SAB()
        self.globalatt = GAEra(in_channels, drop_path=0.1, attn="none",
                               mlp="ffn", mlp_drop=0.1, norm=norm)
        self.last_layer = [LA(in_channels, in_channels, 5, norm=norm)
                           for _ in range(upsampling_depth - 1)]
        # v1_4 imports its blocks from EMCAD_test -> lite-v2 flavors
        # (TDANet_intergral_v1_4.py:14)
        self.eucb_layer = [em.EUCB(in_channels, in_channels, 3, 1,
                                   activation="prelu", light=True,
                                   shuffle_times=3)
                           for _ in range(upsampling_depth - 1)]
        self.lgag_layer = [em.LGAG3(in_channels, in_channels, in_channels,
                                    kernel_size=3, groups=256,
                                    activation="prelu")
                           for _ in range(upsampling_depth - 1)]
        self.mscb_layer = [em.MSCBLayer(in_channels, in_channels, n=1,
                                        stride=1, kernel_sizes=[1, 3, 5],
                                        expansion_factor=0.5,
                                        activation="prelu", lite_v2=True)
                           for _ in range(upsampling_depth - 1)]
        self.lgag_0 = em.LGAG(in_channels, in_channels, in_channels,
                              kernel_size=3, groups=256, activation="prelu")

    def init(self, key):
        ks = iter(jax.random.split(key, 10 + 6 * self.depth))
        return {
            "proj_1x1": self.proj_1x1.init(next(ks)),
            "spp_dw": {str(i): m.init(next(ks))
                       for i, m in enumerate(self.spp_dw)},
            "cab": {str(i): m.init(next(ks))
                    for i, m in enumerate(self.cab)},
            "sab": self.sab.init(next(ks)),
            "globalatt": self.globalatt.init(next(ks)),
            "last_layer": {str(i): m.init(next(ks))
                           for i, m in enumerate(self.last_layer)},
            "eucb_layer": {str(i): m.init(next(ks))
                           for i, m in enumerate(self.eucb_layer)},
            "lgag_layer": {str(i): m.init(next(ks))
                           for i, m in enumerate(self.lgag_layer)},
            "mscb_layer": {str(i): m.init(next(ks))
                           for i, m in enumerate(self.mscb_layer)},
            "lgag_0": self.lgag_0.init(next(ks)),
            "res_conv": ops.conv1d_init(next(ks), self.in_channels,
                                        self.out_channels, 1),
        }

    def apply(self, p, x, *, training=False, rng=None):
        residual = x
        output1 = self.proj_1x1.apply(p["proj_1x1"], x)
        output = [self.spp_dw[0].apply(p["spp_dw"]["0"], output1)]
        for k in range(1, self.depth):
            output.append(self.spp_dw[k].apply(p["spp_dw"][str(k)],
                                               output[-1]))
        coarsest = output[-1].shape[-1]
        global_f = output[-1]
        for fea in output[:-1]:
            global_f = global_f + ops.adaptive_avg_pool1d(fea, coarsest)
        global_f = self.globalatt.apply(p["globalatt"], global_f,
                                        training=training,
                                        rng=_fold(rng, 7))
        x_fused = [self.lgag_0.apply(p["lgag_0"], global_f, output[-1])]
        tmp_x = output[-1]
        for idx in range(self.depth - 1):
            scale = self.depth - 2 - idx
            tmp_bottom = self.eucb_layer[idx].apply(
                p["eucb_layer"][str(idx)], tmp_x, output[scale].shape[-1])
            tmp_g = ops.interpolate_nearest(global_f,
                                            output[scale].shape[-1])
            tmp_x = self.lgag_layer[idx].apply(
                p["lgag_layer"][str(idx)], tmp_g, output[scale],
                tmp_bottom) + output[scale]
            tmp_x = self.cab[idx].apply(p["cab"][str(idx)], tmp_x) * tmp_x
            tmp_x = self.sab.apply(p["sab"], tmp_x) * tmp_x
            # NOTE: the MSCB output is appended but NOT carried — the next
            # iteration's EUCB consumes the pre-MSCB feature
            # (TDANet_intergral_v1_4.py:408)
            x_fused.append(self.mscb_layer[idx].apply(
                p["mscb_layer"][str(idx)], tmp_x))
        x_fused = list(reversed(x_fused))
        expanded = None
        for i in range(self.depth - 2, -1, -1):
            g = x_fused[i - 1] if i == self.depth - 2 else expanded
            expanded = self.last_layer[i].apply(p["last_layer"][str(i)],
                                                x_fused[i], g)
        return ops.conv1d(expanded, p["res_conv"]) + residual


# ---------------------------------------------------------------------------
# Model classes
# ---------------------------------------------------------------------------


class _EraTDANet(BaseModel):
    """Shared pipeline for the EMCAD-era variants (all use GroupNorm,
    plain Recurrent, and the standard encoder/mask/decoder)."""

    DOWN = "idconv"
    EMCAD_CLS = None
    EMCAD_KW = dict(expansion_factor=0.5, activation="prelu")
    EMCAD_DIRECT = False
    GA_KW = dict(drop_path=0.0, attn="none", mlp="ffn", mlp_drop=0.0)
    FUSION = "inject"
    LAST = "la"
    BLOCK_CLS = None  # override for v1_4

    def __init__(self, out_channels=128, in_channels=512, num_blocks=16,
                 upsampling_depth=5, enc_kernel_size=21, num_sources=2,
                 sample_rate=16000, feat_len=None, remat=False, **unused):
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
        self.feat_len = feat_len
        self.lcm = abs(self.enc_kernel_size // 4 * 4 ** upsampling_depth) \
            // math.gcd(self.enc_kernel_size // 4, 4 ** upsampling_depth)
        if self.BLOCK_CLS is not None:
            self.unet = self.BLOCK_CLS(out_channels, in_channels,
                                       upsampling_depth, feat_len=feat_len)
        else:
            if hasattr(self, "_ga_factory"):
                ga = self._ga_factory()
            else:
                ga = GAEra(in_channels, norm="gn", **self.GA_KW)
            self.unet = UConvBlockEra(
                out_channels, in_channels, upsampling_depth,
                feat_len=feat_len, down=self.DOWN, ga=ga,
                emcad_cls=self.EMCAD_CLS, emcad_kw=self.EMCAD_KW,
                fusion=self.FUSION, last=self.LAST,
                emcad_direct=self.EMCAD_DIRECT)
        # shared-weight recurrence as ONE scanned block (keeps compile
        # time/program size O(1) in num_blocks, like components.Recurrent)
        self.sm = Recurrent(out_channels, in_channels, upsampling_depth,
                            num_blocks, block=self.unet, remat=remat)

    def init(self, key):
        ks = jax.random.split(key, 6)
        C, B = self.enc_num_basis, self.out_channels
        return {
            "encoder": ops.conv1d_xavier_init(ks[0], 1, C,
                                              self.enc_kernel_size),
            "ln": ops.layer_norm_init(C),
            "bottleneck": ops.conv1d_init(ks[1], C, B, 1),
            "sm": {"unet": self.unet.init(ks[2]),
                   "concat_block": {
                       "0": ops.conv1d_init(ks[5], B, B, 1, groups=B),
                       "1": ops.prelu_init()}},
            "mask_net": {"0": ops.prelu_init(),
                         "1": ops.conv1d_init(ks[3], B,
                                              self.num_sources * C, 1)},
            "decoder": ops.conv_transpose1d_xavier_init(
                ks[4], C * self.num_sources, self.num_sources,
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
        x = ops.conv1d(x[:, None, :], params["encoder"], stride=S,
                       padding=K // 2)
        s = x
        x = ops.group_norm1(x, params["ln"])
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
                "sample_rate": self._sample_rate,
                "feat_len": self.feat_len}


@register_model
class TDANetEMCAD_v1(_EraTDANet):
    """IDConv down + EMCADNoInit decoder (TDANet_intergral.py)."""
    EMCAD_CLS = em.EMCADNoInit


@register_model
class TDANetEMCADv1_3(_EraTDANet):
    """IDConv + lite-v2 EMCADTest (TDANet_intergral_v1_3.py)."""
    EMCAD_CLS = em.EMCADTest
    GA_KW = dict(drop_path=0.1, attn="none", mlp="ffn", mlp_drop=0.1)


@register_model
class TDANetEMCADv1_4(_EraTDANet):
    """Inline LGAG3 composition (TDANet_intergral_v1_4.py)."""
    BLOCK_CLS = UConvBlockV14


@register_model
class TDANetEMCADv1_5(_EraTDANet):
    """IDConv + full EMCAD (TDANet_intergral_v1_5.py)."""
    EMCAD_CLS = em.EMCAD
    GA_KW = dict(drop_path=0.1, attn="none", mlp="ffn", mlp_drop=0.1)


@register_model
class TDANetEMCADv1_6(_EraTDANet):
    """Flagship EMCAD variant: IDConv + EMCADv1_6
    (TDANet_intergral_v1_6.py)."""
    EMCAD_CLS = em.EMCADv1_6


@register_model
class TDANetEMCADv1_6_Final(_EraTDANet):
    """FCDyConv down + EMCADv1_6_Final (TDANet_intergral_v1_6_final.py)."""
    DOWN = "fcdy"
    EMCAD_CLS = em.EMCADv1_6_Final


@register_model
class TDANetEMCADv1_6_noIDConv(_EraTDANet):
    """Plain depthwise down + EMCADv1_6
    (TDANet_intergralV1_6_noIDConv.py)."""
    DOWN = "conv"
    EMCAD_CLS = em.EMCADv1_6


@register_model
class TDANetEMCADv1_6_FCDyConv(_EraTDANet):
    """FCDyConv down + EMCADv1_6 (TDANet_intergral_v1_6_FCDyConv.py)."""
    DOWN = "fcdy"
    EMCAD_CLS = em.EMCADv1_6


@register_model
class TDANetEMCADv1_6_LAOpt1(_EraTDANet):
    EMCAD_CLS = em.EMCADv1_6
    LAST = "laopt1"


@register_model
class TDANetEMCADv1_6_noASG(_EraTDANet):
    EMCAD_CLS = em.EMCADv1_6_noASG


@register_model
class TDANetEMCADv1_6_noCBAM(_EraTDANet):
    EMCAD_CLS = em.EMCADv1_6_noCBAM


@register_model
class TDANetEMCADv1_6_noMMLP(_EraTDANet):
    EMCAD_CLS = em.EMCADv1_6_noMMLP


@register_model
class TDANetEMCADv1_6_noCBAM_laopt3(_EraTDANet):
    EMCAD_CLS = em.EMCADv1_6_noCBAM
    LAST = "laopt3"


@register_model
class TDANetEMCADv1_6_noCBAM_laopt4(_EraTDANet):
    EMCAD_CLS = em.EMCADv1_6_noCBAM
    LAST = "laopt4"


@register_model
class TDANetEMCADv1_6_noCBAM_laopt5(_EraTDANet):
    EMCAD_CLS = em.EMCADv1_6_noCBAM
    LAST = "laopt5"


@register_model
class TDANetEMCAD(_EraTDANet):
    """Depthwise down + full EMCAD, expansion over decoder outputs
    (TDANet_EMCAD.py; expansion_factor 0.25)."""
    DOWN = "conv"
    EMCAD_CLS = em.EMCAD
    EMCAD_KW = dict(expansion_factor=0.25, activation="prelu")
    GA_KW = dict(drop_path=0.1, attn="none", mlp="ffn", mlp_drop=0.1)


@register_model
class TDANetEMCADF1(_EraTDANet):
    """Depthwise down + EMCADF1 as the direct block output; GA keeps the
    unfixed MHA (TDANet_EMCAD_f1.py)."""
    DOWN = "conv"
    EMCAD_CLS = em.EMCADF1
    EMCAD_DIRECT = True
    GA_KW = dict(drop_path=0.1, attn="mha", mlp="ffn", mlp_drop=0.1)


@register_model
class TDANetDynamicDownsample(_EraTDANet):
    """IDConv downsampling, no EMCAD (TDANet_dynamic_down.py)."""
    EMCAD_CLS = None


@register_model
class TDANetGateOSRA(_EraTDANet):
    """OSRA Attention1D GA with learned relative-pos bias
    (TDANet_OSRA_gated.py)."""
    DOWN = "conv"
    EMCAD_CLS = None
    # hard-coded hypers: num_heads=4, sr_ratio=1 (TDANet_OSRA_gated.py:346-350)
    GA_KW = dict(drop_path=0.1, attn="osra", mlp="ffn", mlp_drop=0.1,
                 num_heads=4, sr_ratio=1)


@register_model
class TDANetChannelFusion(_EraTDANet):
    """IDConv down + LAOpt2 CAB-fusion last layers; GA keeps the unfixed
    MHA (TDANet_channel_fusion.py)."""
    EMCAD_CLS = None
    GA_KW = dict(drop_path=0.1, attn="mha", mlp="ffn", mlp_drop=0.1)
    LAST = "laopt2"


@register_model
class TDANetMSFFN(_EraTDANet):
    """The coarse-scale transformer is a full TransXNet Block1D (D-Mixer
    + MS-FFN) with a learned relative-pos bias; the file's GlobalAttention
    class is dead code (TDANet_MSFFN.py:360-380)."""
    DOWN = "conv"
    EMCAD_CLS = None

    def __init__(self, *args, **kwargs):
        in_channels = kwargs.get("in_channels", 512)
        self._ga_factory = lambda: tx.Block1D(
            in_channels, kernel_size=3, num_groups=2, num_heads=4,
            sr_ratio=4, mlp_ratio=4, act="relu", drop=0.1, drop_path=0.1,
            layer_scale_init_value=1e-5)
        super().__init__(*args, **kwargs)


@register_model
class TDANetTranXNet(_EraTDANet):
    """Per-scale CrossAttention1D global fusion (TDANet_transxnet.py)."""
    DOWN = "conv"
    EMCAD_CLS = None
    FUSION = "mixers"
    GA_KW = dict(drop_path=0.1, attn="none", mlp="ffn", mlp_drop=0.1)
