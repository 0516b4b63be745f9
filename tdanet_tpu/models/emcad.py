"""EMCAD decoder library, 1-D (reference: look2hear/models/EMCAD*.py).

Efficient Multi-scale Convolutional Attention Decoding blocks: MSDC/MSCB
inverted-residual multi-scale convs with channel shuffle, EUCB(Light)
upsample blocks, LGAG large-kernel grouped attention gates, CAB channel
attention (the reference's "max_pool" is an avg pool — reproduced), SAB
spatial attention, and the decoder orchestrations:

- EMCAD / EMCADNoInit (EMCAD.py:352-463, EMCAD_noInit.py — same math),
- EMCADF1 (EMCAD.py: returns only the finest stage),
- EMCADTest ("轻量化v2": grouped pconvs + repeated shuffles + LGAG3,
  EMCAD_test.py),
- EMCADv1_6 (EUCBLight at stages 3/1, mid-stage MSCBs dropped,
  EMCAD_v1_6.py:380-482),
- EMCADv1_6_noASG / _noCBAM / _noMMLP ablations,
- EMCADv1_6_Final (no-shuffle EUCBLight + lgag4 coarsest gate,
  EMCAD_v1_6_final.py).

Stage lengths come from the actual skip shapes (static under jit), which
equals the reference's get_feat_lens(feat_len, 4) ladder.
"""

from __future__ import annotations

from math import gcd

import jax
import jax.numpy as jnp

from tdanet_tpu import ops


def _gn(x, p):
    # EMCAD uses bare nn.GroupNorm(1, C) with torch's DEFAULT eps=1e-5
    # (EMCAD.py:106,196 etc.) — unlike the TDANet norms' explicit 1e-8.
    return ops.group_norm1(x, p, eps=1e-5)


def _act_apply(name, p, x):
    name = name.lower()
    if name == "relu":
        return jax.nn.relu(x)
    if name == "relu6":
        return jnp.clip(x, 0.0, 6.0)
    if name == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if name == "hswish":
        return jax.nn.hard_swish(x)
    if name == "leakyrelu":
        return jax.nn.leaky_relu(x, 0.2)
    if name == "prelu":
        return ops.prelu(x, p)
    raise NotImplementedError(name)


def _act_init(name):
    """act_layer('prelu') uses nn.PReLU(1, init=0.2) (EMCAD.py:60-77)."""
    if name.lower() == "prelu":
        return ops.prelu_init(1, 0.2)
    return None


def channel_shuffle(x, groups, times=1):
    """(EMCAD.py:80-90; EMCAD_test.py adds ``times`` repetitions)."""
    B, C, L = x.shape
    for _ in range(times):
        x = x.reshape(B, groups, C // groups, L) \
             .transpose(0, 2, 1, 3).reshape(B, C, L)
    return x


class MSDC:
    """Parallel depthwise convs at multiple kernel sizes
    (EMCAD.py:93-126)."""

    def __init__(self, in_channels, kernel_sizes, stride, activation="relu6",
                 dw_parallel=True):
        self.in_channels = in_channels
        self.kernel_sizes = kernel_sizes
        self.stride = stride
        self.activation = activation
        self.dw_parallel = dw_parallel

    def init(self, key):
        ks = jax.random.split(key, len(self.kernel_sizes))
        out = {"dwconvs": {}}
        for i, k in enumerate(self.kernel_sizes):
            d = {"0": ops.conv1d_init(ks[i], self.in_channels,
                                      self.in_channels, k,
                                      groups=self.in_channels, bias=False),
                 "1": ops.layer_norm_init(self.in_channels)}
            a = _act_init(self.activation)
            if a is not None:
                d["2"] = a
            out["dwconvs"][str(i)] = d
        return out

    def apply(self, p, x):
        outputs = []
        for i, k in enumerate(self.kernel_sizes):
            d = p["dwconvs"][str(i)]
            y = ops.conv1d(x, d["0"], stride=self.stride, padding=k // 2,
                           groups=self.in_channels)
            y = _gn(y, d["1"])
            y = _act_apply(self.activation, d.get("2"), y)
            outputs.append(y)
            if not self.dw_parallel:
                x = x + y
        return outputs


class MSCB:
    """Inverted-residual multi-scale conv block with channel shuffle
    (EMCAD.py:129-219). ``lite_v2`` reproduces EMCAD_test's grouped
    pointwise convs + extra shuffles."""

    def __init__(self, in_channels, out_channels, stride,
                 kernel_sizes=(1, 3, 5), expansion_factor=2,
                 dw_parallel=True, add=True, activation="relu6",
                 lite_v2=False):
        self.in_channels, self.out_channels = in_channels, out_channels
        self.stride = stride
        self.kernel_sizes = list(kernel_sizes)
        self.add = add
        self.activation = activation
        self.lite_v2 = lite_v2
        self.ex_channels = int(in_channels * expansion_factor)
        self.use_skip = stride == 1
        self.combined = (self.ex_channels if add
                         else self.ex_channels * len(self.kernel_sizes))
        self.msdc = MSDC(self.ex_channels, self.kernel_sizes, stride,
                         activation, dw_parallel)
        self.p1_groups = (in_channels // 4) if lite_v2 else 1
        self.p2_groups = (self.combined // 4) if lite_v2 else 1

    def init(self, key):
        ks = jax.random.split(key, 4)
        p = {"pconv1": {"0": ops.conv1d_init(
                ks[0], self.in_channels, self.ex_channels, 1,
                groups=self.p1_groups, bias=False),
                "1": ops.layer_norm_init(self.ex_channels)},
             "msdc": self.msdc.init(ks[1]),
             "pconv2": {"0": ops.conv1d_init(
                 ks[2], self.combined, self.out_channels, 1,
                 groups=self.p2_groups, bias=False),
                 "1": ops.layer_norm_init(self.out_channels)}}
        a = _act_init(self.activation)
        if a is not None:
            p["pconv1"]["2"] = a
        if self.use_skip and self.in_channels != self.out_channels:
            p["conv1x1"] = ops.conv1d_init(ks[3], self.in_channels,
                                           self.out_channels, 1, bias=False)
        return p

    def apply(self, p, x):
        y = ops.conv1d(x, p["pconv1"]["0"], groups=self.p1_groups)
        y = _gn(y, p["pconv1"]["1"])
        y = _act_apply(self.activation, p["pconv1"].get("2"), y)
        if self.lite_v2:
            y = channel_shuffle(y, self.in_channels // 4, 1)
        outs = self.msdc.apply(p["msdc"], y)
        if self.add:
            dout = outs[0]
            for o in outs[1:]:
                dout = dout + o
        else:
            dout = jnp.concatenate(outs, axis=1)
        dout = channel_shuffle(dout, gcd(self.combined, self.out_channels),
                               2 if self.lite_v2 else 1)
        out = ops.conv1d(dout, p["pconv2"]["0"], groups=self.p2_groups)
        out = _gn(out, p["pconv2"]["1"])
        if self.lite_v2:
            out = channel_shuffle(out, self.combined // 4, 3)
        if self.use_skip:
            if self.in_channels != self.out_channels:
                x = ops.conv1d(x, p["conv1x1"])
            return x + out
        return out


class MSCBLayer:
    """n sequential MSCBs wrapped like the reference nn.Sequential
    (EMCAD.py:222-237): params keyed '0', '1', ..."""

    def __init__(self, in_channels, out_channels, n=1, stride=1, **kw):
        self.blocks = [MSCB(in_channels, out_channels, stride, **kw)]
        for _ in range(1, n):
            self.blocks.append(MSCB(out_channels, out_channels, 1, **kw))

    def init(self, key):
        ks = jax.random.split(key, len(self.blocks))
        return {str(i): b.init(ks[i]) for i, b in enumerate(self.blocks)}

    def apply(self, p, x):
        for i, b in enumerate(self.blocks):
            x = b.apply(p[str(i)], x)
        return x


class EUCB:
    """Efficient up-convolution block (EMCAD.py:240-275): nearest
    upsample -> depthwise conv + GN + act -> channel shuffle -> pointwise.
    ``light`` drops the pointwise (EMCAD_v1_6.py:249-278); ``shuffle``
    False reproduces the Final variant's shuffle removal."""

    def __init__(self, in_channels, out_channels, kernel_size=3, stride=1,
                 activation="relu", light=False, shuffle=True,
                 shuffle_times=1):
        self.in_channels, self.out_channels = in_channels, out_channels
        self.kernel_size, self.stride = kernel_size, stride
        self.activation = activation
        self.light = light
        self.shuffle = shuffle
        self.shuffle_times = shuffle_times

    def init(self, key):
        k1, k2 = jax.random.split(key)
        p = {"up_dwc": {"1": ops.conv1d_init(
                k1, self.in_channels, self.in_channels, self.kernel_size,
                groups=self.in_channels, bias=False),
             "2": ops.layer_norm_init(self.in_channels)}}
        a = _act_init(self.activation)
        if a is not None:
            p["up_dwc"]["3"] = a
        if not self.light:
            p["pwc"] = {"0": ops.conv1d_init(k2, self.in_channels,
                                             self.out_channels, 1)}
        return p

    def apply(self, p, x, target_len):
        x = ops.interpolate_nearest(x, target_len)
        x = ops.conv1d(x, p["up_dwc"]["1"], stride=self.stride,
                       padding=self.kernel_size // 2,
                       groups=self.in_channels)
        x = _gn(x, p["up_dwc"]["2"])
        x = _act_apply(self.activation, p["up_dwc"].get("3"), x)
        if self.shuffle:
            x = channel_shuffle(x, self.in_channels, self.shuffle_times)
        if not self.light:
            x = ops.conv1d(x, p["pwc"]["0"])
        return x


class LGAG:
    """Large-kernel grouped attention gate (EMCAD.py:251-286):
    x * sigmoid(GN(psi(act(GN(Wg g) + GN(Wx x)))))."""

    def __init__(self, F_g, F_l, F_int, kernel_size=3, groups=1,
                 activation="relu"):
        if kernel_size == 1:
            groups = 1
        self.F_g, self.F_l, self.F_int = F_g, F_l, F_int
        self.kernel_size, self.groups = kernel_size, groups
        self.activation = activation

    def _gate_init(self, key, F_in):
        return {"0": ops.conv1d_init(key, F_in, self.F_int,
                                     self.kernel_size, groups=self.groups),
                "1": ops.layer_norm_init(self.F_int)}

    def init(self, key):
        ks = jax.random.split(key, 3)
        p = {"W_g": self._gate_init(ks[0], self.F_g),
             "W_x": self._gate_init(ks[1], self.F_l),
             "psi": {"0": ops.conv1d_init(ks[2], self.F_int, 1, 1),
                     "1": ops.layer_norm_init(1)}}
        a = _act_init(self.activation)
        if a is not None:
            p["activation"] = a
        return p

    def _gate(self, p, x):
        y = ops.conv1d(x, p["0"], padding=self.kernel_size // 2,
                       groups=self.groups)
        return _gn(y, p["1"])

    def apply(self, p, g, x):
        psi = _act_apply(self.activation, p.get("activation"),
                         self._gate(p["W_g"], g) + self._gate(p["W_x"], x))
        psi = ops.conv1d(psi, p["psi"]["0"])
        psi = jax.nn.sigmoid(_gn(psi, p["psi"]["1"]))
        return x * psi


class LGAG3(LGAG):
    """3-input gate with an extra bottom branch (EMCAD_test.py:291-340)."""

    def init(self, key):
        ks = jax.random.split(key, 4)
        p = super().init(key)
        p["W_x_bottom"] = self._gate_init(ks[3], self.F_l)
        return p

    def apply(self, p, g, x, x_bottom):
        psi = _act_apply(self.activation, p.get("activation"),
                         self._gate(p["W_g"], g) + self._gate(p["W_x"], x)
                         + self._gate(p["W_x_bottom"], x_bottom))
        psi = ops.conv1d(psi, p["psi"]["0"])
        psi = jax.nn.sigmoid(_gn(psi, p["psi"]["1"]))
        return x * psi


class CAB:
    """Channel attention (EMCAD.py:289-324). NOTE the reference's
    ``max_pool`` is an AdaptiveAvgPool1d — both branches are avg pools —
    reproduced for checkpoint fidelity."""

    def __init__(self, in_channels, out_channels=None, ratio=16,
                 activation="relu"):
        self.in_channels = in_channels
        if in_channels < ratio:
            ratio = in_channels
        self.reduced = in_channels // ratio
        self.out_channels = out_channels or in_channels
        self.activation = activation

    def init(self, key):
        k1, k2 = jax.random.split(key)
        p = {"fc1": ops.conv1d_init(k1, self.in_channels, self.reduced, 1,
                                    bias=False),
             "fc2": ops.conv1d_init(k2, self.reduced, self.out_channels, 1,
                                    bias=False)}
        a = _act_init(self.activation)
        if a is not None:
            p["activation"] = a
        return p

    def apply(self, p, x):
        def branch(z):
            z = ops.conv1d(z, p["fc1"])
            z = _act_apply(self.activation, p.get("activation"), z)
            return ops.conv1d(z, p["fc2"])
        pooled = jnp.mean(x, axis=-1, keepdims=True)
        return jax.nn.sigmoid(branch(pooled) + branch(pooled))


class SAB:
    """Spatial attention (EMCAD.py:327-349)."""

    def __init__(self, kernel_size=7):
        assert kernel_size in (3, 7, 11)
        self.kernel_size = kernel_size

    def init(self, key):
        return {"conv": ops.conv1d_init(key, 2, 1, self.kernel_size,
                                        bias=False)}

    def apply(self, p, x):
        avg = jnp.mean(x, axis=1, keepdims=True)
        mx = jnp.max(x, axis=1, keepdims=True)
        y = ops.conv1d(jnp.concatenate([avg, mx], axis=1), p["conv"],
                       padding=self.kernel_size // 2)
        return jax.nn.sigmoid(y)


class EMCADBase:
    """Configurable EMCAD decoder covering every reference variant.

    Config knobs (defaults = the full EMCAD):
    - mscb_stages: stages (4..0) that keep their MSCB;
    - light_stages: stages whose EUCB is the Light (no-pwc) flavor;
    - eucb_shuffle / eucb_shuffle_times: channel shuffle in EUCB;
    - use_lgag / use_cbam / lgag4 / lite_v2 / return_all.
    """

    MSCB_STAGES = (4, 3, 2, 1, 0)
    LIGHT_STAGES = ()
    EUCB_SHUFFLE = True
    EUCB_SHUFFLE_TIMES = 1
    USE_LGAG = True
    USE_CBAM = True
    LGAG4 = False
    LITE_V2 = False
    RETURN_ALL = True

    def __init__(self, channels=(512, 320, 128, 64, 64),
                 kernel_sizes=(1, 3, 5), expansion_factor=6,
                 dw_parallel=True, add=True, lgag_ks=3, activation="relu",
                 feat_len=None):
        if len(channels) != 5:
            # the decoder is hardwired to a 5-stage pyramid (ch[4 - st]
            # below; the reference shares this implicit constraint) —
            # fail with a named error instead of an IndexError
            raise ValueError(
                "EMCAD decoder requires a 5-stage pyramid "
                f"(upsampling_depth=5); got {len(channels)} channels")
        self.channels = list(channels)
        ch = self.channels
        mk = dict(kernel_sizes=kernel_sizes,
                  expansion_factor=expansion_factor,
                  dw_parallel=dw_parallel, add=add, activation=activation,
                  lite_v2=self.LITE_V2)
        self.mscb = {}
        for st in self.MSCB_STAGES:
            c = ch[4 - st]
            self.mscb[st] = MSCBLayer(c, c, n=1, stride=1, **mk)
        self.eucb = {}
        for st in (3, 2, 1, 0):
            light = st in self.LIGHT_STAGES
            # EUCB_SHUFFLE=False only affects the Light flavor
            # (EMCAD_v1_6_final.py removes the shuffle from EUCBLight only)
            shuffle = self.EUCB_SHUFFLE if light else True
            self.eucb[st] = EUCB(
                ch[3 - st], ch[4 - st], kernel_size=3, stride=1,
                activation=activation, light=light, shuffle=shuffle,
                shuffle_times=self.EUCB_SHUFFLE_TIMES)
        self.lgag = {}
        if self.USE_LGAG:
            for st in (3, 2, 1, 0):
                c = ch[4 - st]
                self.lgag[st] = LGAG(c, c, c // 2, kernel_size=lgag_ks,
                                     groups=c // 2, activation=activation)
            if self.LGAG4:
                self.lgag[4] = LGAG(ch[0], ch[0], ch[0] // 2,
                                    kernel_size=lgag_ks,
                                    groups=ch[0] // 2, activation=activation)
        if self.USE_CBAM:
            self.cab = {st: CAB(ch[4 - st]) for st in (4, 3, 2, 1, 0)}
            self.sab = SAB()

    def init(self, key):
        ks = iter(jax.random.split(key, 32))
        p = {}
        for st, m in self.mscb.items():
            p[f"mscb{st}"] = m.init(next(ks))
        for st, m in self.eucb.items():
            p[f"eucb{st}"] = m.init(next(ks))
        for st, m in self.lgag.items():
            p[f"lgag{st}"] = m.init(next(ks))
        if self.USE_CBAM:
            for st, m in self.cab.items():
                p[f"cab{st}"] = m.init(next(ks))
            p["sab"] = self.sab.init(next(ks))
        return p

    def _cbam(self, p, st, d):
        if not self.USE_CBAM:
            return d
        d = self.cab[st].apply(p[f"cab{st}"], d) * d
        return self.sab.apply(p["sab"], d) * d

    def apply(self, p, x, skips):
        """x: coarsest global feature; skips: list of per-scale features
        fine->coarse (skips[-1] is the coarsest)."""
        outs = []
        if self.LGAG4:
            d = skips[-1] + self.lgag[4].apply(p["lgag4"], x, skips[-1])
            d = skips[-1] + d
        else:
            d = self._cbam(p, 4, x)
        if 4 in self.mscb:
            d = self.mscb[4].apply(p["mscb4"], d)
        outs.append(d)
        for st in (3, 2, 1, 0):
            skip = skips[-(5 - st)]
            d = self.eucb[st].apply(p[f"eucb{st}"], d, skip.shape[-1])
            if self.USE_LGAG:
                d = d + self.lgag[st].apply(p[f"lgag{st}"], d, skip)
            else:
                d = d + skip
            if not self.LGAG4:  # Final variant has no CBAM at all
                d = self._cbam(p, st, d)
            if st in self.mscb:
                d = self.mscb[st].apply(p[f"mscb{st}"], d)
            outs.append(d)
        if self.RETURN_ALL:
            return outs
        return outs[-1]


class EMCAD(EMCADBase):
    """Full decoder (EMCAD.py:352-463)."""


class EMCADNoInit(EMCADBase):
    """EMCAD minus weight-init calls — runtime-identical
    (EMCAD_noInit.py)."""


class EMCADF1(EMCADBase):
    """EMCAD returning only the finest stage (EMCAD.py EMCADF1)."""

    RETURN_ALL = False


class EMCADTest(EMCADBase):
    """Lite-v2: grouped pointwise convs, repeated shuffles
    (EMCAD_test.py)."""

    LITE_V2 = True
    EUCB_SHUFFLE_TIMES = 3

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        for st in self.eucb:
            self.eucb[st].light = True  # pwc commented out in lite EUCB


class EMCADv1_6(EMCADBase):
    """Flagship decoder config (EMCAD_v1_6.py:380-482)."""

    MSCB_STAGES = (4, 0)
    LIGHT_STAGES = (3, 1)


class EMCADv1_6_noASG(EMCADv1_6):
    USE_LGAG = False


class EMCADv1_6_noCBAM(EMCADv1_6):
    USE_CBAM = False


class EMCADv1_6_noMMLP(EMCADv1_6):
    MSCB_STAGES = ()


class EMCADv1_6_Final(EMCADv1_6):
    """EUCBLight without shuffle + lgag4 coarsest gate, no CBAM
    (EMCAD_v1_6_final.py)."""

    MSCB_STAGES = (4, 0)
    USE_CBAM = False
    LGAG4 = True
    EUCB_SHUFFLE = False
