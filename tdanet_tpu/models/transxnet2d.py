"""TransXNet 2-D image classifier (reference: TransXNet.py:136-234,
351-409, 540-575, 676-723, 795-803, 815-887, 1000-1360).

The full D-Mixer backbone: patch embeds with BatchNorm, input-dependent
2-D dynamic convs, OSRA attention with learned relative-position bias,
MS-FFN, LayerScale, and the tiny/small/base arch table. BatchNorms use
stored running statistics (inference semantics).
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from tdanet_tpu import ops
from tdanet_tpu.models.base import warn_unused_kwargs
from tdanet_tpu.models.transxnet import trunc_normal_init

_GELU = lambda x: jax.nn.gelu(x, approximate=False)


def conv2d_init(key, cin, cout, k, groups=1, bias=True, std=0.02):
    """trunc_normal(0.02) like _init_model_weights (TransXNet.py:1219)."""
    kh, kw = (k, k) if isinstance(k, int) else k
    p = {"weight": trunc_normal_init(key, (cout, cin // groups, kh, kw),
                                     std)}
    if bias:
        p["bias"] = jnp.zeros((cout,))
    return p


def conv2d(x, p, *, stride=1, padding=0, groups=1):
    s = (stride, stride) if isinstance(stride, int) else stride
    pad = (padding, padding) if isinstance(padding, int) else padding
    out = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), window_strides=s,
        padding=[(pad[0], pad[0]), (pad[1], pad[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)[None, :, None, None]
    return out


def bn_init(c):
    return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,)),
            "num_batches_tracked": jnp.zeros((), jnp.int64)}


def bn2d(x, p, eps=1e-5):
    shape = (1, -1, 1, 1)
    mean = p["running_mean"].astype(x.dtype).reshape(shape)
    var = p["running_var"].astype(x.dtype).reshape(shape)
    w = p["weight"].astype(x.dtype).reshape(shape)
    b = p["bias"].astype(x.dtype).reshape(shape)
    return (x - mean) * jax.lax.rsqrt(var + eps) * w + b


def gn2d(x, p, eps=1e-5):
    """GroupNorm(1, C) on NCHW (build_norm_layer 'GN' w/ num_groups=1)."""
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(1, 2, 3), keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p["weight"].astype(x.dtype)[None, :, None, None] \
        + p["bias"].astype(x.dtype)[None, :, None, None]


class PatchEmbed2d:
    """Conv patch embed + BN (+ optional ReLU) (TransXNet.py:136-178)."""

    def __init__(self, patch_size=16, stride=16, padding=0, in_chans=3,
                 embed_dim=768, act=False):
        self.k, self.s, self.p = patch_size, stride, padding
        self.cin, self.cout, self.act = in_chans, embed_dim, act

    def init(self, key):
        return {"proj": conv2d_init(key, self.cin, self.cout, self.k),
                "norm": bn_init(self.cout)}

    def apply(self, p, x):
        out = bn2d(conv2d(x, p["proj"], stride=self.s, padding=self.p),
                   p["norm"])
        return jax.nn.relu(out) if self.act else out


def adaptive_pool2d(x, out_hw):
    """torch F.adaptive_avg_pool2d via two static pooling matmuls."""
    from tdanet_tpu.ops import avg_pool_matrix
    B, C, H, W = x.shape
    oh, ow = out_hw
    mh = jnp.asarray(avg_pool_matrix(H, oh), x.dtype)
    mw = jnp.asarray(avg_pool_matrix(W, ow), x.dtype)
    y = jnp.einsum("bchw,ho->bcow", x, mh, preferred_element_type=x.dtype)
    return jnp.einsum("bcow,wp->bcop", y, mw, preferred_element_type=x.dtype)


class ConvModule2d:
    """conv (+BN) (+act) (TransXNet.py:66-135, dim=2)."""

    def __init__(self, cin, cout, k, stride=1, padding="auto", groups=1,
                 bias="auto", norm="bn", act=None):
        self.cin, self.cout, self.k = cin, cout, k
        self.stride, self.groups = stride, groups
        self.padding = k // 2 if padding == "auto" else padding
        self.norm = norm
        self.bias = (norm is None) if bias == "auto" else bias
        self.act = act

    def init(self, key):
        p = {"conv": conv2d_init(key, self.cin, self.cout, self.k,
                                 self.groups, self.bias)}
        if self.norm == "bn":
            p["norm"] = bn_init(self.cout)
        return p

    def apply(self, p, x):
        x = conv2d(x, p["conv"], stride=self.stride, padding=self.padding,
                   groups=self.groups)
        if self.norm == "bn":
            x = bn2d(x, p["norm"])
        if self.act == "gelu":
            x = _GELU(x)
        elif self.act == "relu":
            x = jax.nn.relu(x)
        return x


class DynamicConv2d:
    """2-D IDConv (TransXNet.py:351-409)."""

    def __init__(self, dim, kernel_size=3, reduction_ratio=4, num_groups=1,
                 bias=True):
        assert num_groups > 1
        self.dim, self.K, self.G = dim, kernel_size, num_groups
        self.use_bias = bias
        self.red = dim // reduction_ratio
        self.proj0 = ConvModule2d(dim, self.red, 1, norm="bn", act="gelu")

    def init(self, key):
        ks = jax.random.split(key, 4)
        p = {"weight": trunc_normal_init(ks[0], (self.G, self.dim, self.K,
                                                 self.K)),
             "proj": {"0": self.proj0.init(ks[1]),
                      "1": conv2d_init(ks[2], self.red, self.dim * self.G,
                                       1)}}
        if self.use_bias:
            p["bias"] = trunc_normal_init(ks[3], (self.G, self.dim))
        return p

    def _proj(self, p, z):
        return conv2d(self.proj0.apply(p["proj"]["0"], z), p["proj"]["1"])

    def apply(self, p, x):
        B, C, H, W = x.shape
        G, K = self.G, self.K
        scale = self._proj(p, adaptive_pool2d(x, (K, K)))
        scale = jax.nn.softmax(scale.reshape(B, G, C, K, K), axis=1)
        weight = jnp.sum(scale * p["weight"][None].astype(x.dtype), axis=1)
        if self.use_bias:
            bs = self._proj(p, jnp.mean(x, axis=(2, 3), keepdims=True))
            bs = jax.nn.softmax(bs.reshape(B, G, C), axis=1)
            bias = jnp.sum(bs * p["bias"][None].astype(x.dtype), axis=1)
        else:
            bias = None
        # per-sample depthwise conv as K*K shifted multiply-adds
        pad = K // 2
        xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
        out = jnp.zeros_like(x)
        for i in range(K):
            for j in range(K):
                sl = xp[:, :, i:i + H, j:j + W]
                out = out + sl * weight[:, :, i, j][:, :, None, None]
        if bias is not None:
            out = out + bias[:, :, None, None]
        return out


class Attention2D:
    """2-D OSRA (TransXNet.py:179-234)."""

    def __init__(self, dim, num_heads=1, qk_scale=None, sr_ratio=1):
        self.dim, self.H = dim, num_heads
        self.scale = qk_scale or (dim // num_heads) ** -0.5
        self.sr_ratio = sr_ratio
        if sr_ratio > 1:
            self.sr0 = ConvModule2d(dim, dim, sr_ratio + 3, stride=sr_ratio,
                                    padding=(sr_ratio + 3) // 2, groups=dim,
                                    bias=False, norm="bn", act="gelu")
            self.sr1 = ConvModule2d(dim, dim, 1, groups=dim, bias=False,
                                    norm="bn", act=None)

    def init(self, key):
        ks = jax.random.split(key, 4)
        p = {"q": conv2d_init(ks[0], self.dim, self.dim, 1),
             "kv": conv2d_init(ks[1], self.dim, self.dim * 2, 1),
             "local_conv": conv2d_init(ks[2], self.dim, self.dim, 3,
                                       groups=self.dim)}
        if self.sr_ratio > 1:
            k1, k2 = jax.random.split(ks[3])
            p["sr"] = {"0": self.sr0.init(k1), "1": self.sr1.init(k2)}
        return p

    def apply(self, p, x, rpe=None):
        B, C, H, W = x.shape
        nh = self.H
        hd = C // nh
        q = conv2d(x, p["q"]).reshape(B, nh, hd, H * W) \
            .transpose(0, 1, 3, 2)
        kv_in = x if self.sr_ratio == 1 else self.sr1.apply(
            p["sr"]["1"], self.sr0.apply(p["sr"]["0"], x))
        kv_in = conv2d(kv_in, p["local_conv"], padding=1,
                       groups=self.dim) + kv_in
        kv = conv2d(kv_in, p["kv"])
        k, v = jnp.split(kv, 2, axis=1)
        S = k.shape[-1] * k.shape[-2]
        k = k.reshape(B, nh, hd, S)
        v = v.reshape(B, nh, hd, S).transpose(0, 1, 3, 2)
        attn = jnp.einsum("bhlc,bhcs->bhls", q, k,
                          preferred_element_type=ops.acc_dtype(x.dtype)) * self.scale
        if rpe is not None:
            if rpe.shape[2:] != attn.shape[2:]:
                rpe = jax.image.resize(
                    rpe, rpe.shape[:2] + attn.shape[2:], method="cubic")
            attn = attn + rpe.astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(ops.acc_dtype(x.dtype)), axis=-1) \
            .astype(x.dtype)
        out = jnp.einsum("bhls,bhsc->bhlc", attn, v,
                         preferred_element_type=ops.acc_dtype(x.dtype)).astype(x.dtype)
        return out.transpose(0, 1, 3, 2).reshape(B, C, H, W)


class MultiScaleDWConv2d:
    """(TransXNet.py:610-635)."""

    def __init__(self, dim, scale=(1, 3, 5, 7)):
        self.scale = scale
        self.channels = [dim - dim // len(scale) * (len(scale) - 1)] + \
            [dim // len(scale)] * (len(scale) - 1)

    def init(self, key):
        ks = jax.random.split(key, len(self.scale))
        return {"proj": {str(i): conv2d_init(ks[i], c, c, self.scale[i],
                                             groups=c)
                         for i, c in enumerate(self.channels)}}

    def apply(self, p, x):
        outs, start = [], 0
        for i, c in enumerate(self.channels):
            piece = x[:, start:start + c]
            outs.append(conv2d(piece, p["proj"][str(i)],
                               padding=self.scale[i] // 2, groups=c))
            start += c
        return jnp.concatenate(outs, axis=1)


class Mlp2d:
    """2-D MS-FFN with BatchNorms (TransXNet.py:676-723)."""

    def __init__(self, in_features, hidden_features=None, act="gelu",
                 drop=0.0):
        self.cin = in_features
        self.hid = hidden_features or in_features
        self.act = act
        self.dwconv = MultiScaleDWConv2d(self.hid)

    def init(self, key):
        ks = jax.random.split(key, 3)
        return {"fc1": {"0": conv2d_init(ks[0], self.cin, self.hid, 1,
                                         bias=False),
                        "2": bn_init(self.hid)},
                "dwconv": self.dwconv.init(ks[1]),
                "norm": bn_init(self.hid),
                "fc2": {"0": conv2d_init(ks[2], self.hid, self.cin, 1,
                                         bias=False),
                        "1": bn_init(self.cin)}}

    def apply(self, p, x):
        act = _GELU if self.act == "gelu" else jax.nn.relu
        x = bn2d(act(conv2d(x, p["fc1"]["0"])), p["fc1"]["2"])
        x = self.dwconv.apply(p["dwconv"], x) + x
        x = bn2d(act(x), p["norm"])
        x = bn2d(conv2d(x, p["fc2"]["0"]), p["fc2"]["1"])
        return x


class LayerScale2d:
    """(TransXNet.py:795-803)."""

    def __init__(self, dim, init_value=1e-5):
        self.dim, self.v = dim, init_value

    def init(self, key):
        return {"weight": jnp.full((self.dim, 1, 1, 1), self.v),
                "bias": jnp.zeros((self.dim,))}

    def apply(self, p, x):
        return x * p["weight"].astype(x.dtype)[None, :, 0, 0, 0][..., None,
                                                                 None] \
            + p["bias"].astype(x.dtype)[None, :, None, None]


class HybridTokenMixer2d:
    """(TransXNet.py:540-573)."""

    def __init__(self, dim, kernel_size=3, num_groups=2, num_heads=1,
                 sr_ratio=1, reduction_ratio=8):
        self.dim = dim
        self.local_unit = DynamicConv2d(dim // 2, kernel_size,
                                        num_groups=num_groups)
        self.global_unit = Attention2D(dim // 2, num_heads=num_heads,
                                       sr_ratio=sr_ratio)
        self.inner = max(16, dim // reduction_ratio)

    def init(self, key):
        ks = jax.random.split(key, 5)
        return {"local_unit": self.local_unit.init(ks[0]),
                "global_unit": self.global_unit.init(ks[1]),
                "proj": {"0": conv2d_init(ks[2], self.dim, self.dim, 3,
                                          groups=self.dim),
                         "2": bn_init(self.dim),
                         "3": conv2d_init(ks[3], self.dim, self.inner, 1),
                         "5": bn_init(self.inner),
                         "6": conv2d_init(ks[4], self.inner, self.dim, 1),
                         "7": bn_init(self.dim)}}

    def apply(self, p, x, rpe=None):
        x1, x2 = jnp.split(x, 2, axis=1)
        x1 = self.local_unit.apply(p["local_unit"], x1)
        x2 = self.global_unit.apply(p["global_unit"], x2, rpe)
        y = jnp.concatenate([x1, x2], axis=1)
        z = conv2d(y, p["proj"]["0"], padding=1, groups=self.dim)
        z = bn2d(_GELU(z), p["proj"]["2"])
        z = conv2d(z, p["proj"]["3"])
        z = bn2d(_GELU(z), p["proj"]["5"])
        z = bn2d(conv2d(z, p["proj"]["6"]), p["proj"]["7"])
        return z + y


class Block2d:
    """(TransXNet.py:815-887). norm1/norm2 = GroupNorm(1, dim)."""

    def __init__(self, dim, kernel_size=3, sr_ratio=1, num_groups=2,
                 num_heads=1, mlp_ratio=4, act="gelu",
                 layer_scale_init_value=1e-5):
        self.dim = dim
        self.token_mixer = HybridTokenMixer2d(dim, kernel_size, num_groups,
                                              num_heads, sr_ratio)
        self.mlp = Mlp2d(dim, int(dim * mlp_ratio), act=act)
        self.use_ls = layer_scale_init_value is not None
        if self.use_ls:
            self.ls1 = LayerScale2d(dim, layer_scale_init_value)
            self.ls2 = LayerScale2d(dim, layer_scale_init_value)

    def init(self, key):
        ks = jax.random.split(key, 5)
        p = {"pos_embed": conv2d_init(ks[0], self.dim, self.dim, 7,
                                      groups=self.dim),
             "norm1": ops.layer_norm_init(self.dim),
             "token_mixer": self.token_mixer.init(ks[1]),
             "norm2": ops.layer_norm_init(self.dim),
             "mlp": self.mlp.init(ks[2])}
        if self.use_ls:
            p["layer_scale_1"] = self.ls1.init(ks[3])
            p["layer_scale_2"] = self.ls2.init(ks[4])
        return p

    def apply(self, p, x, rpe=None):
        x = x + conv2d(x, p["pos_embed"], padding=3, groups=self.dim)
        t = self.token_mixer.apply(p["token_mixer"],
                                   gn2d(x, p["norm1"]), rpe)
        if self.use_ls:
            t = self.ls1.apply(p["layer_scale_1"], t)
        x = x + t
        m = self.mlp.apply(p["mlp"], gn2d(x, p["norm2"]))
        if self.use_ls:
            m = self.ls2.apply(p["layer_scale_2"], m)
        return x + m


class TransXNet2D:
    """The classifier (TransXNet.py:1000-1312). ``arch`` in
    {'tiny','small','base'} or a dict."""

    ARCHS = {
        "tiny": {"layers": [3, 3, 9, 3],
                 "embed_dims": [48, 96, 224, 448],
                 "kernel_size": [7] * 4, "num_groups": [2] * 4,
                 "sr_ratio": [8, 4, 2, 1], "num_heads": [1, 2, 4, 8],
                 "mlp_ratios": [4] * 4, "layer_scale_init_value": 1e-5},
        "small": {"layers": [4, 4, 12, 4],
                  "embed_dims": [64, 128, 320, 512],
                  "kernel_size": [7] * 4, "num_groups": [2, 2, 3, 4],
                  "sr_ratio": [8, 4, 2, 1], "num_heads": [1, 2, 5, 8],
                  "mlp_ratios": [6, 6, 4, 4],
                  "layer_scale_init_value": 1e-5},
        "base": {"layers": [4, 4, 21, 4],
                 "embed_dims": [76, 152, 336, 672],
                 "kernel_size": [7] * 4, "num_groups": [2, 2, 4, 4],
                 "sr_ratio": [8, 4, 2, 1], "num_heads": [2, 4, 8, 16],
                 "mlp_ratios": [8, 8, 4, 4],
                 "layer_scale_init_value": 1e-5},
    }

    def __init__(self, image_size=224, arch="tiny", in_chans=3,
                 in_patch_size=7, in_stride=4, in_pad=3,
                 down_patch_size=3, down_stride=2, down_pad=1,
                 num_classes=1000, **unused):
        warn_unused_kwargs(type(self).__name__, unused)
        a = self.ARCHS[arch] if isinstance(arch, str) else arch
        self.num_classes = num_classes
        layers = a["layers"]
        dims = a["embed_dims"]
        self.patch_embed = PatchEmbed2d(in_patch_size, in_stride, in_pad,
                                        in_chans, dims[0])
        self.down = dict(k=down_patch_size, s=down_stride, p=down_pad)
        self.rpe_shapes = []
        hw = [math.ceil(image_size / in_stride)] * 2
        for i in range(4):
            npz = hw[0] * hw[1]
            srp = math.ceil(hw[0] / a["sr_ratio"][i]) \
                * math.ceil(hw[1] / a["sr_ratio"][i])
            self.rpe_shapes.append((1, a["num_heads"][i], npz, srp))
            hw = [math.ceil(hw[0] / 2), math.ceil(hw[1] / 2)]
        self.network = []
        for i in range(4):
            stage = [Block2d(dims[i], a["kernel_size"][i],
                             a["sr_ratio"][i], a["num_groups"][i],
                             a["num_heads"][i], a["mlp_ratios"][i],
                             layer_scale_init_value=a[
                                 "layer_scale_init_value"])
                     for _ in range(layers[i])]
            self.network.append(stage)
            if i < 3:
                self.network.append(PatchEmbed2d(
                    down_patch_size, down_stride, down_pad, dims[i],
                    dims[i + 1]))
        self.dims = dims

    def init(self, key):
        ks = iter(jax.random.split(key, 64))
        p = {"patch_embed": self.patch_embed.init(next(ks)),
             "relative_pos_enc": {str(i): jnp.zeros(s)
                                  for i, s in enumerate(self.rpe_shapes)},
             "network": {}}
        for i, item in enumerate(self.network):
            if isinstance(item, list):
                p["network"][str(i)] = {str(j): b.init(next(ks))
                                        for j, b in enumerate(item)}
            else:
                p["network"][str(i)] = item.init(next(ks))
        if self.num_classes > 0:
            p["classifier"] = {
                "0": ops.layer_norm_init(self.dims[-1]),
                "2": conv2d_init(next(ks), self.dims[-1],
                                 self.num_classes, 1)}
        return p

    def apply(self, p, x):
        x = self.patch_embed.apply(p["patch_embed"], x)
        pos_idx = 0
        for i, item in enumerate(self.network):
            if isinstance(item, list):
                rpe = p["relative_pos_enc"][str(pos_idx)]
                for j, blk in enumerate(item):
                    x = blk.apply(p["network"][str(i)][str(j)], x, rpe)
                pos_idx += 1
            else:
                x = item.apply(p["network"][str(i)], x)
        if self.num_classes > 0:
            x = gn2d(x, p["classifier"]["0"])
            x = jnp.mean(x, axis=(2, 3), keepdims=True)
            x = conv2d(x, p["classifier"]["2"])
            return x.reshape(x.shape[0], -1)
        return x
