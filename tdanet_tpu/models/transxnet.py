"""TransXNet 1-D library (reference: look2hear/models/TransXNet.py).

Input-dependent dynamic convs (IDConv), OSRA attention, the D-Mixer
hybrid token mixer, MS-FFN, and LayerScale — the pieces the
TDANet EMCAD/OSRA/dynamic-conv variants compose. All norms here are the
GroupNorm(1, C, eps=1e-8) flavor ("gn", TransXNet.py:11 imports
TDANet_origin's GlobLN).

TPU notes: the per-sample dynamic depthwise conv (the reference uses a
grouped F.conv1d with B*C groups, TransXNet.py:464-470) is expressed as a
static-K sum of strided slices scaled by the predicted kernels — pure VPU
work that XLA fuses, no gather/scatter.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from tdanet_tpu import ops


def trunc_normal_init(key, shape, std=0.02, dtype=jnp.float32):
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std


_ACTS = {"relu": jax.nn.relu, "gelu": lambda x: jax.nn.gelu(x, approximate=False)}


def _act(name):
    if name is None:
        return None
    return _ACTS.get(name.lower())  # None -> PReLU handled via params


class ConvModule:
    """conv (+ GroupNorm) (+ ReLU/GELU/PReLU) (TransXNet.py:66-135)."""

    def __init__(self, in_chans, embed_dim, kernel_size, stride=1,
                 padding="auto", groups=1, bias="auto", norm=True,
                 act=None):
        self.in_chans, self.embed_dim = in_chans, embed_dim
        self.kernel_size, self.stride = kernel_size, stride
        self.groups = groups
        self.padding = kernel_size // 2 if padding == "auto" else padding
        self.with_norm = norm
        self.bias = (not norm) if bias == "auto" else bias
        self.act = act  # None | 'relu' | 'gelu' | 'prelu'

    def init(self, key):
        p = {"conv": ops.conv1d_init(key, self.in_chans, self.embed_dim,
                                     self.kernel_size, self.groups,
                                     self.bias)}
        if self.with_norm:
            p["norm"] = ops.layer_norm_init(self.embed_dim)
        if self.act == "prelu":
            p["act"] = ops.prelu_init()
        return p

    def apply(self, p, x):
        x = ops.conv1d(x, p["conv"], stride=self.stride,
                       padding=self.padding, groups=self.groups)
        if self.with_norm:
            x = ops.group_norm1(x, p["norm"])
        if self.act == "prelu":
            x = ops.prelu(x, p["act"])
        elif self.act is not None:
            x = _ACTS[self.act](x)
        return x


def dynamic_depthwise_conv(x, weight, bias=None, *, stride=1):
    """Per-sample depthwise conv: x (B,C,L), weight (B,C,K) -> (B,C,L//s).

    Equivalent to the reference's grouped conv with B*C groups
    (TransXNet.py:464-470); written as a static-K shift-and-scale sum.
    """
    B, C, L = x.shape
    K = weight.shape[-1]
    pad = K // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
    L_out = (L + 2 * pad - K) // stride + 1
    out = jnp.zeros((B, C, L_out), x.dtype)
    for k in range(K):
        sl = jax.lax.slice_in_dim(xp, k, k + (L_out - 1) * stride + 1,
                                  stride=stride, axis=2)
        out = out + sl * weight[..., k:k + 1]
    if bias is not None:
        out = out + bias[..., None]
    return out


class DynamicConv1d:
    """IDConv (TransXNet.py:410-473): kernels are a softmax mixture over
    ``num_groups`` weight banks, predicted from pooled features."""

    def __init__(self, dim, kernel_size=3, reduction_ratio=4, num_groups=1,
                 stride=1, act="prelu", bias=True):
        assert num_groups > 1
        self.dim, self.K = dim, kernel_size
        self.num_groups, self.stride = num_groups, stride
        self.use_bias = bias
        self.proj0 = ConvModule(dim, dim // reduction_ratio, 1, norm=True,
                                act="prelu" if act is not None else None)
        self.proj1_out = dim * num_groups
        self.red = dim // reduction_ratio

    def init(self, key):
        ks = jax.random.split(key, 4)
        p = {"weight": trunc_normal_init(ks[0], (self.num_groups, self.dim,
                                                 self.K)),
             "proj": {"0": self.proj0.init(ks[1]),
                      "1": ops.conv1d_init(ks[2], self.red, self.proj1_out,
                                           1)}}
        if self.use_bias:
            p["bias"] = trunc_normal_init(ks[3], (self.num_groups, self.dim))
        return p

    def _proj(self, p, z):
        z = self.proj0.apply(p["proj"]["0"], z)
        return ops.conv1d(z, p["proj"]["1"])

    def apply(self, p, x):
        B, C, L = x.shape
        G, K = self.num_groups, self.K
        pooled = ops.adaptive_avg_pool1d(x, K)
        scale = self._proj(p, pooled).reshape(B, G, C, K)
        scale = jax.nn.softmax(scale, axis=1)
        weight = jnp.sum(scale * p["weight"][None].astype(x.dtype), axis=1)
        if self.use_bias:
            bscale = self._proj(p, jnp.mean(x, axis=-1, keepdims=True))
            bscale = jax.nn.softmax(bscale.reshape(B, G, C), axis=1)
            bias = jnp.sum(bscale * p["bias"][None].astype(x.dtype), axis=1)
        else:
            bias = None
        return dynamic_depthwise_conv(x, weight, bias, stride=self.stride)


class FCDyConv1d:
    """Fixed-length IDConv variant: the pooling is a learned Linear
    L->K with a scalar-per-group weight bank (TransXNet.py:474-540)."""

    def __init__(self, dim, in_feat, kernel_size=3, reduction_ratio=4,
                 num_groups=1, stride=1, act="prelu", bias=True):
        assert num_groups > 1
        self.dim, self.K = dim, kernel_size
        self.in_feat = in_feat
        self.num_groups, self.stride = num_groups, stride
        self.use_bias = bias
        self.proj0 = ConvModule(dim, dim // reduction_ratio, 1, norm=True,
                                act="prelu" if act is not None else None)
        self.proj1_out = dim * num_groups
        self.red = dim // reduction_ratio

    def init(self, key):
        ks = jax.random.split(key, 5)
        bound = 1.0 / math.sqrt(self.in_feat)
        p = {"weight": trunc_normal_init(ks[0], (self.num_groups, 1, 1)),
             "pool": {"weight": jax.random.uniform(
                 ks[1], (self.K, self.in_feat), jnp.float32, -bound, bound)},
             "proj": {"0": self.proj0.init(ks[2]),
                      "1": ops.conv1d_init(ks[3], self.red, self.proj1_out,
                                           1)}}
        if self.use_bias:
            p["bias"] = trunc_normal_init(ks[4], (self.num_groups, self.dim))
        return p

    def _proj(self, p, z):
        z = self.proj0.apply(p["proj"]["0"], z)
        return ops.conv1d(z, p["proj"]["1"])

    def apply(self, p, x):
        B, C, L = x.shape
        G, K = self.num_groups, self.K
        pooled = jnp.einsum("bcl,kl->bck", x, p["pool"]["weight"]
                            .astype(x.dtype))
        scale = self._proj(p, pooled).reshape(B, G, C, K)
        scale = jax.nn.softmax(scale, axis=1)
        weight = jnp.sum(scale * p["weight"][None, :, :, :].astype(x.dtype),
                         axis=1)
        if self.use_bias:
            bscale = self._proj(p, jnp.mean(x, axis=-1, keepdims=True))
            bscale = jax.nn.softmax(bscale.reshape(B, G, C), axis=1)
            bias = jnp.sum(bscale * p["bias"][None].astype(x.dtype), axis=1)
        else:
            bias = None
        return dynamic_depthwise_conv(x, weight, bias, stride=self.stride)


class Attention1D:
    """OSRA: overlapping spatial-reduction attention
    (TransXNet.py:235-291)."""

    def __init__(self, dim, num_heads=1, qk_scale=None, attn_drop=0.0,
                 sr_ratio=1):
        assert dim % num_heads == 0
        self.dim, self.num_heads = dim, num_heads
        self.scale = qk_scale or (dim // num_heads) ** -0.5
        self.sr_ratio = sr_ratio
        self.attn_drop = attn_drop
        if sr_ratio > 1:
            self.sr0 = ConvModule(dim, dim, sr_ratio + 3, stride=sr_ratio,
                                  padding=(sr_ratio + 3) // 2, groups=dim,
                                  bias=False, norm=True, act="prelu")
            self.sr1 = ConvModule(dim, dim, 1, groups=dim, bias=False,
                                  norm=True, act=None)

    def init(self, key):
        ks = jax.random.split(key, 4)
        p = {"q": ops.conv1d_init(ks[0], self.dim, self.dim, 1),
             "kv": ops.conv1d_init(ks[1], self.dim, self.dim * 2, 1),
             "local_conv": ops.conv1d_init(ks[2], self.dim, self.dim, 3,
                                           groups=self.dim)}
        if self.sr_ratio > 1:
            k1, k2 = jax.random.split(ks[3])
            p["sr"] = {"0": self.sr0.init(k1), "1": self.sr1.init(k2)}
        return p

    def _attend(self, p, x, context, *, training=False, rng=None,
                rpe=None):
        B, C, L = x.shape
        H = self.num_heads
        hd = C // H
        q = ops.conv1d(x, p["q"]).reshape(B, H, hd, L)
        q = q.transpose(0, 1, 3, 2)                      # (B,H,L,hd)
        if self.sr_ratio > 1:
            kv_in = self.sr1.apply(p["sr"]["1"],
                                   self.sr0.apply(p["sr"]["0"], context))
        else:
            kv_in = context
        kv_in = ops.conv1d(kv_in, p["local_conv"], padding=1,
                           groups=self.dim) + kv_in
        kv = ops.conv1d(kv_in, p["kv"])
        k, v = jnp.split(kv, 2, axis=1)
        S = k.shape[-1]
        k = k.reshape(B, H, hd, S)                       # (B,H,hd,S)
        v = v.reshape(B, H, hd, S).transpose(0, 1, 3, 2)  # (B,H,S,hd)
        attn = jnp.einsum("bhlc,bhcs->bhls", q, k,
                          preferred_element_type=ops.acc_dtype(x.dtype)) * self.scale
        if rpe is not None:
            # learned relative position bias (TDANet_OSRA_gated.py:355,382)
            assert rpe.shape[2:] == attn.shape[2:], (rpe.shape, attn.shape)
            attn = attn + rpe.astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(ops.acc_dtype(x.dtype)), axis=-1) \
            .astype(x.dtype)
        if training and self.attn_drop > 0:
            attn = ops.dropout(attn, rng, self.attn_drop, True)
        out = jnp.einsum("bhls,bhsc->bhlc", attn, v,
                         preferred_element_type=ops.acc_dtype(x.dtype)).astype(x.dtype)
        return out.transpose(0, 1, 3, 2).reshape(B, C, L)

    def apply(self, p, x, *, training=False, rng=None, rpe=None):
        return self._attend(p, x, x, training=training, rng=rng, rpe=rpe)


class CrossAttention1D(Attention1D):
    """CrossOSRA (TransXNet.py:292-348): keys/values from a context."""

    def apply(self, p, x, context=None, *, training=False, rng=None):
        return self._attend(p, x, x if context is None else context,
                            training=training, rng=rng)


class MultiScaleDWConv1D:
    """Parallel depthwise convs at kernel scales (1,3,5,7) over channel
    splits (TransXNet.py:637-666)."""

    def __init__(self, dim, scale=(1, 3, 5, 7)):
        self.scale = scale
        self.channels = []
        for i in range(len(scale)):
            if i == 0:
                self.channels.append(dim - dim // len(scale)
                                     * (len(scale) - 1))
            else:
                self.channels.append(dim // len(scale))

    def init(self, key):
        ks = jax.random.split(key, len(self.scale))
        return {"proj": {str(i): ops.conv1d_init(
            ks[i], ch, ch, self.scale[i], groups=ch)
            for i, ch in enumerate(self.channels)}}

    def apply(self, p, x):
        outs = []
        start = 0
        for i, ch in enumerate(self.channels):
            piece = x[:, start:start + ch]
            outs.append(ops.conv1d(piece, p["proj"][str(i)],
                                   padding=self.scale[i] // 2, groups=ch))
            start += ch
        return jnp.concatenate(outs, axis=1)


class Mlp1D:
    """MS-FFN (TransXNet.py:725-790): 1x1 -> act -> GN -> multi-scale
    dwconv residual -> GN(act(.)) -> 1x1 -> GN."""

    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act="gelu", drop=0.0):
        self.out_features = out_features or in_features
        self.hidden = hidden_features or in_features
        self.act = act
        self.drop = drop
        self.in_features = in_features
        self.dwconv = MultiScaleDWConv1D(self.hidden)

    def init(self, key):
        ks = jax.random.split(key, 4)
        p = {"fc1": {"0": ops.conv1d_init(ks[0], self.in_features,
                                          self.hidden, 1, bias=False),
                     "2": ops.layer_norm_init(self.hidden)},
             "dwconv": self.dwconv.init(ks[1]),
             "norm": ops.layer_norm_init(self.hidden),
             "fc2": {"0": ops.conv1d_init(ks[2], self.hidden,
                                          self.out_features, 1, bias=False),
                     "1": ops.layer_norm_init(self.out_features)}}
        if self.act == "prelu":
            p["fc1"]["1"] = ops.prelu_init()
            p["act"] = ops.prelu_init()
        return p

    def _act(self, p, x, key):
        if self.act == "prelu":
            return ops.prelu(x, p[key])
        return _ACTS[self.act](x)

    def apply(self, p, x, *, training=False, rng=None):
        x = ops.conv1d(x, p["fc1"]["0"])
        x = self._act(p.get("fc1", {}), x, "1") if self.act == "prelu" \
            else _ACTS[self.act](x)
        x = ops.group_norm1(x, p["fc1"]["2"])
        x = self.dwconv.apply(p["dwconv"], x) + x
        x = self._act(p, x, "act") if self.act == "prelu" \
            else _ACTS[self.act](x)
        x = ops.group_norm1(x, p["norm"])
        if training and self.drop > 0:
            x = ops.dropout(x, jax.random.fold_in(rng, 0), self.drop, True)
        x = ops.conv1d(x, p["fc2"]["0"])
        x = ops.group_norm1(x, p["fc2"]["1"])
        if training and self.drop > 0:
            x = ops.dropout(x, jax.random.fold_in(rng, 1), self.drop, True)
        return x


class LayerScale1D:
    """Per-channel scale+bias as a 1x1 depthwise conv
    (TransXNet.py:804-815)."""

    def __init__(self, dim, init_value=1e-5):
        self.dim, self.init_value = dim, init_value

    def init(self, key):
        return {"weight": jnp.full((self.dim, 1, 1), self.init_value),
                "bias": jnp.zeros((self.dim,))}

    def apply(self, p, x):
        return x * p["weight"].astype(x.dtype)[None, :, :, 0] \
            + p["bias"].astype(x.dtype)[None, :, None]


class HybridTokenMixer1D:
    """D-Mixer (TransXNet.py:575-608): channel halves through IDConv and
    OSRA, concat, squeezed-transform-excite projection residual."""

    def __init__(self, dim, kernel_size=3, num_groups=2, num_heads=1,
                 sr_ratio=1, reduction_ratio=8):
        assert dim % 2 == 0
        self.dim = dim
        self.local_unit = DynamicConv1d(dim // 2, kernel_size,
                                        num_groups=num_groups)
        self.global_unit = Attention1D(dim // 2, num_heads=num_heads,
                                       sr_ratio=sr_ratio)
        self.inner_dim = max(16, dim // reduction_ratio)

    def init(self, key):
        ks = jax.random.split(key, 6)
        return {
            "local_unit": self.local_unit.init(ks[0]),
            "global_unit": self.global_unit.init(ks[1]),
            "proj": {
                "0": ops.conv1d_init(ks[2], self.dim, self.dim, 3,
                                     groups=self.dim),
                "2": ops.layer_norm_init(self.dim),
                "3": ops.conv1d_init(ks[3], self.dim, self.inner_dim, 1),
                "5": ops.layer_norm_init(self.inner_dim),
                "6": ops.conv1d_init(ks[4], self.inner_dim, self.dim, 1),
                "7": ops.layer_norm_init(self.dim),
            },
        }

    def apply(self, p, x, *, training=False, rng=None, rpe=None):
        x1, x2 = jnp.split(x, 2, axis=1)
        x1 = self.local_unit.apply(p["local_unit"], x1)
        x2 = self.global_unit.apply(p["global_unit"], x2,
                                    training=training, rng=rng, rpe=rpe)
        y = jnp.concatenate([x1, x2], axis=1)
        # bare nn.GroupNorm(1, .) in the STE proj -> torch default eps 1e-5
        z = ops.conv1d(y, p["proj"]["0"], padding=1, groups=self.dim)
        z = ops.group_norm1(_ACTS["gelu"](z), p["proj"]["2"], eps=1e-5)
        z = ops.conv1d(z, p["proj"]["3"])
        z = ops.group_norm1(_ACTS["gelu"](z), p["proj"]["5"], eps=1e-5)
        z = ops.conv1d(z, p["proj"]["6"])
        z = ops.group_norm1(z, p["proj"]["7"], eps=1e-5)
        return z + y


class Block1D:
    """TransXNet network block (TransXNet.py:888-961): conv pos-embed,
    D-Mixer with LayerScale + DropPath, MS-FFN with LayerScale."""

    def __init__(self, dim=64, kernel_size=3, sr_ratio=1, num_groups=2,
                 num_heads=1, mlp_ratio=4, act="relu", drop=0.0,
                 drop_path=0.0, layer_scale_init_value=1e-5):
        self.dim = dim
        self.token_mixer = HybridTokenMixer1D(dim, kernel_size, num_groups,
                                              num_heads, sr_ratio)
        self.mlp = Mlp1D(dim, int(dim * mlp_ratio), act=act, drop=drop)
        self.drop_path = drop_path
        self.use_ls = layer_scale_init_value is not None
        if self.use_ls:
            self.ls1 = LayerScale1D(dim, layer_scale_init_value)
            self.ls2 = LayerScale1D(dim, layer_scale_init_value)

    def init(self, key):
        ks = jax.random.split(key, 6)
        p = {"pos_embed": ops.conv1d_init(ks[0], self.dim, self.dim, 7,
                                          groups=self.dim),
             "norm1": ops.layer_norm_init(self.dim),
             "token_mixer": self.token_mixer.init(ks[1]),
             "norm2": ops.layer_norm_init(self.dim),
             "mlp": self.mlp.init(ks[2])}
        if self.use_ls:
            p["layer_scale_1"] = self.ls1.init(ks[3])
            p["layer_scale_2"] = self.ls2.init(ks[4])
        return p

    def apply(self, p, x, *, training=False, rng=None, rpe=None):
        def dp(v, i):
            if training and self.drop_path > 0:
                return ops.drop_path(v, jax.random.fold_in(rng, i),
                                     self.drop_path, True)
            return v

        x = x + ops.conv1d(x, p["pos_embed"], padding=3, groups=self.dim)
        t = self.token_mixer.apply(p["token_mixer"],
                                   ops.group_norm1(x, p["norm1"]),
                                   training=training, rng=rng, rpe=rpe)
        if self.use_ls:
            t = self.ls1.apply(p["layer_scale_1"], t)
        x = x + dp(t, 1)
        m = self.mlp.apply(p["mlp"], ops.group_norm1(x, p["norm2"]),
                           training=training, rng=rng)
        if self.use_ls:
            m = self.ls2.apply(p["layer_scale_2"], m)
        return x + dp(m, 2)
