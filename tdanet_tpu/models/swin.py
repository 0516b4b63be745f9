"""Swin Transformer (2-D) + Swin-UNet — experimental separator backbones
(reference: look2hear/models/swin_transformer.py:26-693,
swin_unet.py:359-823; only commented usage at TDANet_attn.py:377-381).

Functional JAX with torch-layout parameters. The window shift+partition
data movement goes through the fused Pallas kernel pair
(tdanet_tpu.kernels.window_process) on TPU — the role the reference's
CUDA extension plays (swin_transformer.py:13-23) — with the XLA
formulation as the oracle-checked equivalent.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from tdanet_tpu import ops
from tdanet_tpu.models.base import warn_unused_kwargs
from tdanet_tpu.kernels import (
    roll_and_window_partition_xla,
    window_merge_and_roll_xla,
    window_partition_xla,
    window_reverse_xla,
)


def _linear_init(key, in_f, out_f, bias=True, std=0.02):
    k1, _ = jax.random.split(key)
    p = {"weight": jax.random.truncated_normal(
        k1, -2.0, 2.0, (out_f, in_f)) * std}
    if bias:
        p["bias"] = jnp.zeros((out_f,))
    return p


def _linear(x, p):
    y = x @ p["weight"].astype(x.dtype).T
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


class Mlp:
    """fc1 -> GELU -> fc2 (swin_transformer.py:26-43)."""

    def __init__(self, in_features, hidden_features=None, out_features=None,
                 drop=0.0):
        self.in_f = in_features
        self.hid = hidden_features or in_features
        self.out_f = out_features or in_features
        self.drop = drop

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"fc1": _linear_init(k1, self.in_f, self.hid),
                "fc2": _linear_init(k2, self.hid, self.out_f)}

    def apply(self, p, x, *, training=False, rng=None):
        x = jax.nn.gelu(_linear(x, p["fc1"]), approximate=False)
        if training and self.drop > 0:
            x = ops.dropout(x, jax.random.fold_in(rng, 0), self.drop, True)
        x = _linear(x, p["fc2"])
        if training and self.drop > 0:
            x = ops.dropout(x, jax.random.fold_in(rng, 1), self.drop, True)
        return x


class MlpConv:
    """Conv-flavored MLP used by the Swin-UNet blocks (swin_unet.py:29-50):
    ConvNorm 1x1 -> depthwise k=5 -> GELU -> ConvNorm 1x1, applied over the
    transposed (B, C, N) layout."""

    def __init__(self, in_features, hidden_features, drop=0.0):
        from tdanet_tpu.models.components import ConvNorm
        self.fc1 = ConvNorm(in_features, hidden_features, 1, bias=False,
                            norm="gn")
        self.fc2 = ConvNorm(hidden_features, in_features, 1, bias=False,
                            norm="gn")
        self.hidden = hidden_features
        self.drop = drop

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"fc1": self.fc1.init(k1),
                "dwconv": ops.conv1d_init(k2, self.hidden, self.hidden, 5,
                                          groups=self.hidden, bias=True),
                "fc2": self.fc2.init(k3)}

    def apply(self, p, x, *, training=False, rng=None):
        x = x.transpose(0, 2, 1)
        x = self.fc1.apply(p["fc1"], x)
        x = ops.conv1d(x, p["dwconv"], padding=2, groups=self.hidden)
        x = jax.nn.gelu(x, approximate=False)
        if training and self.drop > 0:
            x = ops.dropout(x, jax.random.fold_in(rng, 0), self.drop, True)
        x = self.fc2.apply(p["fc2"], x)
        if training and self.drop > 0:
            x = ops.dropout(x, jax.random.fold_in(rng, 1), self.drop, True)
        return x.transpose(0, 2, 1)


def relative_position_index(ws_h, ws_w):
    """(Wh*Ww, Wh*Ww) index into the bias table
    (swin_transformer.py:103-115)."""
    coords = np.stack(np.meshgrid(np.arange(ws_h), np.arange(ws_w),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws_h - 1
    rel[:, :, 1] += ws_w - 1
    rel[:, :, 0] *= 2 * ws_w - 1
    return rel.sum(-1)


class WindowAttention:
    """W-MSA with relative position bias (swin_transformer.py:77-157)."""

    def __init__(self, dim, window_size, num_heads, qkv_bias=True,
                 qk_scale=None, attn_drop=0.0, proj_drop=0.0):
        self.dim = dim
        self.window_size = window_size  # (Wh, Ww)
        self.num_heads = num_heads
        self.scale = qk_scale or (dim // num_heads) ** -0.5
        self.qkv_bias = qkv_bias
        self.attn_drop = attn_drop
        self.proj_drop = proj_drop
        self.rpi = jnp.asarray(relative_position_index(*window_size))

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        tbl = (2 * self.window_size[0] - 1) * (2 * self.window_size[1] - 1)
        return {
            "relative_position_bias_table": jax.random.truncated_normal(
                k1, -2.0, 2.0, (tbl, self.num_heads)) * 0.02,
            "qkv": _linear_init(k2, self.dim, self.dim * 3,
                                bias=self.qkv_bias),
            "proj": _linear_init(k3, self.dim, self.dim),
        }

    def apply(self, p, x, mask=None, *, training=False, rng=None):
        B_, N, C = x.shape
        H = self.num_heads
        qkv = _linear(x, p["qkv"]).reshape(B_, N, 3, H, C // H) \
            .transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnc,bhmc->bhnm", q * self.scale, k,
                          preferred_element_type=ops.acc_dtype(x.dtype))
        bias = p["relative_position_bias_table"].astype(attn.dtype)[
            self.rpi.reshape(-1)].reshape(N, N, -1).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, H, N, N) \
                + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(-1, H, N, N)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        if training and self.attn_drop > 0:
            attn = ops.dropout(attn, jax.random.fold_in(rng, 0),
                               self.attn_drop, True)
        out = jnp.einsum("bhnm,bhmc->bhnc", attn, v,
                         preferred_element_type=ops.acc_dtype(x.dtype)).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        out = _linear(out, p["proj"])
        if training and self.proj_drop > 0:
            out = ops.dropout(out, jax.random.fold_in(rng, 1),
                              self.proj_drop, True)
        return out


def _attn_mask(H, W, window_size, shift_size):
    """SW-MSA mask (swin_transformer.py:230-247), static numpy."""
    img = np.zeros((H, W))
    cnt = 0
    for h in (slice(0, -window_size), slice(-window_size, -shift_size),
              slice(-shift_size, None)):
        for w in (slice(0, -window_size), slice(-window_size, -shift_size),
                  slice(-shift_size, None)):
            img[h, w] = cnt
            cnt += 1
    nH, nW = H // window_size, W // window_size
    wins = img.reshape(nH, window_size, nW, window_size) \
        .transpose(0, 2, 1, 3).reshape(-1, window_size * window_size)
    diff = wins[:, None, :] - wins[:, :, None]
    return jnp.asarray(np.where(diff != 0, -100.0, 0.0), jnp.float32)


class SwinTransformerBlock:
    """(swin_transformer.py:175-290)."""

    def __init__(self, dim, input_resolution, num_heads, window_size=7,
                 shift_size=0, mlp_ratio=4.0, qkv_bias=True, qk_scale=None,
                 drop=0.0, attn_drop=0.0, drop_path=0.0, mlp_conv=False):
        self.dim = dim
        self.input_resolution = input_resolution
        if min(input_resolution) <= window_size:
            shift_size = 0
            window_size = min(input_resolution)
        assert 0 <= shift_size < window_size
        self.window_size, self.shift_size = window_size, shift_size
        self.attn = WindowAttention(dim, (window_size, window_size),
                                    num_heads, qkv_bias, qk_scale,
                                    attn_drop, drop)
        self.mlp = (MlpConv(dim, int(dim * mlp_ratio), drop=drop)
                    if mlp_conv else Mlp(dim, int(dim * mlp_ratio),
                                         drop=drop))
        self.drop_path = drop_path
        H, W = input_resolution
        self.mask = (_attn_mask(H, W, window_size, shift_size)
                     if shift_size > 0 else None)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"norm1": ops.layer_norm_init(self.dim),
                "attn": self.attn.init(k1),
                "norm2": ops.layer_norm_init(self.dim),
                "mlp": self.mlp.init(k2)}

    def apply(self, p, x, *, training=False, rng=None):
        H, W = self.input_resolution
        B, L, C = x.shape
        ws = self.window_size

        def dp(v, i):
            if training and self.drop_path > 0:
                return ops.drop_path(v, jax.random.fold_in(rng, i),
                                     self.drop_path, True)
            return v

        shortcut = x
        x = ops.layer_norm(x, p["norm1"]).reshape(B, H, W, C)
        x_windows = roll_and_window_partition_xla(x, self.shift_size, ws)
        x_windows = x_windows.reshape(-1, ws * ws, C)
        attn_windows = self.attn.apply(p["attn"], x_windows, self.mask,
                                       training=training, rng=rng)
        attn_windows = attn_windows.reshape(-1, ws, ws, C)
        x = window_merge_and_roll_xla(attn_windows, self.shift_size, ws,
                                      H, W).reshape(B, H * W, C)
        x = shortcut + dp(x, 100)
        x = x + dp(self.mlp.apply(p["mlp"], ops.layer_norm(x, p["norm2"]),
                                  training=training, rng=rng), 101)
        return x


class PatchMerging:
    """(swin_transformer.py:315-352)."""

    def __init__(self, input_resolution, dim):
        self.input_resolution, self.dim = input_resolution, dim

    def init(self, key):
        return {"reduction": _linear_init(key, 4 * self.dim, 2 * self.dim,
                                          bias=False),
                "norm": ops.layer_norm_init(4 * self.dim)}

    def apply(self, p, x):
        H, W = self.input_resolution
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
        x = x.reshape(B, -1, 4 * C)
        x = ops.layer_norm(x, p["norm"])
        return _linear(x, p["reduction"])


class PatchExpand:
    """(swin_unet.py:359-383)."""

    def __init__(self, input_resolution, dim, dim_scale=2):
        self.input_resolution, self.dim = input_resolution, dim
        self.dim_scale = dim_scale

    def init(self, key):
        p = {"norm": ops.layer_norm_init(self.dim // self.dim_scale)}
        if self.dim_scale == 2:
            p["expand"] = _linear_init(key, self.dim, 2 * self.dim,
                                       bias=False)
        return p

    def apply(self, p, x):
        H, W = self.input_resolution
        if self.dim_scale == 2:
            x = _linear(x, p["expand"])
        B, L, C = x.shape
        x = x.reshape(B, H, W, 2, 2, C // 4) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H * 2 * W, C // 4)
        return ops.layer_norm(x, p["norm"])


class FinalPatchExpand_X4:
    """(swin_unet.py:384-411)."""

    def __init__(self, input_resolution, dim, dim_scale=4):
        self.input_resolution, self.dim = input_resolution, dim
        self.dim_scale = dim_scale

    def init(self, key):
        return {"expand": _linear_init(key, self.dim,
                                       self.dim_scale ** 2 * self.dim,
                                       bias=False),
                "norm": ops.layer_norm_init(self.dim)}

    def apply(self, p, x):
        H, W = self.input_resolution
        s = self.dim_scale
        x = _linear(x, p["expand"])
        B, L, C = x.shape
        x = x.reshape(B, H, W, s, s, C // (s * s)) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(B, s * H * s * W,
                                                 C // (s * s))
        return ops.layer_norm(x, p["norm"])


class BasicLayer:
    """Stage of blocks (+ optional PatchMerging downsample)
    (swin_transformer.py:364-436)."""

    def __init__(self, dim, input_resolution, depth, num_heads, window_size,
                 mlp_ratio=4.0, qkv_bias=True, qk_scale=None, drop=0.0,
                 attn_drop=0.0, drop_path=0.0, downsample=False,
                 mlp_conv=False):
        dpr = drop_path if isinstance(drop_path, (list, tuple)) \
            else [drop_path] * depth
        self.blocks = [SwinTransformerBlock(
            dim, input_resolution, num_heads, window_size,
            0 if i % 2 == 0 else window_size // 2, mlp_ratio, qkv_bias,
            qk_scale, drop, attn_drop, dpr[i], mlp_conv=mlp_conv)
            for i in range(depth)]
        self.downsample = PatchMerging(input_resolution, dim) \
            if downsample else None

    def init(self, key):
        ks = jax.random.split(key, len(self.blocks) + 1)
        p = {"blocks": {str(i): b.init(ks[i])
                        for i, b in enumerate(self.blocks)}}
        if self.downsample is not None:
            p["downsample"] = self.downsample.init(ks[-1])
        return p

    def apply(self, p, x, *, training=False, rng=None):
        for i, b in enumerate(self.blocks):
            x = b.apply(p["blocks"][str(i)], x, training=training,
                        rng=jax.random.fold_in(rng, i)
                        if rng is not None else None)
        if self.downsample is not None:
            x = self.downsample.apply(p["downsample"], x)
        return x


class BasicLayerUp(BasicLayer):
    """Decoder stage with PatchExpand upsample (swin_unet.py:510-566)."""

    def __init__(self, dim, input_resolution, depth, num_heads, window_size,
                 mlp_ratio=4.0, qkv_bias=True, qk_scale=None, drop=0.0,
                 attn_drop=0.0, drop_path=0.0, upsample=False,
                 mlp_conv=True):
        super().__init__(dim, input_resolution, depth, num_heads,
                         window_size, mlp_ratio, qkv_bias, qk_scale, drop,
                         attn_drop, drop_path, downsample=False,
                         mlp_conv=mlp_conv)
        self.upsample = PatchExpand(input_resolution, dim) \
            if upsample else None

    def init(self, key):
        p = super().init(key)
        if self.upsample is not None:
            p["upsample"] = self.upsample.init(jax.random.fold_in(key, 9))
        return p

    def apply(self, p, x, *, training=False, rng=None):
        for i, b in enumerate(self.blocks):
            x = b.apply(p["blocks"][str(i)], x, training=training,
                        rng=jax.random.fold_in(rng, i)
                        if rng is not None else None)
        if self.upsample is not None:
            x = self.upsample.apply(p["upsample"], x)
        return x


class PatchEmbed:
    """Conv patchify (swin_transformer.py:437-478)."""

    def __init__(self, img_size=224, patch_size=4, in_chans=3, embed_dim=96,
                 norm=True):
        to2 = lambda v: (v, v) if isinstance(v, int) else tuple(v)
        self.img_size = to2(img_size)
        self.patch_size = to2(patch_size)
        self.patches_resolution = [self.img_size[0] // self.patch_size[0],
                                   self.img_size[1] // self.patch_size[1]]
        self.num_patches = (self.patches_resolution[0]
                            * self.patches_resolution[1])
        self.in_chans, self.embed_dim, self.norm = in_chans, embed_dim, norm

    def init(self, key):
        kh, kw = self.patch_size
        fan_in = self.in_chans * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        p = {"proj": {
            "weight": jax.random.uniform(
                key, (self.embed_dim, self.in_chans, kh, kw), jnp.float32,
                -bound, bound),
            "bias": jnp.zeros((self.embed_dim,))}}
        if self.norm:
            p["norm"] = ops.layer_norm_init(self.embed_dim)
        return p

    def apply(self, p, x):
        w = p["proj"]["weight"].astype(x.dtype)
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=self.patch_size, padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        out = out + p["proj"]["bias"].astype(x.dtype)[None, :, None, None]
        B, C = out.shape[:2]
        out = out.reshape(B, C, -1).transpose(0, 2, 1)
        if self.norm:
            out = ops.layer_norm(out, p["norm"])
        return out


class SwinTransformer:
    """Image classifier (swin_transformer.py:484-665)."""

    def __init__(self, img_size=224, patch_size=4, in_chans=3,
                 num_classes=1000, embed_dim=96, depths=(2, 2, 6, 2),
                 num_heads=(3, 6, 12, 24), window_size=7, mlp_ratio=4.0,
                 qkv_bias=True, qk_scale=None, drop_rate=0.0,
                 attn_drop_rate=0.0, drop_path_rate=0.1, ape=False,
                 patch_norm=True, **unused):
        warn_unused_kwargs(type(self).__name__, unused)
        self.num_layers = len(depths)
        self.embed_dim = embed_dim
        self.ape = ape
        self.num_classes = num_classes
        self.num_features = int(embed_dim * 2 ** (self.num_layers - 1))
        self.patch_embed = PatchEmbed(img_size, patch_size, in_chans,
                                      embed_dim, norm=patch_norm)
        pr = self.patch_embed.patches_resolution
        dpr = list(np.linspace(0, drop_path_rate, sum(depths)))
        self.layers = []
        for i in range(self.num_layers):
            self.layers.append(BasicLayer(
                int(embed_dim * 2 ** i),
                (pr[0] // (2 ** i), pr[1] // (2 ** i)), depths[i],
                num_heads[i], window_size, mlp_ratio, qkv_bias, qk_scale,
                drop_rate, attn_drop_rate,
                dpr[sum(depths[:i]):sum(depths[:i + 1])],
                downsample=i < self.num_layers - 1))

    def init(self, key):
        ks = jax.random.split(key, self.num_layers + 3)
        p = {"patch_embed": self.patch_embed.init(ks[0]),
             "layers": {str(i): l.init(ks[1 + i])
                        for i, l in enumerate(self.layers)},
             "norm": ops.layer_norm_init(self.num_features)}
        if self.num_classes > 0:
            p["head"] = _linear_init(ks[-1], self.num_features,
                                     self.num_classes)
        if self.ape:
            p["absolute_pos_embed"] = jax.random.truncated_normal(
                ks[-2], -2.0, 2.0,
                (1, self.patch_embed.num_patches, self.embed_dim)) * 0.02
        return p

    def apply(self, p, x, *, training=False, rng=None):
        x = self.patch_embed.apply(p["patch_embed"], x)
        if self.ape:
            x = x + p["absolute_pos_embed"].astype(x.dtype)
        for i, layer in enumerate(self.layers):
            x = layer.apply(p["layers"][str(i)], x, training=training,
                            rng=jax.random.fold_in(rng, i)
                            if rng is not None else None)
        x = ops.layer_norm(x, p["norm"])
        x = jnp.mean(x, axis=1)
        if "head" in p:
            x = _linear(x, p["head"])
        return x


class SwinTransformerSys:
    """Swin-UNet encoder/decoder (swin_unet.py:616-823)."""

    def __init__(self, img_size=224, patch_size=4, in_chans=3,
                 num_classes=1000, embed_dim=96, depths=(2, 2, 2, 2),
                 depths_decoder=(1, 2, 2, 2), num_heads=(3, 6, 12, 24),
                 window_size=7, mlp_ratio=4.0, qkv_bias=True, qk_scale=None,
                 drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.1,
                 ape=False, patch_norm=True, final_upsample="expand_first",
                 dim_scale=4, **unused):
        warn_unused_kwargs(type(self).__name__, unused)
        self.num_layers = len(depths)
        self.embed_dim = embed_dim
        self.ape = ape
        self.num_classes = num_classes
        self.dim_scale = dim_scale
        self.final_upsample = final_upsample
        self.num_features = int(embed_dim * 2 ** (self.num_layers - 1))
        self.patch_embed = PatchEmbed(img_size, patch_size, in_chans,
                                      embed_dim, norm=patch_norm)
        pr = self.patch_embed.patches_resolution
        self.patches_resolution = pr
        dpr = list(np.linspace(0, drop_path_rate, sum(depths)))
        self.layers = []
        for i in range(self.num_layers):
            self.layers.append(BasicLayer(
                int(embed_dim * 2 ** i),
                (pr[0] // (2 ** i), pr[1] // (2 ** i)), depths[i],
                num_heads[i], window_size, mlp_ratio, qkv_bias, qk_scale,
                drop_rate, attn_drop_rate,
                dpr[sum(depths[:i]):sum(depths[:i + 1])],
                downsample=i < self.num_layers - 1, mlp_conv=True))
        self.layers_up = []
        self.concat_dims = []
        for i in range(self.num_layers):
            lvl = self.num_layers - 1 - i
            dim = int(embed_dim * 2 ** lvl)
            res = (pr[0] // (2 ** lvl), pr[1] // (2 ** lvl))
            self.concat_dims.append(dim if i > 0 else None)
            if i == 0:
                self.layers_up.append(PatchExpand(res, dim, 2))
            else:
                self.layers_up.append(BasicLayerUp(
                    dim, res, depths[lvl], num_heads[lvl], window_size,
                    mlp_ratio, qkv_bias, qk_scale, drop_rate,
                    attn_drop_rate,
                    dpr[sum(depths[:lvl]):sum(depths[:lvl + 1])],
                    upsample=i < self.num_layers - 1))
        if final_upsample == "expand_first":
            pr0 = self.patch_embed.patches_resolution
            self.up = FinalPatchExpand_X4((pr0[0], pr0[1]), embed_dim,
                                          dim_scale)

    def init(self, key):
        ks = jax.random.split(key, 4 * self.num_layers + 6)
        it = iter(ks)
        p = {"patch_embed": self.patch_embed.init(next(it)),
             "layers": {str(i): l.init(next(it))
                        for i, l in enumerate(self.layers)},
             "layers_up": {str(i): l.init(next(it))
                           for i, l in enumerate(self.layers_up)},
             "concat_back_dim": {},
             "norm": ops.layer_norm_init(self.num_features),
             "norm_up": ops.layer_norm_init(self.embed_dim)}
        for i, dim in enumerate(self.concat_dims):
            if dim is not None:
                p["concat_back_dim"][str(i)] = _linear_init(next(it),
                                                            2 * dim, dim)
        if self.ape:
            p["absolute_pos_embed"] = jax.random.truncated_normal(
                next(it), -2.0, 2.0,
                (1, self.patch_embed.num_patches, self.embed_dim)) * 0.02
        if self.final_upsample == "expand_first":
            p["up"] = self.up.init(next(it))
            fan_in = self.embed_dim
            bound = 1.0 / math.sqrt(fan_in)
            p["output"] = {"weight": jax.random.uniform(
                next(it), (self.num_classes, self.embed_dim, 1, 1),
                jnp.float32, -bound, bound)}
        return p

    def apply(self, p, x, *, training=False, rng=None):
        """x: (B, L, C) with C a square (the reference reshapes tokens to
        sqrt(C) x sqrt(C) images, swin_unet.py forward)."""
        B, L, C = x.shape
        side = int(math.sqrt(C))
        x = x.reshape(B, L, side, side)
        x = self.patch_embed.apply(p["patch_embed"], x)
        if self.ape:
            x = x + p["absolute_pos_embed"].astype(x.dtype)
        downs = []
        for i, layer in enumerate(self.layers):
            downs.append(x)
            x = layer.apply(p["layers"][str(i)], x, training=training,
                            rng=jax.random.fold_in(rng, i)
                            if rng is not None else None)
        x = ops.layer_norm(x, p["norm"])
        for i, layer_up in enumerate(self.layers_up):
            if i == 0:
                x = layer_up.apply(p["layers_up"]["0"], x)
            else:
                x = jnp.concatenate([x, downs[self.num_layers - 1 - i]], -1)
                x = _linear(x, p["concat_back_dim"][str(i)])
                x = layer_up.apply(p["layers_up"][str(i)], x,
                                   training=training,
                                   rng=jax.random.fold_in(rng, 50 + i)
                                   if rng is not None else None)
        x = ops.layer_norm(x, p["norm_up"])
        if self.final_upsample == "expand_first":
            H, W = self.patches_resolution
            x = self.up.apply(p["up"], x)
            x = x.reshape(B, self.dim_scale * H, self.dim_scale * W, -1)
            x = x.transpose(0, 3, 1, 2)
            x = jax.lax.conv_general_dilated(
                x, p["output"]["weight"].astype(x.dtype), (1, 1), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return x.reshape(B, self.num_classes, -1)


class FinalPatchExpandX4Custom:
    """Per-axis final expand (swin_unet.py:412-439): dim_scale tuple
    (p1, p2), expand Linear dim -> p1*p2*dim."""

    def __init__(self, input_resolution, dim, dim_scale=(2, 2)):
        self.input_resolution, self.dim = input_resolution, dim
        self.dim_scale = tuple(dim_scale)

    def init(self, key):
        p1, p2 = self.dim_scale
        return {"expand": _linear_init(key, self.dim, p1 * p2 * self.dim,
                                       bias=False),
                "norm": ops.layer_norm_init(self.dim)}

    def apply(self, p, x):
        H, W = self.input_resolution
        p1, p2 = self.dim_scale
        x = _linear(x, p["expand"])
        B, L, C = x.shape
        x = x.reshape(B, H, W, p1, p2, C // (p1 * p2)) \
            .transpose(0, 1, 3, 2, 4, 5) \
            .reshape(B, p1 * H * p2 * W, C // (p1 * p2))
        return ops.layer_norm(x, p["norm"])


class SwinTransformerSysCustom(SwinTransformerSys):
    """Swin-UNet over direct NCHW image input with tuple img/patch sizes
    and a per-axis final expand (swin_unet.py:824-1073); differs from
    SwinTransformerSys in skipping the token->sqrt(C)-image reshape and
    using FinalPatchExpand_X4_Custom with dim_scale = patch_size."""

    def __init__(self, img_size=(224, 224), patch_size=(4, 4), **kwargs):
        to2 = lambda v: (v, v) if isinstance(v, int) else tuple(v)
        img_size, patch_size = to2(img_size), to2(patch_size)
        # base ctor builds everything except the final expand; feed it the
        # first-axis sizes (the encoder/decoder stages only use the
        # patches_resolution, computed per-axis by PatchEmbed below)
        super().__init__(img_size=img_size, patch_size=patch_size, **kwargs)
        self.patch_size = patch_size
        if self.final_upsample == "expand_first":
            pr = self.patch_embed.patches_resolution
            self.up = FinalPatchExpandX4Custom(
                (pr[0], pr[1]), self.embed_dim, dim_scale=patch_size)

    def apply(self, p, x, *, training=False, rng=None):
        B = x.shape[0]
        x = self.patch_embed.apply(p["patch_embed"], x)
        if self.ape:
            x = x + p["absolute_pos_embed"].astype(x.dtype)
        downs = []
        for i, layer in enumerate(self.layers):
            downs.append(x)
            x = layer.apply(p["layers"][str(i)], x, training=training,
                            rng=jax.random.fold_in(rng, i)
                            if rng is not None else None)
        x = ops.layer_norm(x, p["norm"])
        for i, layer_up in enumerate(self.layers_up):
            if i == 0:
                x = layer_up.apply(p["layers_up"]["0"], x)
            else:
                x = jnp.concatenate([x, downs[self.num_layers - 1 - i]], -1)
                x = _linear(x, p["concat_back_dim"][str(i)])
                x = layer_up.apply(p["layers_up"][str(i)], x,
                                   training=training,
                                   rng=jax.random.fold_in(rng, 50 + i)
                                   if rng is not None else None)
        x = ops.layer_norm(x, p["norm_up"])
        if self.final_upsample == "expand_first":
            H, W = self.patches_resolution
            p1, p2 = self.patch_size
            x = self.up.apply(p["up"], x)
            x = x.reshape(B, p1 * H, p2 * W, -1).transpose(0, 3, 1, 2)
            x = jax.lax.conv_general_dilated(
                x, p["output"]["weight"].astype(x.dtype), (1, 1), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return x
