"""Unused-but-defined research modules from the reference's TDANet.py
(SURVEY §2.2): SAM1D multi-scale conv attention (TDANet.py:230-326),
Mlp (TDANet.py:329-347), SAMLA fusion (TDANet.py:437-479), AdaLN
(TDANet.py:481-502) and the SE-enhanced UConvBlockV1 (TDANet.py:638-753).

None of these are reachable from a registered reference model, but they
are part of the inventory; each is fidelity-tested against the torch
originals. Quirks reproduced on purpose:

- SAMLA computes its multi-scale conv stack ``s_out`` and then DISCARDS
  it, and the re-flatten of the local embedding happens on the permuted
  (heads, B, N/h, T) view — scrambling heads AND batch together
  (TDANet.py:462,471); parameters still exist and load.
- SAM1D's ``ca_attention == 0`` branch references undefined ``H, W``
  at forward (TDANet.py:321-324) and cannot run in the reference
  either; only the ``ca_attention == 1`` branch is implemented.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from tdanet_tpu import ops
from tdanet_tpu.models.attentions import SEBasicBlock1D, _linear, _linear_init
from tdanet_tpu.models.components import GA, LA, ConvNorm, ConvNormAct, \
    DilatedConvNorm
from tdanet_tpu.models.transxnet import trunc_normal_init


def _sam_linear_init(key, in_f, out_f, bias):
    """SAM1D._init_weights: trunc_normal(std=.02) weight, zero bias
    (TDANet.py:276-280)."""
    p = {"weight": trunc_normal_init(key, (out_f, in_f))}
    if bias:
        p["bias"] = jnp.zeros((out_f,))
    return p


def _sam_conv_init(key, in_c, out_c, kernel, groups=1, bias=True):
    """SAM1D._init_weights conv branch: N(0, sqrt(2/fan_out)), zero bias
    (TDANet.py:284-289)."""
    fan_out = kernel * out_c // groups
    p = {"weight": jax.random.normal(key, (out_c, in_c // groups, kernel))
         * math.sqrt(2.0 / fan_out)}
    if bias:
        p["bias"] = jnp.zeros((out_c,))
    return p


class Mlp:
    """ConvNorm -> depthwise k=5 conv -> ReLU -> ConvNorm with dropout
    (TDANet.py:329-347; distinct from the FFN used by GA)."""

    def __init__(self, in_features, hidden_size, drop=0.1):
        self.fc1 = ConvNorm(in_features, hidden_size, 1, bias=False,
                            norm="gn")
        self.fc2 = ConvNorm(hidden_size, in_features, 1, bias=False,
                            norm="gn")
        self.hidden = hidden_size
        self.drop = drop

    def init(self, key):
        ks = jax.random.split(key, 3)
        return {"fc1": self.fc1.init(ks[0]),
                "dwconv": ops.conv1d_init(ks[1], self.hidden, self.hidden,
                                          5, groups=self.hidden),
                "fc2": self.fc2.init(ks[2])}

    def apply(self, p, x, *, training=False, rng=None):
        x = self.fc1.apply(p["fc1"], x)
        x = ops.conv1d(x, p["dwconv"], padding=2, groups=self.hidden)
        x = jax.nn.relu(x)
        if training and rng is not None:
            x = ops.dropout(x, jax.random.fold_in(rng, 0), self.drop,
                            training)
        x = self.fc2.apply(p["fc2"], x)
        if training and rng is not None:
            x = ops.dropout(x, jax.random.fold_in(rng, 1), self.drop,
                            training)
        return x


class SAM1D:
    """Multi-head mixed-conv attention (TDANet.py:230-326,
    ca_attention=1): per-head depthwise convs of growing kernel on the
    's' projection, SAA 1x1 expand->GlobLN->PReLU->1x1, gate times 'v'."""

    def __init__(self, dim, ca_num_heads=4, qkv_bias=False, proj_drop=0.0,
                 expand_ratio=2):
        self.dim, self.heads = dim, ca_num_heads
        self.qkv_bias = qkv_bias
        self.expand_ratio = expand_ratio
        self.proj_drop = proj_drop
        self.split_groups = dim // ca_num_heads

    def init(self, key):
        ks = jax.random.split(key, 6 + self.heads)
        d, h = self.dim, self.heads
        p = {"v": _sam_linear_init(ks[0], d, d, self.qkv_bias),
             "s": _sam_linear_init(ks[1], d, d, self.qkv_bias),
             "proj": _sam_linear_init(ks[2], d, d, True),
             "proj0": _sam_conv_init(ks[3], d, d * self.expand_ratio, 1,
                                     groups=self.split_groups),
             "norm": {"weight": jnp.ones((d * self.expand_ratio,)),
                      "bias": jnp.zeros((d * self.expand_ratio,))},
             "proj1": _sam_conv_init(ks[4], d * self.expand_ratio, d, 1),
             "act": ops.prelu_init()}
        for i in range(h):
            p[f"local_conv_{i + 1}"] = _sam_conv_init(
                ks[5 + i], d // h, d // h, 3 + 2 * i, groups=d // h)
        return p

    def apply(self, p, x, *, training=False, rng=None):
        B, C, N = x.shape
        h = self.heads
        xt = jnp.transpose(x, (0, 2, 1))            # (B, N, C)
        v = _linear(xt, p["v"])
        s = _linear(xt, p["s"]).reshape(B, N, h, C // h)
        s = jnp.transpose(s, (2, 0, 3, 1))          # (h, B, C/h, N)
        outs = [ops.conv1d(s[i], p[f"local_conv_{i + 1}"],
                           padding=1 + i, groups=C // h)
                for i in range(h)]
        # torch cat along dim 2 of (B, C/h, 1, N) blocks then reshape:
        # output channel g*h + i comes from head i, group g
        s_out = jnp.stack(outs, axis=2).reshape(B, C, N)
        s_out = ops.conv1d(s_out, p["proj0"], groups=self.split_groups)
        s_out = ops.group_norm1(s_out, p["norm"], eps=1e-8)
        s_out = ops.prelu(s_out, p["act"])
        s_out = ops.conv1d(s_out, p["proj1"])
        gated = jnp.transpose(s_out, (0, 2, 1)) * v  # (B, N, C)
        out = _linear(gated, p["proj"])
        if training and rng is not None:
            out = ops.dropout(out, rng, self.proj_drop, training)
        return jnp.transpose(out, (0, 2, 1))


class SAMLA:
    """LA-style fusion carrying SAM's per-head convs (TDANet.py:437-479).
    Reference quirks: the conv stack output is discarded, and the
    local embedding is re-flattened from its permuted (h, B, N/h, T)
    view, scrambling heads and batch (TDANet.py:462,471)."""

    def __init__(self, dim, inp, oup, kernel=1, ca_num_heads=4):
        groups = inp if inp == oup else 1
        self.local_embedding = ConvNorm(inp, oup, kernel, groups=groups,
                                        bias=False, norm="gn")
        self.global_embedding = ConvNorm(inp, oup, kernel, groups=groups,
                                         bias=False, norm="gn")
        self.global_act = ConvNorm(inp, oup, kernel, groups=groups,
                                   bias=False, norm="gn")
        self.dim, self.heads = dim, ca_num_heads

    def init(self, key):
        ks = jax.random.split(key, 3 + self.heads)
        d, h = self.dim, self.heads
        p = {"local_embedding": self.local_embedding.init(ks[0]),
             "global_embedding": self.global_embedding.init(ks[1]),
             "global_act": self.global_act.init(ks[2])}
        for i in range(h):
            p[f"local_conv_{i + 1}"] = ops.conv1d_init(
                ks[3 + i], d // h, d // h, 3 + 2 * i, groups=d // h)
        return p

    def apply(self, p, x_l, x_g):
        B, N, T = x_l.shape
        h = self.heads
        local_feat = self.local_embedding.apply(p["local_embedding"], x_l)
        # (conv stack intentionally not computed: its result is unused
        # in the reference forward, TDANet.py:463-471)
        # reference quirk #2: the re-flatten happens on the PERMUTED
        # (h, B, N/h, T) view, so heads and batch get scrambled together
        # (TDANet.py:462,471: permute(1,0,2,3) then reshape(B, N, T))
        local_feat = local_feat.reshape(B, h, N // h, T) \
            .transpose(1, 0, 2, 3).reshape(B, N, T)
        sig_act = ops.interpolate_nearest(jax.nn.sigmoid(
            self.global_act.apply(p["global_act"], x_g)), T)
        global_feat = ops.interpolate_nearest(
            self.global_embedding.apply(p["global_embedding"], x_g), T)
        return local_feat * sig_act + global_feat


class AdaLN:
    """Simplified adaptive layer norm (TDANet.py:481-502): Linear over
    the conditioning length -> GlobLN -> split into (gamma, beta);
    out = x_l * sigmoid(gamma) + beta."""

    def __init__(self, feat_l, feat_g, c_out):
        self.feat_l, self.feat_g, self.c_out = feat_l, feat_g, c_out

    def init(self, key):
        return {"adaLN_modulation": {
            "0": _linear_init(key, self.feat_g, 2 * self.feat_l),
            "1": {"weight": jnp.ones((self.c_out,)),
                  "bias": jnp.zeros((self.c_out,))}}}

    def apply(self, p, x_l, x_g):
        m = _linear(x_g, p["adaLN_modulation"]["0"])   # (B, C, 2*feat_l)
        m = ops.group_norm1(m, p["adaLN_modulation"]["1"], eps=1e-8)
        gamma, beta = jnp.split(m, 2, axis=-1)
        return x_l * jax.nn.sigmoid(gamma) + beta


class UConvBlockV1:
    """SE-enhanced U-block (TDANet.py:638-753): each pyramid scale runs
    through an SEBasicBlock1D before the avg-pool global branch; fusion
    is inject-sum; expansion keeps the x_fused[i-1] first-pair quirk."""

    def __init__(self, out_channels=128, in_channels=512,
                 upsampling_depth=4, feat_len=None):
        self.depth = upsampling_depth
        self.in_channels, self.out_channels = in_channels, out_channels
        self.proj_1x1 = ConvNormAct(out_channels, in_channels, 1, norm="gn")
        self.spp_dw = [DilatedConvNorm(in_channels, in_channels, 5, 1,
                                       groups=in_channels, norm="gn")]
        for _ in range(1, upsampling_depth):
            self.spp_dw.append(DilatedConvNorm(
                in_channels, in_channels, 5, stride=2, groups=in_channels,
                norm="gn"))
        self.globalatt = GA(in_channels, drop_path=0.1, norm="gn")
        self.last_layer = [LA(in_channels, in_channels, 5, norm="gn")
                           for _ in range(upsampling_depth - 1)]
        self.se_block = [SEBasicBlock1D(in_channels, in_channels)
                         for _ in range(upsampling_depth)]

    def init(self, key):
        ks = jax.random.split(key, 4 + 3 * self.depth)
        return {
            "proj_1x1": self.proj_1x1.init(ks[0]),
            "spp_dw": {str(i): m.init(ks[1 + i])
                       for i, m in enumerate(self.spp_dw)},
            "globalatt": self.globalatt.init(ks[1 + self.depth]),
            "last_layer": {str(i): m.init(ks[2 + self.depth + i])
                           for i, m in enumerate(self.last_layer)},
            "se_block": {str(i): m.init(ks[1 + 2 * self.depth + i])
                         for i, m in enumerate(self.se_block)},
            "res_conv": ops.conv1d_init(ks[-1], self.in_channels,
                                        self.out_channels, 1)}

    def apply(self, p, x, *, training=False, rng=None):
        residual = x
        output1 = self.proj_1x1.apply(p["proj_1x1"], x)
        output = [self.spp_dw[0].apply(p["spp_dw"]["0"], output1)]
        for k in range(1, self.depth):
            output.append(self.spp_dw[k].apply(p["spp_dw"][str(k)],
                                               output[-1]))
        coarsest = output[-1].shape[-1]
        global_f = None
        for i, fea in enumerate(output):
            fea = self.se_block[i].apply(p["se_block"][str(i)], fea)
            pooled = ops.adaptive_avg_pool1d(fea, coarsest)
            global_f = pooled if global_f is None else global_f + pooled
        global_f = self.globalatt.apply(p["globalatt"], global_f,
                                        training=training, rng=rng)
        x_fused = [ops.interpolate_nearest(global_f, o.shape[-1]) + o
                   for o in output]
        expanded = None
        for i in range(self.depth - 2, -1, -1):
            other = x_fused[i - 1] if i == self.depth - 2 else expanded
            expanded = self.last_layer[i].apply(p["last_layer"][str(i)],
                                                x_fused[i], other)
        return ops.conv1d(expanded, p["res_conv"]) + residual


class YangConvEncoder:
    """TDANet_yang.py's unused multi-kernel front end (:309-328): three
    parallel Conv1d banks of kernel k*base_ks, stride base_ks//2, each
    emitting base_ks//2+1 channels, channel-concatenated. Distinct from
    the MultRes encoder (stride base_ks//4, out_channels param)."""

    def __init__(self, enc_kernel_size, sample_rate, kernels=3, bias=False):
        self.base_ks = enc_kernel_size * sample_rate // 1000
        self.kernels = kernels
        self.bias = bias

    def init(self, key):
        ks = jax.random.split(key, self.kernels)
        return {"conv_list": {
            str(k - 1): ops.conv1d_init(
                ks[k - 1], 1, self.base_ks // 2 + 1, k * self.base_ks,
                bias=self.bias)
            for k in range(1, self.kernels + 1)}}

    def apply(self, p, x):
        embs = [ops.conv1d(x, p["conv_list"][str(k - 1)],
                           stride=self.base_ks // 2,
                           padding=(k * self.base_ks) // 2)
                for k in range(1, self.kernels + 1)]
        return jnp.concatenate(embs, axis=1)
