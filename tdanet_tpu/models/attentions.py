"""Standalone attention zoo + SE blocks (reference:
look2hear/models/attentions.py, SeBlock.py)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from tdanet_tpu import ops
from tdanet_tpu.models.components import MultiHeadAttentionModule

# The zoo's MultiHeadAttention / MHAConv are the same quirky sublayer used
# by TDANetBest (attentions.py:41-57,177-194)
MultiHeadAttention = MultiHeadAttentionModule
MHAConv = MultiHeadAttentionModule


def _linear_init(key, in_f, out_f, bias=False):
    bound = 1.0 / math.sqrt(in_f)
    p = {"weight": jax.random.uniform(key, (out_f, in_f), jnp.float32,
                                      -bound, bound)}
    if bias:
        p["bias"] = jnp.zeros((out_f,))
    return p


def _linear(x, p):
    y = x @ p["weight"].astype(x.dtype).T
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


class LinearAttention:
    """LDM-style linear attention with depthwise qkv convs
    (attentions.py:58-83): k softmaxed over length, context = k v^T."""

    def __init__(self, in_chans, heads=4, bias=True):
        self.in_chans, self.heads, self.bias = in_chans, heads, bias

    def init(self, key):
        ks = jax.random.split(key, 4)
        C = self.in_chans
        return {
            "attn_in_norm": ops.layer_norm_init(C),
            "to_qkv": {"0": ops.conv1d_init(ks[0], C, C, 1, groups=C,
                                            bias=self.bias),
                       "1": ops.conv1d_init(ks[1], C, C * 3, 1,
                                            bias=self.bias)},
            "norm": ops.layer_norm_init(C),
            "to_out": ops.conv1d_init(ks[2], C, C, 1, groups=C,
                                      bias=self.bias),
        }

    def apply(self, p, x):
        B, C, L = x.shape
        h = self.heads
        d = C // h
        # Reference quirk (attentions.py:77): LayerNorm(C) and pe[:, :C]
        # are applied to the UN-transposed (B, C, L) tensor, so the module
        # is only well-formed when L == C; reproduced as-is.
        xn = ops.layer_norm(x, p["attn_in_norm"])
        pe = ops.sinusoidal_pe(C, self.in_chans, x.dtype)
        x_in = xn + pe[None]
        qkv = ops.conv1d(ops.conv1d(x_in, p["to_qkv"]["0"], groups=C),
                         p["to_qkv"]["1"])
        qkv = qkv.reshape(B, 3, h, d, L)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]     # (B, h, d, L)
        k = jax.nn.softmax(k, axis=-1)
        context = jnp.einsum("bhdn,bhen->bhde", k, v)
        out = jnp.einsum("bhde,bhdn->bhen", context, q)
        out = out.reshape(B, C, L)
        return ops.conv1d(out, p["to_out"], groups=C)


class CrossAttention:
    """Generic QKV attention over (B, N, C) tokens (attentions.py:85-127)."""

    def __init__(self, query_dim, context_dim=None, heads=8, dim_head=64,
                 dropout=0.0):
        self.query_dim = query_dim
        self.context_dim = context_dim or query_dim
        self.heads, self.dim_head = heads, dim_head
        self.inner = heads * dim_head
        self.scale = dim_head ** -0.5
        self.dropout = dropout

    def init(self, key):
        ks = jax.random.split(key, 4)
        return {"to_q": _linear_init(ks[0], self.query_dim, self.inner),
                "to_k": _linear_init(ks[1], self.context_dim, self.inner),
                "to_v": _linear_init(ks[2], self.context_dim, self.inner),
                "to_out": {"0": _linear_init(ks[3], self.inner,
                                             self.query_dim, bias=True)}}

    def apply(self, p, x, context=None, mask=None):
        h, d = self.heads, self.dim_head
        context = x if context is None else context
        B, N, _ = x.shape
        S = context.shape[1]
        q = _linear(x, p["to_q"]).reshape(B, N, h, d).transpose(0, 2, 1, 3)
        k = _linear(context, p["to_k"]).reshape(B, S, h, d) \
            .transpose(0, 2, 1, 3)
        v = _linear(context, p["to_v"]).reshape(B, S, h, d) \
            .transpose(0, 2, 1, 3)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                         preferred_element_type=ops.acc_dtype(x.dtype)) * self.scale
        if mask is not None:
            big_neg = jnp.finfo(sim.dtype).min
            sim = jnp.where(mask[:, None, None, :], sim, big_neg)
        attn = jax.nn.softmax(sim, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v,
                         preferred_element_type=ops.acc_dtype(x.dtype)).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, h * d)
        return _linear(out, p["to_out"]["0"])


class CrossAttentionConv(CrossAttention):
    """Lightweight variant with conv q/k projections
    (attentions.py:129-174). Operates on (B, N, C) tokens like the
    reference (convs applied over the transposed layout)."""

    def __init__(self, query_dim, context_dim=None, heads=8, dim_head=32,
                 dropout=0.0):
        super().__init__(query_dim, context_dim, heads, dim_head, dropout)

    def init(self, key):
        ks = jax.random.split(key, 4)
        return {"to_q": ops.conv1d_init(ks[0], self.query_dim, self.inner,
                                        1, bias=False),
                "to_k": ops.conv1d_init(ks[1], self.context_dim, self.inner,
                                        1, bias=False),
                "to_v": _linear_init(ks[2], self.context_dim, self.inner),
                "to_out": {"0": ops.conv1d_init(ks[3], self.inner,
                                                self.query_dim, 1)}}

    def apply(self, p, x, context=None, mask=None):
        h, d = self.heads, self.dim_head
        context = x if context is None else context
        B, N, _ = x.shape
        S = context.shape[1]
        q = ops.conv1d(x.transpose(0, 2, 1), p["to_q"]).transpose(0, 2, 1)
        k = ops.conv1d(context.transpose(0, 2, 1),
                       p["to_k"]).transpose(0, 2, 1)
        v = _linear(context, p["to_v"])
        q = q.reshape(B, N, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, h, d).transpose(0, 2, 1, 3)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                         preferred_element_type=ops.acc_dtype(x.dtype)) * self.scale
        if mask is not None:
            big_neg = jnp.finfo(sim.dtype).min
            sim = jnp.where(mask[:, None, None, :], sim, big_neg)
        attn = jax.nn.softmax(sim, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v,
                         preferred_element_type=ops.acc_dtype(x.dtype)).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, h * d)
        out = ops.conv1d(out.transpose(0, 2, 1), p["to_out"]["0"])
        return out.transpose(0, 2, 1)


class SELayer1D:
    """1-D squeeze-excitation (SeBlock.py:6-24)."""

    def __init__(self, channel, reduction=16):
        self.channel, self.reduction = channel, reduction

    def init(self, key):
        k1, k2 = jax.random.split(key)
        c, r = self.channel, self.channel // self.reduction
        return {"fc": {"0": _linear_init(k1, c, r),
                       "2": _linear_init(k2, r, c)}}

    def apply(self, p, x):
        B, C, _ = x.shape
        y = jnp.mean(x, axis=-1)
        y = jax.nn.relu(_linear(y, p["fc"]["0"]))
        y = jax.nn.sigmoid(_linear(y, p["fc"]["2"]))
        return x * y[:, :, None]


class SEBasicBlock1D:
    """Depthwise-conv SE residual block with BatchNorm (SeBlock.py:26-58).
    BatchNorm uses stored running stats (inference semantics)."""

    expansion = 1

    def __init__(self, inplanes, planes, stride=1, reduction=16):
        self.inplanes, self.planes, self.stride = inplanes, planes, stride
        self.se = SELayer1D(planes, reduction)

    def init(self, key):
        ks = jax.random.split(key, 3)
        def bn(c):
            return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                    "running_mean": jnp.zeros((c,)),
                    "running_var": jnp.ones((c,)),
                    "num_batches_tracked": jnp.zeros((), jnp.int64)}
        return {"conv1": ops.conv1d_init(ks[0], self.inplanes, self.planes,
                                         3, groups=self.inplanes,
                                         bias=False),
                "bn1": bn(self.planes),
                "conv2": ops.conv1d_init(ks[1], self.planes, self.planes, 3,
                                         groups=self.inplanes, bias=False),
                "bn2": bn(self.planes),
                "se": self.se.init(ks[2])}

    @staticmethod
    def _bn(x, p, eps=1e-5):
        mean = p["running_mean"].astype(x.dtype)[None, :, None]
        var = p["running_var"].astype(x.dtype)[None, :, None]
        w = p["weight"].astype(x.dtype)[None, :, None]
        b = p["bias"].astype(x.dtype)[None, :, None]
        return (x - mean) / jnp.sqrt(var + eps) * w + b

    def apply(self, p, x):
        residual = x
        out = ops.conv1d(x, p["conv1"], stride=self.stride, padding=1,
                         groups=self.inplanes)
        out = jax.nn.relu(self._bn(out, p["bn1"]))
        out = ops.conv1d(out, p["conv2"], padding=1, groups=self.inplanes)
        out = self._bn(out, p["bn2"])
        out = self.se.apply(p["se"], out)
        return jax.nn.relu(out + residual)
