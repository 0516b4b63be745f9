"""Shared TDANet building blocks (functional, torch-state-dict-compatible).

Each component is a tiny config object with ``init(key) -> params`` and
``apply(params, x, ...)``; the params nesting mirrors the reference torch
module tree (TDANet_best.py) so checkpoints map structurally.

Norm flavors: ``"gln"`` = the manual GlobLN with gamma/beta params
(TDANet_best.py:33-64); ``"gn"`` = nn.GroupNorm(1, C, eps=1e-8) with
weight/bias params (TDANet.py:59-60). The statistics are identical; only
parameter names differ.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tdanet_tpu import ops


def _norm_init(channels, norm):
    if norm == "gln":
        return ops.glob_ln_init(channels)
    if norm == "gn":
        return ops.layer_norm_init(channels)  # weight/bias keys
    raise ValueError(norm)


def _norm_apply(params, x, norm):
    if norm == "gln":
        return ops.glob_ln(x, params)
    if norm == "gn":
        return ops.group_norm1(x, params)
    raise ValueError(norm)


class ConvNorm:
    """Conv1d + global norm (TDANet_best.py:94-115)."""

    def __init__(self, n_in, n_out, kernel, stride=1, groups=1, bias=True,
                 norm="gln"):
        self.n_in, self.n_out, self.kernel = n_in, n_out, kernel
        self.stride, self.groups, self.bias = stride, groups, bias
        self.norm = norm
        self.padding = (kernel - 1) // 2

    def init(self, key):
        return {"conv": ops.conv1d_init(key, self.n_in, self.n_out,
                                        self.kernel, self.groups, self.bias),
                "norm": _norm_init(self.n_out, self.norm)}

    def apply(self, p, x):
        y = ops.conv1d(x, p["conv"], stride=self.stride,
                       padding=self.padding, groups=self.groups)
        return _norm_apply(p["norm"], y, self.norm)


class ConvNormAct:
    """Conv1d + global norm + PReLU (TDANet_best.py:67-91)."""

    def __init__(self, n_in, n_out, kernel, stride=1, groups=1, norm="gln"):
        self.inner = ConvNorm(n_in, n_out, kernel, stride, groups, True, norm)

    def init(self, key):
        p = self.inner.init(key)
        p["act"] = ops.prelu_init()
        return p

    def apply(self, p, x):
        return ops.prelu(self.inner.apply(p, x), p["act"])


class NormAct:
    """Norm + PReLU (TDANet_best.py:118-134)."""

    def __init__(self, channels, norm="gln"):
        self.channels, self.norm = channels, norm

    def init(self, key):
        return {"norm": _norm_init(self.channels, self.norm),
                "act": ops.prelu_init()}

    def apply(self, p, x):
        return ops.prelu(_norm_apply(p["norm"], x, self.norm), p["act"])


class DilatedConvNorm:
    """Depthwise (dilated) conv + norm (TDANet_best.py:165-192)."""

    def __init__(self, n_in, n_out, kernel, stride=1, dilation=1, groups=1,
                 norm="gln"):
        self.n_in, self.n_out, self.kernel = n_in, n_out, kernel
        self.stride, self.dilation, self.groups = stride, dilation, groups
        self.norm = norm
        self.padding = ((kernel - 1) // 2) * dilation

    def init(self, key):
        return {"conv": ops.conv1d_init(key, self.n_in, self.n_out,
                                        self.kernel, self.groups, True),
                "norm": _norm_init(self.n_out, self.norm)}

    def apply(self, p, x):
        y = ops.conv1d(x, p["conv"], stride=self.stride,
                       padding=self.padding, dilation=self.dilation,
                       groups=self.groups)
        return _norm_apply(p["norm"], y, self.norm)


class DilatedSeparableConvNorm:
    """Depthwise + pointwise conv + norm (TDANet.py "conv-pool" branch,
    DilatedSeparableConvNorm)."""

    def __init__(self, n_in, n_out, kernel, stride=1, dilation=1, groups=1,
                 norm="gn"):
        self.n_in, self.n_out, self.kernel = n_in, n_out, kernel
        self.stride, self.dilation, self.groups = stride, dilation, groups
        self.norm = norm
        self.padding = ((kernel - 1) // 2) * dilation

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"dw_conv": ops.conv1d_init(k1, self.n_in, self.n_out,
                                           self.kernel, self.groups, True),
                "pw_conv": ops.conv1d_init(k2, self.n_in, self.n_out, 1,
                                           1, True),
                "norm": _norm_init(self.n_out, self.norm)}

    def apply(self, p, x):
        y = ops.conv1d(x, p["dw_conv"], stride=self.stride,
                       padding=self.padding, dilation=self.dilation,
                       groups=self.groups)
        y = ops.conv1d(y, p["pw_conv"])
        return _norm_apply(p["norm"], y, self.norm)


class FFN:
    """1x1 ConvNorm -> depthwise k=5 conv -> ReLU -> 1x1 ConvNorm with
    dropout (TDANet_best.py:195-213)."""

    def __init__(self, in_features, hidden, drop=0.1, norm="gln"):
        self.fc1 = ConvNorm(in_features, hidden, 1, bias=False, norm=norm)
        self.fc2 = ConvNorm(hidden, in_features, 1, bias=False, norm=norm)
        self.hidden = hidden
        self.drop = drop

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"fc1": self.fc1.init(k1),
                "dwconv": ops.conv1d_init(k2, self.hidden, self.hidden, 5,
                                          groups=self.hidden, bias=True),
                "fc2": self.fc2.init(k3)}

    def apply(self, p, x, *, training=False, rng=None):
        x = self.fc1.apply(p["fc1"], x)
        x = ops.conv1d(x, p["dwconv"], padding=2, groups=self.hidden)
        x = jax.nn.relu(x)
        if training and self.drop > 0:
            x = ops.dropout(x, jax.random.fold_in(rng, 0), self.drop, True)
        x = self.fc2.apply(p["fc2"], x)
        if training and self.drop > 0:
            x = ops.dropout(x, jax.random.fold_in(rng, 1), self.drop, True)
        return x


class MultiHeadAttentionModule:
    """The reference's transformer sublayer with its checkpoint-defining
    quirks (TDANet_best.py:236-252):

    - input (B, C, T) is transposed to (B, T, C) but the inner attention
      runs with batch_first=False semantics, i.e. it attends over the
      BATCH axis with T acting as the batch — reproduced exactly when
      ``fixed=False`` (the released checkpoints were trained through this);
    - the residual is ``output + dropout(output)`` (the attention output
      added to itself) rather than ``x + dropout(output)``.

    Flavor matrix across the reference family:
    - TDANet_best MultiHeadAttention: batch_first=False + self-residual;
    - TDANetOld MultiHeadAttention (TDANetOld.py:219-236):
      batch_first=True + self-residual;
    - MultiHeadAttentionFixed (TDANet_yang.py:249-266):
      batch_first=True + true residual.
    ``fixed=True`` is shorthand for the last flavor.
    """

    def __init__(self, channels, n_head=8, dropout=0.1, fixed=False,
                 batch_first=None, self_residual=None):
        self.channels, self.n_head, self.dropout = channels, n_head, dropout
        self.batch_first = fixed if batch_first is None else batch_first
        self.self_residual = (not fixed) if self_residual is None \
            else self_residual

    def init(self, key):
        return {"attn_in_norm": ops.layer_norm_init(self.channels),
                "attn": ops.mha_init(key, self.channels),
                "norm": ops.layer_norm_init(self.channels)}

    def apply(self, p, x, *, training=False, rng=None):
        B, C, T = x.shape
        xt = x.transpose(0, 2, 1)                       # (B, T, C)
        out = ops.layer_norm(xt, p["attn_in_norm"])
        tbl = p.get("pos_enc")
        if isinstance(tbl, dict) and "pe" in tbl:
            # checkpoint-provided buffer (reference path <ga>.pos_enc.pe,
            # TDANet_best.py:229): honor it exactly when the bridge kept it
            pe = tbl["pe"][0, :T].astype(out.dtype)[None]
        else:
            pe = ops.sinusoidal_pe(T, C, out.dtype)[None]
        out = out + pe
        drop = self.dropout if training else 0.0
        akey = jax.random.fold_in(rng, 10) if rng is not None else None
        if not self.batch_first and B == 1 and not training:
            # batch-axis attention over a single element is algebraically
            # softmax([[0]]) == 1, so attn_out = out_proj(v_proj(x)):
            # skip q/k projections and the softmax entirely (exact).
            a = p["attn"]
            E = C
            wv = a["in_proj_weight"].astype(out.dtype)[2 * E:]
            bv = a["in_proj_bias"].astype(out.dtype)[2 * E:]
            v = out @ wv.T + bv
            op = a["out_proj"]
            attn_out = v @ op["weight"].astype(out.dtype).T \
                + op["bias"].astype(out.dtype)
        elif self.batch_first:
            # standard attention over T
            o = ops.multi_head_attention(
                out.transpose(1, 0, 2), out.transpose(1, 0, 2),
                out.transpose(1, 0, 2), p["attn"], self.n_head,
                dropout_rate=drop, key=akey, training=training)
            attn_out = o.transpose(1, 0, 2)
        else:
            # quirk: (B, T, C) fed as (L=B, N=T, E=C)
            attn_out = ops.multi_head_attention(
                out, out, out, p["attn"], self.n_head,
                dropout_rate=drop, key=akey, training=training)
        base = attn_out if self.self_residual else out
        res = base + _maybe_dropout(attn_out, rng, self.dropout, training)
        res = ops.layer_norm(res, p["norm"])
        return res.transpose(0, 2, 1)


def _maybe_dropout(x, rng, rate, training):
    if training and rate > 0:
        return ops.dropout(x, jax.random.fold_in(rng, 11), rate, True)
    return x


class GA:
    """Global attention: MHA + FFN with DropPath residuals
    (TDANet_best.py:254-264)."""

    def __init__(self, out_chan, drop_path=0.1, attn_dropout=0.1,
                 fixed_mha=False, ffn_drop=0.1, norm="gln",
                 mha_kwargs=None, use_attn=True):
        self.use_attn = use_attn  # False: MLP-only (TDANet_ULayer_num.py:250-260)
        if use_attn:
            self.attn = MultiHeadAttentionModule(out_chan, 8, attn_dropout,
                                                 fixed=fixed_mha,
                                                 **(mha_kwargs or {}))
        self.mlp = FFN(out_chan, out_chan * 2, drop=ffn_drop, norm=norm)
        self.drop_path = drop_path

    def init(self, key):
        k1, k2 = jax.random.split(key)
        p = {"mlp": self.mlp.init(k2)}
        if self.use_attn:
            p["attn"] = self.attn.init(k1)
        return p

    def apply(self, p, x, *, training=False, rng=None):
        if self.use_attn:
            a = self.attn.apply(p["attn"], x, training=training,
                                rng=_fold(rng, 1))
            x = x + _dp(a, self.drop_path, training, _fold(rng, 2))
        m = self.mlp.apply(p["mlp"], x, training=training, rng=_fold(rng, 3))
        x = x + _dp(m, self.drop_path, training, _fold(rng, 4))
        return x


def _fold(rng, i):
    return jax.random.fold_in(rng, i) if rng is not None else None


def _dp(x, prob, training, rng):
    if training and prob > 0:
        return ops.drop_path(x, rng, prob, True)
    return x


class LA:
    """Local/global injection fusion (TDANet_best.py:266-292):
    out = local_emb(x_l) * sigmoid(interp(global_act(x_g)))
          + interp(global_emb(x_g)).
    All three embeddings are depthwise when inp == oup."""

    def __init__(self, inp, oup, kernel=1, norm="gln"):
        groups = inp if inp == oup else 1
        self.local_embedding = ConvNorm(inp, oup, kernel, groups=groups,
                                        bias=False, norm=norm)
        self.global_embedding = ConvNorm(inp, oup, kernel, groups=groups,
                                         bias=False, norm=norm)
        self.global_act = ConvNorm(inp, oup, kernel, groups=groups,
                                   bias=False, norm=norm)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"local_embedding": self.local_embedding.init(k1),
                "global_embedding": self.global_embedding.init(k2),
                "global_act": self.global_act.init(k3)}

    def apply(self, p, x_l, x_g):
        T = x_l.shape[-1]
        Tg = x_g.shape[-1]
        local_feat = self.local_embedding.apply(p["local_embedding"], x_l)
        sig_act = jax.nn.sigmoid(self.global_act.apply(p["global_act"], x_g))
        global_feat = self.global_embedding.apply(p["global_embedding"], x_g)
        if T == 2 * Tg:
            # exact x2 nearest upsample (out[i] = in[i//2]) folded into the
            # fuse: reshape the fine tensor to (.., Tg, 2) and broadcast the
            # coarse factors — avoids materializing two repeated
            # (B, C, T) tensors (profiled 0.18 ms/block as broadcasts).
            B, C = local_feat.shape[:2]
            lf = local_feat.reshape(B, C, Tg, 2)
            out = lf * sig_act[..., None] + global_feat[..., None]
            return out.reshape(B, C, T)
        sig_act = ops.interpolate_nearest(sig_act, T)
        global_feat = ops.interpolate_nearest(global_feat, T)
        return local_feat * sig_act + global_feat


class UConvBlock:
    """Multi-scale U-shaped block (TDANet_best.py:295-380):
    1x1 proj -> depthwise strided pyramid -> pooled sum -> GA -> per-scale
    LA fusion -> top-down LA expansion (first step pairs scales
    [depth-2] and [depth-3], reproduced exactly) -> 1x1 residual."""

    def __init__(self, out_channels=128, in_channels=512, upsampling_depth=4,
                 fixed_mha=False, drop_path=0.1, norm="gln"):
        self.depth = upsampling_depth
        self.in_channels = in_channels
        self.proj_1x1 = ConvNormAct(out_channels, in_channels, 1, norm=norm)
        self.spp_dw = [DilatedConvNorm(in_channels, in_channels, 5, 1,
                                       groups=in_channels, norm=norm)]
        for _ in range(1, upsampling_depth):
            self.spp_dw.append(DilatedConvNorm(in_channels, in_channels, 5,
                                               stride=2, groups=in_channels,
                                               norm=norm))
        self.loc_glo_fus = [LA(in_channels, in_channels, norm=norm)
                            for _ in range(upsampling_depth)]
        self.globalatt = GA(in_channels, drop_path=drop_path,
                            fixed_mha=fixed_mha, norm=norm)
        self.last_layer = [LA(in_channels, in_channels, 5, norm=norm)
                           for _ in range(upsampling_depth - 1)]
        self.out_channels = out_channels

    def init(self, key):
        keys = jax.random.split(key, 4 + 3 * self.depth)
        p = {"proj_1x1": self.proj_1x1.init(keys[0]),
             "spp_dw": {str(i): m.init(keys[1 + i])
                        for i, m in enumerate(self.spp_dw)},
             "loc_glo_fus": {str(i): m.init(keys[1 + self.depth + i])
                             for i, m in enumerate(self.loc_glo_fus)},
             "globalatt": self.globalatt.init(keys[1 + 2 * self.depth]),
             "last_layer": {str(i): m.init(keys[2 + 2 * self.depth + i])
                            for i, m in enumerate(self.last_layer)},
             "res_conv": ops.conv1d_init(keys[-1], self.in_channels,
                                         self.out_channels, 1)}
        return p

    def apply(self, p, x, *, training=False, rng=None):
        from jax.ad_checkpoint import checkpoint_name
        residual = x
        output1 = self.proj_1x1.apply(p["proj_1x1"], x)
        output = [self.spp_dw[0].apply(p["spp_dw"]["0"], output1)]
        for k in range(1, self.depth):
            output.append(self.spp_dw[k].apply(p["spp_dw"][str(k)],
                                               output[-1]))
        # remat landmarks (no-ops unless Recurrent(remat="scales"));
        # store_activation: 8-bit storage experiment hooks (no-ops
        # unless ops.act_storage is active — see ops/basic.py)
        output = [checkpoint_name(ops.store_activation(o), "pyr_scale")
                  for o in output]

        coarsest = output[-1].shape[-1]
        global_f = output[-1]  # already at coarsest; pool is identity
        for fea in output[:-1]:
            global_f = global_f + ops.adaptive_avg_pool1d(fea, coarsest)
        global_f = self.globalatt.apply(p["globalatt"], global_f,
                                        training=training, rng=rng)
        global_f = checkpoint_name(ops.store_activation(global_f), "ga_out")

        x_fused = [self.loc_glo_fus[i].apply(p["loc_glo_fus"][str(i)],
                                             output[i], global_f)
                   for i in range(self.depth)]
        x_fused = [checkpoint_name(ops.store_activation(f), "fused_scale")
                   for f in x_fused]

        expanded = None
        for i in range(self.depth - 2, -1, -1):
            if i == self.depth - 2:
                # reference quirk: global input is the *finer* scale i-1
                expanded = self.last_layer[i].apply(
                    p["last_layer"][str(i)], x_fused[i], x_fused[i - 1])
            else:
                expanded = self.last_layer[i].apply(
                    p["last_layer"][str(i)], x_fused[i], expanded)

        return ops.conv1d(expanded, p["res_conv"]) + residual


class UConvBlockInject:
    """Paper-topology U-block (TDANet_yang.py:330-418, TDANet_origin.py):
    like UConvBlock but without per-scale LA fusion — the global feature is
    nearest-upsampled and ADDED to each scale (inject-sum). ``pool="conv"``
    swaps the adaptive-avg-pool global branch for strided separable convs
    applied in reverse scale order (TDANet.py:528-617, including the
    conv_pool[depth-1-k] indexing). ``down_stride`` generalizes the
    downsampling stride (16 in TDANet_ULayer_num.py:312-321)."""

    def __init__(self, out_channels=128, in_channels=512, upsampling_depth=4,
                 norm="gn", pool="avg", down_stride=2, fixed_mha=False,
                 drop_path=0.1, attn_dropout=0.1, ffn_drop=0.1,
                 inject="add", expand_pair="prev", mha_kwargs=None,
                 ga_use_attn=True):
        self.depth = upsampling_depth
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.pool = pool
        self.inject = inject            # "add" | "gate" (TDANetOld.py:350)
        self.expand_pair = expand_pair  # "prev"=x_fused[i-1] | "next"=[i+1]
        self.proj_1x1 = ConvNormAct(out_channels, in_channels, 1, norm=norm)
        self.spp_dw = [DilatedConvNorm(in_channels, in_channels, 5, 1,
                                       groups=in_channels, norm=norm)]
        for _ in range(1, upsampling_depth):
            self.spp_dw.append(DilatedConvNorm(
                in_channels, in_channels, 2 * down_stride + 1,
                stride=down_stride, groups=in_channels, norm=norm))
        if pool == "conv":
            self.conv_pool = [DilatedSeparableConvNorm(
                in_channels, in_channels, 5, 1, groups=in_channels,
                norm=norm)]
            for i in range(1, upsampling_depth):
                cs = 2 ** i
                self.conv_pool.append(DilatedSeparableConvNorm(
                    in_channels, in_channels, 2 * cs + 1, stride=cs,
                    groups=in_channels, norm=norm))
        self.globalatt = GA(in_channels, drop_path=drop_path,
                            attn_dropout=attn_dropout, fixed_mha=fixed_mha,
                            ffn_drop=ffn_drop, norm=norm,
                            mha_kwargs=mha_kwargs, use_attn=ga_use_attn)
        self.last_layer = [LA(in_channels, in_channels, 5, norm=norm)
                           for _ in range(upsampling_depth - 1)]

    def init(self, key):
        keys = jax.random.split(key, 4 + 2 * self.depth)
        p = {"proj_1x1": self.proj_1x1.init(keys[0]),
             "spp_dw": {str(i): m.init(keys[1 + i])
                        for i, m in enumerate(self.spp_dw)},
             "globalatt": self.globalatt.init(keys[1 + self.depth]),
             "last_layer": {str(i): m.init(keys[2 + self.depth + i])
                            for i, m in enumerate(self.last_layer)},
             "res_conv": ops.conv1d_init(keys[-1], self.in_channels,
                                         self.out_channels, 1)}
        if self.pool == "conv":
            ck = jax.random.split(keys[-2], self.depth)
            p["conv_pool"] = {str(i): m.init(ck[i])
                              for i, m in enumerate(self.conv_pool)}
        return p

    def apply(self, p, x, *, training=False, rng=None):
        from jax.ad_checkpoint import checkpoint_name
        residual = x
        output1 = self.proj_1x1.apply(p["proj_1x1"], x)
        output = [self.spp_dw[0].apply(p["spp_dw"]["0"], output1)]
        for k in range(1, self.depth):
            output.append(self.spp_dw[k].apply(p["spp_dw"][str(k)],
                                               output[-1]))
        output = [checkpoint_name(o, "pyr_scale") for o in output]
        if self.pool == "conv":
            # conv_pool applied in REVERSED index order (TDANet.py:604-608)
            pooled = [self.conv_pool[self.depth - k - 1].apply(
                p["conv_pool"][str(self.depth - k - 1)], fea)
                for k, fea in enumerate(output)]
        else:
            coarsest = output[-1].shape[-1]
            pooled = [ops.adaptive_avg_pool1d(fea, coarsest)
                      for fea in output]
        global_f = pooled[0]
        for fea in pooled[1:]:
            global_f = global_f + fea
        global_f = self.globalatt.apply(p["globalatt"], global_f,
                                        training=training, rng=rng)
        global_f = checkpoint_name(global_f, "ga_out")

        if self.inject == "gate":
            x_fused = [jax.nn.sigmoid(
                ops.interpolate_nearest(global_f, o.shape[-1])) * o
                for o in output]
        else:
            x_fused = [ops.interpolate_nearest(global_f, o.shape[-1]) + o
                       for o in output]
        x_fused = [checkpoint_name(f, "fused_scale") for f in x_fused]
        first_pair = (self.depth - 3 if self.expand_pair == "prev"
                      else self.depth - 1)
        expanded = None
        for i in range(self.depth - 2, -1, -1):
            g = x_fused[first_pair] if i == self.depth - 2 else expanded
            expanded = self.last_layer[i].apply(p["last_layer"][str(i)],
                                                x_fused[i], g)
        return ops.conv1d(expanded, p["res_conv"]) + residual


class Recurrent:
    """Shared-weight iterative separator (TDANet_best.py:383-399): one
    UConvBlock applied ``_iter`` times; from iteration 1 the input is
    concat_block(mixture + x). Implemented with lax.scan over the shared
    block so the program stays O(1) in iterations; optionally rematerialized
    for training memory."""

    def __init__(self, out_channels=128, in_channels=512, upsampling_depth=4,
                 _iter=4, fixed_mha=False, drop_path=0.1, norm="gln",
                 remat=False, block=None):
        self.unet = block if block is not None else UConvBlock(
            out_channels, in_channels, upsampling_depth,
            fixed_mha=fixed_mha, drop_path=drop_path, norm=norm)
        self.iter = _iter
        self.out_channels = out_channels
        self.remat = remat

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"unet": self.unet.init(k1),
                "concat_block": {
                    "0": ops.conv1d_init(k2, self.out_channels,
                                         self.out_channels, 1,
                                         groups=self.out_channels),
                    "1": ops.prelu_init()}}

    def apply(self, p, x, *, training=False, rng=None, n_iter=None):
        """``n_iter`` overrides the iteration count at apply time (early
        exit / variable-depth inference: the weights are SHARED across
        iterations, so any depth <= the trained one is a valid program;
        reference analog: the fixed 16-iteration loop,
        TDANet_best.py:383-399). Static per trace — each depth is its
        own compiled program."""
        it_count = self.iter if n_iter is None else int(n_iter)
        if not 1 <= it_count <= self.iter:
            # depth 0 would still run one iteration below (and depths
            # beyond the trained count are untested extrapolation) —
            # fail loudly instead of mislabeling a sweep
            raise ValueError(
                f"n_iter must be in [1, {self.iter}], got {it_count}")
        mixture = x

        def unet_fn(params, inp, it_rng):
            return self.unet.apply(params, inp, training=training, rng=it_rng)

        if self.remat == "scales":
            # selective remat: keep each iteration's pyramid scales,
            # post-GA global and fused scales (checkpoint_name tags in
            # UConvBlock.apply); backward then only recomputes the short
            # segments between them instead of the whole block.
            unet_fn = jax.checkpoint(
                unet_fn, policy=jax.checkpoint_policies.save_only_these_names(
                    "pyr_scale", "ga_out", "fused_scale"))
        elif self.remat:
            unet_fn = jax.checkpoint(unet_fn)

        def concat(inp):
            return self._concat(p, inp)

        x = unet_fn(p["unet"], x, _fold(rng, 0))

        if it_count > 1:
            if rng is not None:
                iter_rngs = jax.random.split(
                    jax.random.fold_in(rng, 999), it_count - 1)
            else:
                iter_rngs = jnp.zeros((it_count - 1, 2), jnp.uint32)

            def body(carry, it_rng):
                r = it_rng if rng is not None else None
                out = unet_fn(p["unet"], concat(mixture + carry), r)
                # 8-bit carry storage (no-op unless ops.act_storage)
                return ops.store_activation(out), None

            x, _ = jax.lax.scan(body, x, iter_rngs)
        return x

    def _concat(self, p, inp):
        """The inter-iteration concat block (depthwise 1x1 + PReLU)."""
        y = ops.conv1d(inp, p["concat_block"]["0"],
                       groups=self.out_channels)
        return ops.prelu(y, p["concat_block"]["1"])

    def apply_with_state(self, p, x, n_iter=None):
        """Inference-only depth-``n_iter`` forward that also returns the
        progressive-separation state: ``(out, delta)`` where ``delta``
        is the per-example relative change between the last two
        iterates, ``||x_d - x_{d-1}|| / ||x_d||`` — the convergence
        proxy that decides whether ``continue_apply`` is worth running
        (docs/PERF.md progressive study). Requires ``n_iter >= 2``.
        The output equals ``apply(..., n_iter=n_iter)`` exactly (same
        body, same order of operations)."""
        it_count = self.iter if n_iter is None else int(n_iter)
        if not 2 <= it_count <= self.iter:
            raise ValueError(
                f"apply_with_state needs n_iter in [2, {self.iter}] "
                f"(the delta proxy compares the last two iterates), "
                f"got {it_count}")
        mixture = x
        x0 = self.unet.apply(p["unet"], x)

        def body(carry, _):
            _, cur = carry
            out = self.unet.apply(p["unet"],
                                  self._concat(p, mixture + cur))
            return (cur, ops.store_activation(out)), None

        (prev, x), _ = jax.lax.scan(body, (x0, x0), None,
                                    length=it_count - 1)
        axes = tuple(range(1, x.ndim))
        delta = (jnp.sqrt(jnp.sum((x - prev) ** 2, axis=axes))
                 / (jnp.sqrt(jnp.sum(x ** 2, axis=axes)) + 1e-8))
        return x, delta

    def continue_apply(self, p, mixture, carry, n_more):
        """EXACT continuation: run ``n_more`` further shared-weight
        iterations from ``carry`` — iterations d..d+n_more of the same
        recurrence (same weights, same body), so a depth-d
        ``apply_with_state`` followed by ``continue_apply(n_more)``
        equals ``apply`` at depth d+n_more. Inference-only."""

        def body(c, _):
            out = self.unet.apply(p["unet"], self._concat(p, mixture + c))
            return ops.store_activation(out), None

        x, _ = jax.lax.scan(body, carry, None, length=int(n_more))
        return x


class _GateConvPair:
    """depthwise k=3 conv -> 1x1 conv (the reset/update gate convs,
    TDANet_gate_variant.py:400-425)."""

    def __init__(self, channels, kernel=3):
        self.channels, self.kernel = channels, kernel

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"0": ops.conv1d_init(k1, self.channels, self.channels,
                                     self.kernel, groups=self.channels),
                "1": ops.conv1d_init(k2, self.channels, self.channels, 1)}

    def apply(self, p, x):
        y = ops.conv1d(x, p["0"], padding=self.kernel // 2,
                       groups=self.channels)
        return ops.conv1d(y, p["1"])


class GatedRecurrent:
    """GRU-style gated recurrence around the shared U-block
    (TDANet_gate_variant.py:392-467): reset/update convolution gates on
    (mixture, x); iteration output = unet(prelu(x)) * u + mixture * r.
    Gate norms are GroupNorm(1, C, eps=1e-6)."""

    def __init__(self, out_channels=128, in_channels=512, upsampling_depth=4,
                 _iter=4, block=None, norm="gn", fixed_mha=False):
        self.unet = block if block is not None else UConvBlockInject(
            out_channels, in_channels, upsampling_depth, norm=norm,
            fixed_mha=fixed_mha)
        self.iter = _iter
        self.out_channels = out_channels
        C = out_channels
        self.reset_conv_x = _GateConvPair(C)
        self.reset_conv_h = _GateConvPair(C)
        self.update_conv_x = _GateConvPair(C)
        self.update_conv_h = _GateConvPair(C)

    def init(self, key):
        ks = jax.random.split(key, 9)
        C = self.out_channels
        return {
            "unet": self.unet.init(ks[0]),
            "concat_block": {"0": ops.conv1d_init(ks[1], C, C, 1, groups=C),
                             "1": ops.prelu_init()},
            "reset_conv_x": self.reset_conv_x.init(ks[2]),
            "reset_conv_h": self.reset_conv_h.init(ks[3]),
            "update_conv_x": self.update_conv_x.init(ks[4]),
            "update_conv_h": self.update_conv_h.init(ks[5]),
            "output_conv_x": ops.conv1d_init(ks[6], C, C, 3, groups=C),
            "output_conv_h": ops.conv1d_init(ks[7], C, C, 3, groups=C),
            "reset_gate_norm": ops.layer_norm_init(C),
            "update_gate_norm": ops.layer_norm_init(C),
            "output_norm": ops.layer_norm_init(C),
            "in_act": ops.prelu_init(),
        }

    def _gate(self, p_x, p_h, mod_x, mod_h, norm_p, x, h):
        g = mod_x.apply(p_x, x) + mod_h.apply(p_h, h)
        return jax.nn.sigmoid(ops.group_norm1(g, norm_p, eps=1e-6))

    def apply(self, p, x, *, training=False, rng=None):
        mixture = x
        x = self.unet.apply(p["unet"], ops.prelu(x, p["in_act"]),
                            training=training, rng=_fold(rng, 0))
        for i in range(1, self.iter):
            r = self._gate(p["reset_conv_x"], p["reset_conv_h"],
                           self.reset_conv_x, self.reset_conv_h,
                           p["reset_gate_norm"], mixture, x)
            u = self._gate(p["update_conv_x"], p["update_conv_h"],
                           self.update_conv_x, self.update_conv_h,
                           p["update_gate_norm"], mixture, x)
            h = self.unet.apply(p["unet"], ops.prelu(x, p["in_act"]),
                                training=training, rng=_fold(rng, i))
            x = h * u + mixture * r
        return x
