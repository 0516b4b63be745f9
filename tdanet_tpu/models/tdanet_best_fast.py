"""TPU-optimized TDANetBest forward: channels-last (B, T, C) layout.

Numerically equivalent to ``TDANetBest.apply`` (same parameter pytree;
tested to agree with the reference-faithful implementation), restructured
for the TPU memory model:

- channels (128/512 — exact lane multiples) ride the 128-wide lanes;
  time rides sublanes, so depthwise k<=5 convs become k cheap sublane
  shifts + multiply-adds on the VPU instead of grouped convolutions;
- every 1x1 conv is a (T, C) x (C, C') matmul on the MXU;
- strided convs split T into even/odd phases once and shift phases;
- the framed encoder and the overlap-add decoder are static gather +
  matmul / matmul + 4-phase shifted adds — no conv primitives at all;
- the 16 shared-weight iterations run under one ``lax.scan``.

Used by bench/serving; the reference-layout implementation remains the
source of truth for fidelity.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tdanet_tpu import ops


def _w1x1(p):
    """(O, I, 1) torch conv weight -> (I, O) matmul weight."""
    return p["weight"][:, :, 0].T


def conv1x1(x, p):
    """x (B, T, C) @ 1x1 conv params."""
    w = _w1x1(p).astype(x.dtype)
    y = jnp.einsum("btc,co->bto", x, w, preferred_element_type=x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def dw_scale(x, p):
    """k=1 depthwise conv: per-channel scale (+bias)."""
    y = x * p["weight"].astype(x.dtype)[None, None, :, 0, 0]
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def dw_conv(x, p, k, stride=1):
    """Depthwise conv, channels-last; padding = (k-1)//2 like ConvNorm."""
    w = p["weight"].astype(x.dtype)          # (C, 1, K)
    pad = (k - 1) // 2
    B, T, C = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    L_out = (T + 2 * pad - k) // stride + 1
    out = None
    for j in range(k):
        sl = jax.lax.slice_in_dim(xp, j, j + (L_out - 1) * stride + 1,
                                  stride=stride, axis=1)
        term = sl * w[:, 0, j][None, None, :]
        out = term if out is None else out + term
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def glob_ln(x, p):
    """GlobLN over (T, C) with fp32 statistics; channels-last affine."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    normed = (x - mean.astype(x.dtype)) \
        * jax.lax.rsqrt(var + 1e-8).astype(x.dtype)
    return normed * p["gamma"].astype(x.dtype) + p["beta"].astype(x.dtype)


def prelu(x, p):
    a = p["weight"].astype(x.dtype)
    a = a[0] if a.shape[0] == 1 else a
    return jnp.where(x >= 0, x, a * x)


def layer_norm(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(var + eps).astype(x.dtype)
    return y * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)


def conv_norm(x, p, k=1, stride=1, depthwise=True):
    if k == 1 and depthwise:
        y = dw_scale(x, p["conv"])
    elif depthwise:
        y = dw_conv(x, p["conv"], k, stride)
    else:
        y = conv1x1(x, p["conv"])
    return glob_ln(y, p["norm"])


def avg_pool_matrix(L, out):
    starts = (np.arange(out) * L) // out
    ends = -((-(np.arange(out) + 1) * L) // out)
    mat = np.zeros((L, out), np.float32)
    for i, (s, e) in enumerate(zip(starts, ends)):
        mat[s:e, i] = 1.0 / (e - s)
    return mat


def interp_idx(L, out):
    idx = np.minimum(np.floor(np.arange(out) * (L / out)), L - 1)
    return idx.astype(np.int32)


class TDANetBestFast:
    """Channels-last executor sharing TDANetBest's config + params."""

    def __init__(self, model):
        self.m = model

    # -- sublayers ---------------------------------------------------------

    def _ffn(self, p, x):
        y = conv_norm(x, p["fc1"], k=1, depthwise=False)
        y = dw_conv(y, p["dwconv"], 5)
        y = jax.nn.relu(y)
        y = conv_norm(y, p["fc2"], k=1, depthwise=False)
        return y

    def _mha(self, p, x):
        """Reference-quirk MHA: input (B, T, C); attention over the BATCH
        axis with T as batch; self-residual."""
        B, T, C = x.shape
        heads = 8
        hd = C // heads
        out = layer_norm(x, p["attn_in_norm"])
        pe = ops.sinusoidal_pe(T, C, out.dtype)
        out = out + pe[None]
        a = p["attn"]
        w = a["in_proj_weight"].astype(x.dtype)
        b = a["in_proj_bias"].astype(x.dtype)
        qkv = jnp.einsum("btc,dc->btd", out, w) + b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # (L=B, N=T, E) -> heads over N*heads: follow torch reshape on
        # (L, N, E): t.reshape(L, N*h, hd).transpose -> (N*h, L, hd)
        def split(t):
            return t.reshape(B, T * heads, hd).transpose(1, 0, 2)
        qh = split(q) * (1.0 / np.sqrt(hd)).astype(x.dtype)
        kh, vh = split(k), split(v)
        scores = jnp.einsum("nlh,nsh->nls", qh, kh,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        ctx = jnp.einsum("nls,nsh->nlh", attn, vh,
                         preferred_element_type=x.dtype)
        ctx = ctx.transpose(1, 0, 2).reshape(B, T, C)
        op = a["out_proj"]
        proj = jnp.einsum("btc,oc->bto", ctx, op["weight"].astype(x.dtype)) \
            + op["bias"].astype(x.dtype)
        res = layer_norm(proj + proj, p["norm"])
        return res

    def _ga(self, p, x):
        x = x + self._mha(p["attn"], x)
        x = x + self._ffn(p["mlp"], x)
        return x

    def _la(self, p, x_l, x_g, k):
        T = x_l.shape[1]
        Lg = x_g.shape[1]
        if k == 1:
            local = glob_ln(dw_scale(x_l, p["local_embedding"]["conv"]),
                            p["local_embedding"]["norm"])
            act = glob_ln(dw_scale(x_g, p["global_act"]["conv"]),
                          p["global_act"]["norm"])
            emb = glob_ln(dw_scale(x_g, p["global_embedding"]["conv"]),
                          p["global_embedding"]["norm"])
        else:
            local = glob_ln(dw_conv(x_l, p["local_embedding"]["conv"], k),
                            p["local_embedding"]["norm"])
            act = glob_ln(dw_conv(x_g, p["global_act"]["conv"], k),
                          p["global_act"]["norm"])
            emb = glob_ln(dw_conv(x_g, p["global_embedding"]["conv"], k),
                          p["global_embedding"]["norm"])
        if Lg != T:
            idx = jnp.asarray(interp_idx(Lg, T))
            act = jnp.take(act, idx, axis=1)
            emb = jnp.take(emb, idx, axis=1)
        return local * jax.nn.sigmoid(act) + emb

    def _unet(self, p, x):
        depth = self.m.upsampling_depth
        residual = x
        y = conv_norm(x, {"conv": p["proj_1x1"]["conv"],
                          "norm": p["proj_1x1"]["norm"]}, k=1,
                      depthwise=False)
        y = prelu(y, p["proj_1x1"]["act"])
        outs = [glob_ln(dw_conv(y, p["spp_dw"]["0"]["conv"], 5),
                        p["spp_dw"]["0"]["norm"])]
        for kk in range(1, depth):
            outs.append(glob_ln(
                dw_conv(outs[-1], p["spp_dw"][str(kk)]["conv"], 5, 2),
                p["spp_dw"][str(kk)]["norm"]))
        Lc = outs[-1].shape[1]
        gf = outs[-1]
        for f in outs[:-1]:
            mat = jnp.asarray(avg_pool_matrix(f.shape[1], Lc), f.dtype)
            gf = gf + jnp.einsum("btc,to->boc", f, mat,
                                 preferred_element_type=f.dtype)
        gf = self._ga(p["globalatt"], gf)
        fused = [self._la(p["loc_glo_fus"][str(i)], outs[i], gf, 1)
                 for i in range(depth)]
        expanded = None
        for i in range(depth - 2, -1, -1):
            g = fused[i - 1] if i == depth - 2 else expanded
            expanded = self._la(p["last_layer"][str(i)], fused[i], g, 5)
        return conv1x1(expanded, p["res_conv"]) + residual

    def _separator(self, p, x):
        mixture = x

        def concat(v):
            y = dw_scale(v, p["concat_block"]["0"])
            return prelu(y, p["concat_block"]["1"])

        x = self._unet(p["unet"], x)
        if self.m.num_blocks > 1:
            def body(carry, _):
                return self._unet(p["unet"], concat(mixture + carry)), None
            x, _ = jax.lax.scan(body, x, None, length=self.m.num_blocks - 1)
        return x

    # -- full forward ------------------------------------------------------

    def apply(self, params, wav, *, compute_dtype=jnp.bfloat16):
        m = self.m
        was_one_d = wav.ndim == 1
        if was_one_d:
            wav = wav[None]
        if wav.ndim == 3:
            wav = wav.squeeze(1)
        K, S = m.enc_kernel_size, m.enc_kernel_size // 4
        x, rest = ops.pad_signal(wav.astype(compute_dtype), K, S)
        B, Tp = x.shape
        # framed encoder: gather frames then one matmul
        T0 = (Tp + 2 * (K // 2) - K) // S + 1
        xp = jnp.pad(x, ((0, 0), (K // 2, K // 2)))
        idx = (np.arange(T0)[:, None] * S + np.arange(K)[None, :])
        frames = xp[:, jnp.asarray(idx)]                     # (B, T0, K)
        w_enc = params["encoder"]["weight"][:, 0, :].T.astype(compute_dtype)
        feat = jnp.einsum("btk,kc->btc", frames, w_enc,
                          preferred_element_type=compute_dtype)
        s = feat
        y = glob_ln(feat, params["ln"])
        y = conv1x1(y, params["bottleneck"])
        y = self._separator(params["sm"], y)
        y = prelu(y, params["mask_net"]["0"])
        y = conv1x1(y, params["mask_net"]["1"])              # (B,T0,2*basis)
        basis = m.enc_num_basis
        mask = jax.nn.relu(y.reshape(B, T0, m.num_sources, basis))
        masked = mask * s[:, :, None, :]                     # (B,T0,src,基)
        # decoder: matmul to frames then 4-phase overlap-add
        w_dec = params["decoder"]["weight"].astype(compute_dtype)  # (2基,src,K)
        w_dec = w_dec.reshape(m.num_sources, basis, m.num_sources, K)
        # torch groups=1: out[src_o] = sum over (src_i, basis)
        fr = jnp.einsum("btsc,scok->btok", masked, w_dec,
                        preferred_element_type=compute_dtype)
        # overlap-add: frame t covers samples [t*S, t*S+K); K = 4S
        chunks = fr.reshape(B, T0, m.num_sources, 4, S)
        total = jnp.zeros((B, T0 + 3, m.num_sources, S), compute_dtype)
        for j in range(4):
            total = total.at[:, j:j + T0].add(chunks[:, :, :, j])
        est = total.transpose(0, 2, 1, 3).reshape(B, m.num_sources, -1)
        # ConvTranspose1d's padding=K//2 trim, then the model's lattice trim
        # [K-S : -(rest+K-S)] (TDANet_best.py:512-518), composed:
        L_dec = (T0 - 1) * S            # decoder output length after trim
        start = K // 2 + (K - S)
        end = K // 2 + L_dec - (rest + K - S)
        est = est[:, :, start:end]
        if was_one_d:
            return est[0]
        return est
