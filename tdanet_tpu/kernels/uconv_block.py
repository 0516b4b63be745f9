"""VMEM-resident fused UConvBlock kernels (inference path).

The UConvBlock (reference TDANet_best.py:295-380) is the serving
hot-spot: 16 shared-weight iterations, each ~15 HBM passes over the
scale-pyramid activations under XLA (docs/PERF.md). These kernels keep
one sample's ENTIRE pyramid resident in VMEM and make exactly one HBM
pass per tensor:

  pyramid_fused:  proj_1x1 (matmul+GlobLN+PReLU) -> depth x depthwise
                  k=5 conv+GlobLN stages (stride 1 then 2,2,...) ->
                  adaptive-avg-pool sum of all scales at the coarsest
                  resolution. One input read, one write per scale.

Between this and the fusion/expansion kernel, the GA transformer runs
at the coarsest scale (126 frames at the recipe shape) in plain XLA —
it is matmul-bound and tiny.

Layout: time on sublanes, channels on lanes ((T, C) per sample, grid
over batch). Every per-scale buffer carries PAD=8 zero rows on both
ends so k=5 taps are STATIC in-window slices (Mosaic lowers them to
sublane shifts; dynamic sublane offsets would need provable
8-alignment). Stride-2 taps are strided static slices, with a one-hot
decimation-matmul fallback (module switch DECIMATE) if Mosaic rejects
sublane-strided slices on the chip.

Inference-only (training uses the XLA path); numerics: bf16 storage
between stages (like the XLA bf16 compute path), f32 tap accumulation
and norm statistics.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 8  # zero rows before and after each scale's true range

# "fold"   — reshape (rows, C) -> (rows/2, 2C) so even/odd phases are
#            tile-aligned lane halves; stride-2 taps become plain
#            sublane shifts (Mosaic supports this reshape, measured)
# "matmul" — stride-1 conv then a one-hot decimation matmul
# "slice"  — strided static lax.slice (REJECTED by Mosaic on v5e:
#            vector.extract_strided_slice wants stride 1)
DECIMATE = "fold"


def _pads(T):
    """Padded buffer row count for a scale with true length T."""
    return -(-T // PAD) * PAD + 2 * PAD


def scale_lengths(T0, depth):
    """True pyramid lengths: stride-2 'same' k=5 chain (ceil halving)."""
    Ts = [T0]
    for _ in range(1, depth):
        Ts.append((Ts[-1] + 1) // 2)
    return Ts


def _row_mask(nrows, T, dt=jnp.float32):
    row = lax.broadcasted_iota(jnp.int32, (nrows, 1), 0)
    return ((row >= PAD) & (row < PAD + T)).astype(dt)


def _glob_ln(y, mask, n, gamma, beta, eps=1e-8):
    """GlobLN over the true rows of a padded (rows, C) array; y must be
    zero on pad rows. Statistics in f32 (like the XLA path, which
    upcasts the bf16 tensor for its fused one-pass stats); the affine is
    in y's dtype so intermediate spills stay bf16 on the bf16 path. Pad
    rows of the result are re-zeroed (the affine beta would otherwise
    leak into later conv taps)."""
    dt = y.dtype
    yf = y.astype(jnp.float32)
    s = jnp.sum(yf)
    ss = jnp.sum(yf * yf)
    mean = s / n
    var = jnp.maximum(ss / n - mean * mean, 0.0)
    rstd = lax.rsqrt(var + eps)
    return ((y - mean.astype(dt)) * rstd.astype(dt) * gamma.astype(dt)
            + beta.astype(dt)) * mask


def _tap(h, k, stride, n_out):
    """Tap k of a k=5 'same' conv as a static slice: rows
    PAD + t*stride + (k-2) for t in [0, n_out)."""
    start = PAD + k - 2
    if stride == 1:
        return lax.slice_in_dim(h, start, start + n_out, axis=0)
    return lax.slice(h, (start, 0),
                     (start + (n_out - 1) * stride + 1, h.shape[1]),
                     (stride, 1))


def _dw_conv5(h, w, b, stride, n_out):
    """Depthwise k=5 conv in h's dtype (pairwise-tree accumulation keeps
    bf16 rounding at two adds deep). h (rows, C) value with zero pads;
    w (8, C) taps in rows 0..4; b (1, C). Returns (n_out, C) rows
    t = 0..n_out-1."""
    if stride == 2 and DECIMATE == "fold":
        return _dw_conv5_s2_fold(h, w, b, n_out)
    dt = h.dtype
    wc = w.astype(dt)
    t = [_tap(h, k, stride, n_out) * wc[k][None, :] for k in range(5)]
    return (t[0] + t[1]) + (t[2] + t[3]) + (t[4] + b.astype(dt))


def _dw_conv5_s2_fold(h, w, b, n_out):
    """Stride-2 k=5 conv via the fold trick: view (rows, C) as
    (rows/2, 2C) so even rows are lanes [:C] and odd rows lanes [C:];
    y[t] = w0 E[t+3] + w1 O[t+3] + w2 E[t+4] + w3 O[t+4] + w4 E[t+5]
    (PAD=8 keeps the phase: buffer row of x[j] is 8+j)."""
    rows, C = h.shape
    dt = h.dtype
    wc = w.astype(dt)
    f = h.reshape(rows // 2, 2 * C)
    e, o = f[:, :C], f[:, C:]
    t = [lax.slice_in_dim(src, off, off + n_out, axis=0) * wc[k][None, :]
         for k, (src, off) in enumerate(
             ((e, 3), (o, 3), (e, 4), (o, 4), (e, 5)))]
    return (t[0] + t[1]) + (t[2] + t[3]) + (t[4] + b.astype(dt))


def _pyramid_kernel(*refs, Ts, C, Cin):
    depth = len(Ts)
    (x_ref, wp_ref, bp_ref, pnorm_ref, slope_ref, dww_ref,
     dwp_ref) = refs[:7]
    pool_refs = refs[7:7 + depth - 1]
    dec_refs = refs[7 + depth - 1:7 + 2 * (depth - 1)]
    out_refs = refs[7 + 2 * (depth - 1):7 + 2 * (depth - 1) + depth]
    g_ref = refs[-1]

    rows0 = _pads(Ts[0])
    dt = x_ref.dtype

    # ---- proj_1x1: matmul + GlobLN + PReLU (ConvNormAct) ----
    h_in = x_ref[0]                                       # (rows0, Cin)
    y = jnp.dot(h_in, wp_ref[:], preferred_element_type=jnp.float32) \
        .astype(dt)
    m = _row_mask(rows0, Ts[0], dt)
    y = (y + bp_ref[:].astype(dt)) * m                    # pads: bias -> 0
    z = _glob_ln(y, m, jnp.float32(Ts[0] * C),
                 pnorm_ref[0][None, :], pnorm_ref[1][None, :])
    # PReLU as max/min — bf16 cmpf is unsupported on v5e Mosaic
    slope = slope_ref[0, 0].astype(dt)
    h = jnp.maximum(z, 0) + slope * jnp.minimum(z, 0)     # (rows0, C)

    # ---- pyramid: dw k5 conv + GlobLN per scale; pool sum on the fly ----
    rows_g = _pads(Ts[-1]) - 2 * PAD
    pooled = None
    for s in range(depth):
        stride = 1 if s == 0 else 2
        T_out = Ts[s]
        rows = _pads(T_out)
        w = dww_ref[s]                                    # (8, C) f32
        b = dwp_ref[s, 0][None, :]
        gam = dwp_ref[s, 1][None, :]
        bet = dwp_ref[s, 2][None, :]
        if stride == 2 and DECIMATE == "matmul":
            acc_full = _dw_conv5(h, w, b, 1, Ts[s - 1])
            acc = jnp.dot(dec_refs[s - 1][:],
                          acc_full.astype(dec_refs[s - 1].dtype),
                          preferred_element_type=jnp.float32).astype(dt)
        else:
            acc = _dw_conv5(h, w, b, stride, T_out)
        m = _row_mask(rows, T_out, dt)
        y = jnp.pad(acc, ((PAD, rows - T_out - PAD), (0, 0)))
        h = _glob_ln(y * m, m, jnp.float32(T_out * C), gam, bet)
        out_refs[s][0] = h
        if s < depth - 1:
            # bf16 pool weights match the XLA path (adaptive_avg_pool1d
            # casts its matrix to x.dtype)
            contrib = jnp.dot(pool_refs[s][:], h,
                              preferred_element_type=jnp.float32)
        else:
            contrib = lax.slice_in_dim(h, PAD, PAD + rows_g, axis=0) \
                .astype(jnp.float32)
        pooled = contrib if pooled is None else pooled + contrib
    g_ref[0] = pooled.astype(g_ref.dtype)


def _pool_matrix(T_in, T_out):
    """Adaptive-avg-pool weights (torch semantics): (rows_out, rows_in)
    f32 against the PAD-offset input buffer; output rows 0..T_out-1."""
    starts = (np.arange(T_out) * T_in) // T_out
    ends = -((-(np.arange(T_out) + 1) * T_in) // T_out)
    rows_out = _pads(T_out) - 2 * PAD
    mat = np.zeros((rows_out, _pads(T_in)), np.float32)
    for i, (s, e) in enumerate(zip(starts, ends)):
        mat[i, PAD + s:PAD + e] = 1.0 / (e - s)
    return mat


def _decim_matrix(T_out, T_in):
    """Row decimation one-hot (T_out, T_in): out[t] = in[2t]."""
    mat = np.zeros((T_out, T_in), np.float32)
    for t in range(T_out):
        mat[t, min(2 * t, T_in - 1)] = 1.0
    return mat


def _pyramid_weight_arrays(params, C, depth, dtype):
    pj = params["proj_1x1"]
    wp = pj["conv"]["weight"][:, :, 0].T.astype(dtype)        # (Cin, C)
    bp = pj["conv"]["bias"].reshape(1, C).astype(jnp.float32)
    pnorm = jnp.stack([pj["norm"]["gamma"].reshape(-1),
                       pj["norm"]["beta"].reshape(-1)]).astype(jnp.float32)
    slope = pj["act"]["weight"].reshape(1, 1).astype(jnp.float32)
    dww = jnp.zeros((depth, 8, C), jnp.float32)
    dwp = jnp.zeros((depth, 3, C), jnp.float32)
    for s in range(depth):
        sp = params["spp_dw"][str(s)]
        dww = dww.at[s, :5].set(sp["conv"]["weight"][:, 0, :].T)
        dwp = dwp.at[s, 0].set(sp["conv"]["bias"])
        dwp = dwp.at[s, 1].set(sp["norm"]["gamma"].reshape(-1))
        dwp = dwp.at[s, 2].set(sp["norm"]["beta"].reshape(-1))
    return wp, bp, pnorm, slope, dww, dwp


# Upsample strategy for the x2 expansion steps:
#   "repeat" — broadcast-repeat rows (floor(i*T/(2T or 2T-1)) == i//2,
#              asserted at build time), no extra VMEM
#   "matmul" — one-hot matrices (fallback if Mosaic rejects the
#              (T,2,C)->(2T,C) interleave reshape)
UP2 = "repeat"


def _mask0(nrows, T):
    """Row mask for a zero-offset (no leading PAD) buffer."""
    row = lax.broadcasted_iota(jnp.int32, (nrows, 1), 0)
    return (row < T).astype(jnp.float32)


def _k1_norm(v, w, gam, beta, T, C, mask):
    """Depthwise k=1 ConvNorm (bias-free): per-channel scale + GlobLN.
    Runs in v's dtype (f32 stats inside _glob_ln)."""
    y = v * w[None, :].astype(v.dtype) * mask
    return _glob_ln(y, mask, jnp.float32(T * C), gam[None, :],
                    beta[None, :])


def _k5_norm(v, taps, gam, beta, T, C):
    """Depthwise k=5 ConvNorm (bias-free) on a PAD-offset buffer."""
    rows = v.shape[0]
    acc = _dw_conv5(v, taps, jnp.zeros((1, 1), v.dtype), 1, T)
    y = jnp.pad(acc, ((PAD, rows - T - PAD), (0, 0)))
    m = _row_mask(rows, T, v.dtype)
    return _glob_ln(y * m, m, jnp.float32(T * C), gam[None, :],
                    beta[None, :])


def _up2_rows(v, T_in, T_out, rows_out):
    """Nearest x2 upsample of a PAD-offset buffer: out[t] = in[t//2]."""
    t = lax.slice_in_dim(v, PAD, PAD + T_in, axis=0)
    r = jnp.repeat(t, 2, axis=0)
    r = lax.slice_in_dim(r, 0, T_out, axis=0)
    return jnp.pad(r, ((PAD, rows_out - T_out - PAD), (0, 0)))


def _sigmoid(x):
    """jax.nn.sigmoid lowers to lax.logistic, which hits a Mosaic
    vector.broadcast f32->bf16 verification bug on bf16 inputs; the
    manual formulation stays in x's dtype."""
    return 1.0 / (1.0 + jnp.exp(-x))


def _fuse_expand_kernel(*refs, Ts, C, Cout, up2, ablate=None):
    depth = len(Ts)
    n_up = depth - 1          # fusion upsample matrices (one per finer scale)
    s_refs = refs[:depth]
    g_ref = refs[depth]
    x_ref = refs[depth + 1]
    fus_ref = refs[depth + 2]
    expw_ref = refs[depth + 3]
    expn_ref = refs[depth + 4]
    resw_ref = refs[depth + 5]
    resb_ref = refs[depth + 6]
    u_refs = refs[depth + 7:depth + 7 + n_up]
    d_ref = refs[depth + 7 + n_up]
    up2_refs = refs[depth + 8 + n_up:-1]
    out_ref = refs[-1]

    Tg = Ts[-1]
    rows_g = g_ref.shape[1]
    dt = g_ref.dtype
    g = g_ref[0]                                          # (rows_g, C)
    mg = _mask0(rows_g, Tg).astype(dt)
    gv = g * mg

    # ---- per-scale LA fusion: local*sig(up(act(g))) + up(emb(g)) ----
    if ablate == "skip_fusion":
        fused = [s_refs[i][0] for i in range(depth)]
    else:
        fused = []
    for i in range(depth if ablate != "skip_fusion" else 0):
        rows_i = _pads(Ts[i])
        mi = _row_mask(rows_i, Ts[i], dt)
        z_loc = _k1_norm(s_refs[i][0], fus_ref[i, 0],
                         fus_ref[i, 1], fus_ref[i, 2], Ts[i], C, mi)
        z_act = _k1_norm(gv, fus_ref[i, 3], fus_ref[i, 4], fus_ref[i, 5],
                         Tg, C, mg)
        sig = _sigmoid(z_act)
        z_emb = _k1_norm(gv, fus_ref[i, 6], fus_ref[i, 7], fus_ref[i, 8],
                         Tg, C, mg)
        if i < depth - 1:
            up_sig = jnp.dot(u_refs[i][:], sig,
                             preferred_element_type=jnp.float32).astype(dt)
            up_emb = jnp.dot(u_refs[i][:], z_emb,
                             preferred_element_type=jnp.float32).astype(dt)
            pad_cfg = ((PAD, rows_i - Ts[i] - PAD), (0, 0))
            f = z_loc * jnp.pad(up_sig, pad_cfg) + jnp.pad(up_emb, pad_cfg)
        else:
            sig_t = lax.slice_in_dim(sig, 0, Tg, axis=0)
            emb_t = lax.slice_in_dim(z_emb, 0, Tg, axis=0)
            pad_cfg = ((PAD, rows_i - Tg - PAD), (0, 0))
            f = z_loc * jnp.pad(sig_t, pad_cfg) + jnp.pad(emb_t, pad_cfg)
        fused.append(f * mi)

    # ---- top-down expansion (x_fused[i-1] first-pair quirk) ----
    if ablate == "skip_expand":
        y = jnp.dot(fused[0], resw_ref[:], preferred_element_type=jnp.float32)
        m0 = _row_mask(_pads(Ts[0]), Ts[0])
        y = (y + resb_ref[:]) * m0 + x_ref[0].astype(jnp.float32) * m0
        out_ref[0] = y.astype(out_ref.dtype)
        return
    exp = None
    for i in range(depth - 2, -1, -1):
        T_l = Ts[i]
        rows_l = _pads(T_l)
        if i == depth - 2:
            x_g, T_gg = fused[i - 1], Ts[i - 1]       # FINER scale (quirk)
        else:
            x_g, T_gg = exp, Ts[i + 1]
        z_loc = _k5_norm(fused[i], expw_ref[i, 0], expn_ref[i, 0, 0],
                         expn_ref[i, 0, 1], T_l, C)
        z_act = _k5_norm(x_g, expw_ref[i, 1], expn_ref[i, 1, 0],
                         expn_ref[i, 1, 1], T_gg, C)
        sig = _sigmoid(z_act)
        z_emb = _k5_norm(x_g, expw_ref[i, 2], expn_ref[i, 2, 0],
                         expn_ref[i, 2, 1], T_gg, C)
        if T_l < T_gg:
            # first pair downsamples the finer global: one-hot matmul
            pad_cfg = ((PAD, rows_l - T_l - PAD), (0, 0))
            r_sig = jnp.pad(jnp.dot(d_ref[:], sig,
                                    preferred_element_type=jnp.float32)
                            .astype(dt), pad_cfg)
            r_emb = jnp.pad(jnp.dot(d_ref[:], z_emb,
                                    preferred_element_type=jnp.float32)
                            .astype(dt), pad_cfg)
        elif up2 == "repeat":
            r_sig = _up2_rows(sig, T_gg, T_l, rows_l)
            r_emb = _up2_rows(z_emb, T_gg, T_l, rows_l)
        else:
            u = up2_refs[i][:]
            pad_cfg = ((PAD, rows_l - T_l - PAD), (0, 0))
            r_sig = jnp.pad(jnp.dot(u, sig,
                                    preferred_element_type=jnp.float32)
                            .astype(dt), pad_cfg)
            r_emb = jnp.pad(jnp.dot(u, z_emb,
                                    preferred_element_type=jnp.float32)
                            .astype(dt), pad_cfg)
        m = _row_mask(rows_l, T_l, dt)
        exp = (z_loc * r_sig + r_emb) * m

    # ---- res_conv (1x1) + residual ----
    y = jnp.dot(exp, resw_ref[:], preferred_element_type=jnp.float32) \
        .astype(dt)
    m0 = _row_mask(_pads(Ts[0]), Ts[0], dt)
    y = (y + resb_ref[:].astype(dt)) * m0 + x_ref[0] * m0
    out_ref[0] = y.astype(out_ref.dtype)


def _upsample_matrix(T_in, T_out, in_rows, in_offset):
    """Nearest-interp one-hot (T_out, in_rows): out[t] = in[floor(t*T_in/T_out)]."""
    idx = np.minimum((np.arange(T_out) * T_in) // T_out, T_in - 1)
    mat = np.zeros((T_out, in_rows), np.float32)
    mat[np.arange(T_out), in_offset + idx] = 1.0
    return mat


def _fusion_weight_arrays(params, C, depth):
    fus = jnp.zeros((depth, 9, C), jnp.float32)
    for i in range(depth):
        lp = params["loc_glo_fus"][str(i)]
        for j, name in enumerate(("local_embedding", "global_act",
                                  "global_embedding")):
            m = lp[name]
            fus = fus.at[i, 3 * j + 0].set(m["conv"]["weight"][:, 0, 0])
            fus = fus.at[i, 3 * j + 1].set(m["norm"]["gamma"].reshape(-1))
            fus = fus.at[i, 3 * j + 2].set(m["norm"]["beta"].reshape(-1))
    expw = jnp.zeros((depth - 1, 3, 8, C), jnp.float32)
    expn = jnp.zeros((depth - 1, 3, 2, C), jnp.float32)
    for i in range(depth - 1):
        lp = params["last_layer"][str(i)]
        for j, name in enumerate(("local_embedding", "global_act",
                                  "global_embedding")):
            m = lp[name]
            expw = expw.at[i, j, :5].set(m["conv"]["weight"][:, 0, :].T)
            expn = expn.at[i, j, 0].set(m["norm"]["gamma"].reshape(-1))
            expn = expn.at[i, j, 1].set(m["norm"]["beta"].reshape(-1))
    return fus, expw, expn


def fuse_expand_fused(scales_raw, g_raw, x_raw, params, *, Ts,
                      interpret=None, ablate=None):
    """Fused LA fusion + expansion + res_conv for one UConvBlock.

    scales_raw: list of (B, rows_i, C) padded buffers (pyramid_fused raw).
    g_raw: (B, rows_g, C) post-GA global feature (zero-offset rows).
    x_raw: (B, rows_0, Cout) padded block input (for the residual).
    Returns the padded block output (B, rows_0, Cout).
    """
    depth = len(Ts)
    B, _, C = scales_raw[0].shape
    Cout = x_raw.shape[-1]
    dtype = scales_raw[0].dtype

    fus, expw, expn = _fusion_weight_arrays(params, C, depth)
    resw = params["res_conv"]["weight"][:, :, 0].T.astype(dtype)  # (C, Cout)
    resb = params["res_conv"]["bias"].reshape(1, Cout).astype(jnp.float32)

    rows_g = g_raw.shape[1]
    # one-hot matrices are exact in bf16 and ride the MXU fast path
    ups = [jnp.asarray(_upsample_matrix(Ts[-1], Ts[i], rows_g, 0))
           .astype(dtype) for i in range(depth - 1)]
    # first expansion pair: resize the finer scale depth-3 down to depth-2
    dmat = jnp.asarray(_upsample_matrix(
        Ts[depth - 3], Ts[depth - 2], _pads(Ts[depth - 3]), PAD)) \
        .astype(dtype)

    up2s = []
    if UP2 == "matmul":
        for i in range(depth - 2):
            up2s.append(jnp.asarray(_upsample_matrix(
                Ts[i + 1], Ts[i], _pads(Ts[i + 1]), PAD)).astype(dtype))
    else:
        for i in range(depth - 2):
            idx = (np.arange(Ts[i]) * Ts[i + 1]) // Ts[i]
            assert np.array_equal(idx, np.arange(Ts[i]) // 2), \
                f"x2-repeat property fails for {Ts[i + 1]}->{Ts[i]}"
        up2s = [jnp.zeros((8, 8), jnp.float32)] * (depth - 2)

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    def _bspec(rows, cols):
        return pl.BlockSpec((1, rows, cols), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_fuse_expand_kernel, Ts=Ts, C=C, Cout=Cout, up2=UP2,
                ablate=ablate),
        grid=(B,),
        in_specs=[_bspec(_pads(t), C) for t in Ts]
        + [_bspec(rows_g, C), _bspec(_pads(Ts[0]), Cout)]
        + [vm] * (5 + (depth - 1) + 1 + (depth - 2)),
        out_specs=_bspec(_pads(Ts[0]), Cout),
        out_shape=jax.ShapeDtypeStruct((B, _pads(Ts[0]), Cout), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=(jax.default_backend() != "tpu") if interpret is None
        else interpret,
    )(*scales_raw, g_raw, x_raw, fus, expw, expn, resw, resb,
      *ups, dmat, *up2s)
    return out


def pyramid_fused(x, params, *, depth, interpret=None, raw=False,
                  raw_in=False, T0=None):
    """Fused proj_1x1 + pyramid + pooled-global for one UConvBlock.

    x: (B, C_out, T) block input in model layout, or — with
    ``raw_in=True`` — an already-padded (B, rows_0, C_out) buffer with
    true length ``T0`` (zero pad rows), so a chained recurrence never
    relayouts between iterations.
    params: the UConvBlock param tree (proj_1x1, spp_dw).
    Returns (scales, pooled); model layout (B, C, T_i) by default, or the
    kernel's padded (B, rows_i, C) buffers when ``raw=True`` (for
    chaining into the fusion kernel without relayouts).
    """
    if raw_in:
        B, rows0, Cin = x.shape
        assert T0 is not None and rows0 == _pads(T0)
        xt = x
    else:
        B, Cin, T0 = x.shape
        rows0 = _pads(T0)
        xt = jnp.swapaxes(x, 1, 2)
        xt = jnp.pad(xt, ((0, 0), (PAD, rows0 - T0 - PAD), (0, 0)))
    Ts = scale_lengths(T0, depth)
    C = params["spp_dw"]["0"]["conv"]["weight"].shape[0]
    dtype = x.dtype

    wp, bp, pnorm, slope, dww, dwp = _pyramid_weight_arrays(
        params, C, depth, dtype)

    pools = [jnp.asarray(_pool_matrix(Ts[s], Ts[-1])).astype(dtype)
             for s in range(depth - 1)]
    if DECIMATE == "matmul":
        # one-hot: exact in bf16, and bf16 x bf16 rides the MXU fast path
        decs = [jnp.asarray(_decim_matrix(Ts[s], Ts[s - 1])).astype(dtype)
                for s in range(1, depth)]
    else:
        decs = [jnp.zeros((8, 8), jnp.float32)] * (depth - 1)

    rows_g = _pads(Ts[-1]) - 2 * PAD
    out_shape = tuple(jax.ShapeDtypeStruct((B, _pads(t), C), dtype)
                      for t in Ts) + (
        jax.ShapeDtypeStruct((B, rows_g, C), dtype),)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    def _bspec(rows, cols):
        return pl.BlockSpec((1, rows, cols), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_pyramid_kernel, Ts=Ts, C=C, Cin=Cin),
        grid=(B,),
        in_specs=[_bspec(rows0, Cin)] + [vm] * (6 + 2 * (depth - 1)),
        out_specs=tuple(_bspec(_pads(t), C) for t in Ts)
        + (_bspec(rows_g, C),),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=(jax.default_backend() != "tpu") if interpret is None
        else interpret,
    )(xt, wp, bp, pnorm, slope, dww, dwp, *pools, *decs)
    if raw:
        return list(out[:depth]), out[depth]
    scales = [jnp.swapaxes(o[:, PAD:PAD + Ts[i]], 1, 2)
              for i, o in enumerate(out[:depth])]
    pooled = jnp.swapaxes(out[depth][:, :Ts[-1]], 1, 2)
    return scales, pooled
