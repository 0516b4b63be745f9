"""Chunked fused depthwise-conv + GlobLN Pallas kernel (v2 experiment).

Unlike kernels/fused_pyramid.py (which materializes full (T, C) vectors
and blows Mosaic's conservative VMEM stack), this version streams the
input from HBM with explicit per-chunk DMA (the full input block plus
the double-buffered output block alone exceed the 16 MB scoped-VMEM
budget at B=24), and runs a two-pass GlobLN:

  pass A: per chunk — DMA the input window into a VMEM buffer,
          depthwise conv (stride 1, K static tap shifts), accumulate
          sum/sumsq in the fori carry, stash raw conv in the out block;
  pass B: per chunk — normalize + affine the out block in place.

Total HBM traffic is the speed-of-light two passes (read x, write y).
Grid is over the batch; stride-1 'same' conv only (the full-resolution
stage, which carries most of the pyramid's traffic). Mirrors the torch
composition Conv1d(groups=C) -> GlobLN (reference
look2hear/models/tdanet.py DilatedConvNorm) but exists purely as a perf
experiment — see docs/PERF.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 512
LPAD = 8  # left zero-pad in the wrapper (>= (K-1)//2, sublane-aligned)


def _kernel(x_hbm, w_ref, b_ref, g_ref, be_ref, out_ref, in_buf, sem,
            *, K, T, T_pad, C, eps):
    pad = (K - 1) // 2
    n_chunks = T_pad // CHUNK
    b = pl.program_id(0)
    w = w_ref[:].astype(jnp.float32)        # (8, C), taps in rows 0..K-1
    bias = b_ref[:].astype(jnp.float32)     # (1, C)

    def _copy(ci, slot):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(ci * CHUNK, CHUNK + 2 * LPAD), :],
            in_buf.at[slot], sem.at[slot])

    _copy(0, 0).start()

    def pass_a(ci, carry):
        s, ss = carry
        start = ci * CHUNK
        slot = jax.lax.rem(ci, 2)
        # prefetch the next chunk into the other slot while computing
        @pl.when(ci + 1 < n_chunks)
        def _():
            _copy(ci + 1, 1 - slot).start()
        _copy(ci, slot).wait()
        win = in_buf[slot]
        acc = jnp.zeros((CHUNK, C), jnp.float32)
        for k in range(K):
            # out[t] = sum_k w[k] * x[t - pad + k]; x holds LPAD zero
            # rows up front, so the tap row is start + LPAD - pad + k —
            # a STATIC in-window offset Mosaic lowers to sublane shifts
            off = (LPAD - pad) + k
            tap = jax.lax.slice_in_dim(win, off, off + CHUNK, axis=0)
            acc = acc + tap.astype(jnp.float32) * w[k][None, :]
        acc = acc + bias
        # rows >= T are padding (conv output = bias there): mask from moments
        row = start + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        acc_m = jnp.where(row < T, acc, 0.0)
        # stash raw conv in out_ref; pass B normalizes it in place
        out_ref[0, pl.ds(start, CHUNK), :] = acc.astype(out_ref.dtype)
        return s + jnp.sum(acc_m), ss + jnp.sum(acc_m * acc_m)

    s, ss = jax.lax.fori_loop(
        0, n_chunks, pass_a, (jnp.float32(0.0), jnp.float32(0.0)))

    n = jnp.float32(T * C)
    mean = s / n
    rstd = jax.lax.rsqrt(ss / n - mean * mean + eps)
    gam = g_ref[:].astype(jnp.float32)      # (1, C)
    bet = be_ref[:].astype(jnp.float32)     # (1, C)

    def pass_b(ci, _):
        start = ci * CHUNK
        y = out_ref[0, pl.ds(start, CHUNK), :].astype(jnp.float32)
        out_ref[0, pl.ds(start, CHUNK), :] = \
            ((y - mean) * rstd * gam + bet).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, pass_b, 0)


def dw_conv_glob_ln_chunked(x, weight, bias, gamma, beta, *, eps=1e-8):
    """x (B, T, C) -> depthwise conv (stride 1, 'same') + GlobLN, (B, T, C).

    weight: (C, 1, K) torch depthwise layout; bias/gamma/beta: (C,).
    """
    B, T, C = x.shape
    K = weight.shape[-1]
    T_pad = ((T + CHUNK - 1) // CHUNK) * CHUNK
    # LPAD aligned zero rows in front; enough tail for the last chunk's taps
    x_p = jnp.pad(x, ((0, 0), (LPAD, T_pad - T + LPAD), (0, 0)))
    w = jnp.zeros((8, C), x.dtype).at[:K].set(weight[:, 0, :].T)
    out = pl.pallas_call(
        partial(_kernel, K=K, T=T, T_pad=T_pad, C=C, eps=eps),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # streamed via DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T_pad, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, CHUNK + 2 * LPAD, C), x.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=jax.default_backend() != "tpu",
    )(x_p, w, bias.reshape(1, C).astype(x.dtype),
      gamma.reshape(1, C).astype(x.dtype),
      beta.reshape(1, C).astype(x.dtype))
    return out[:, :T]
