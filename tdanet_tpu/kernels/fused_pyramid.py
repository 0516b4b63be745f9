"""Fused depthwise-conv + GlobLN Pallas kernel (inference fast path).

One UConvBlock pyramid stage = depthwise k=5 conv (stride 1 or 2) then a
GlobLN over (T, C) (TDANet_best.py:306-327,47-64). In XLA this is ~4 HBM
round-trips of a (B, 512, T) tensor; here each batch element runs as one
grid program holding its (T, C) tile in VMEM: conv via sublane shifts,
the two global reductions and the normalize in-register — a single HBM
read + write per stage.

Channels-last (T, C): C=512 is an exact lane multiple; time shifts are
sublane moves. Exposed as ``dw_conv_glob_ln(x, w, b, gamma, beta,
stride)`` on (B, T, C); interpret-mode off TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, g_ref, be_ref, out_ref, xpad_ref, *, K,
            stride, T, T_out, eps):
    pad = (K - 1) // 2
    # materialize the zero-padded tile once in VMEM scratch
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    xpad_ref[pad:pad + T] = x_ref[0]
    w = w_ref[:]                                   # (K, C)
    acc = None
    if stride == 1:
        for k in range(K):
            rows = xpad_ref[k:k + T_out]   # lazy ref window, unit stride
            term = rows * w[k][None, :]
            acc = term if acc is None else acc + term
    else:
        # Mosaic only supports unit-stride vector slices: decimate via an
        # even/odd phase view of the scratch (stride must be 2)
        C = xpad_ref.shape[-1]
        half = xpad_ref.shape[0] // 2
        for k in range(K):
            phase = k % 2
            start = k // 2
            block = xpad_ref[2 * start + phase:
                             2 * (start + T_out) + phase]
            rows = block[: 2 * T_out].reshape(T_out, 2, C)[:, 0, :]
            term = rows * w[k][None, :]
            acc = term if acc is None else acc + term
    y = acc + b_ref[:][None, :]
    # GlobLN over (T_out, C) in fp32
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf)
    var = jnp.mean(jnp.square(yf - mean))
    normed = (yf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * g_ref[:][None, :].astype(jnp.float32) \
        + be_ref[:][None, :].astype(jnp.float32)
    out_ref[0] = out.astype(y.dtype)


def dw_conv_glob_ln(x, weight, bias, gamma, beta, *, stride=1, K=5,
                    eps=1e-8):
    """x (B, T, C); weight (C, 1, K) torch layout; returns (B, T_out, C).

    padding = (K-1)//2, matching DilatedConvNorm (TDANet_best.py:165-192).
    """
    B, T, C = x.shape
    pad = (K - 1) // 2
    T_out = (T + 2 * pad - K) // stride + 1
    w = weight[:, 0, :].T.astype(x.dtype)          # (K, C)
    return pl.pallas_call(
        partial(_kernel, K=K, stride=stride, T=T, T_out=T_out, eps=eps),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T_out, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_out, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((2 * ((T + 2 * pad) // 2 + 4), C),
                                   x.dtype)],
        interpret=jax.default_backend() != "tpu",
    )(x, w, bias.astype(x.dtype), gamma.astype(x.dtype),
      beta.astype(x.dtype))
