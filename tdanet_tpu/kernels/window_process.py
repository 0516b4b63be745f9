"""Fused Swin window-process Pallas kernel (TPU parity with the
reference's only CUDA kernel, utils/kernels/window_process/
swin_window_process_kernel.cu + window_process.py:11-63).

Two fused ops with custom VJPs, exactly mirroring the four CUDA kernels:
- ``roll_and_window_partition(x, shift, ws)``:
  (B, H, W, C) -> (B*nH*nW, ws, ws, C), cyclic-shifting by -shift first;
- ``window_merge_and_roll(windows, shift, ws, H, W)``: the inverse.

Each op's backward is the other op with the opposite shift — the same
pairing the CUDA autograd Functions use.

Kernel shape: one grid step per batch image; the (H, W, C) tile lives in
VMEM, the cyclic shift is two in-register ``pltpu.roll``s, and the window
partition is a reshape/transpose — all VPU data movement fused into one
kernel launch with no HBM round-trips. Falls back to interpret mode off
TPU. An XLA reference implementation (``*_xla``) is kept as the test
oracle and as the default under jit where XLA fuses it equally well.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# XLA reference implementations (the oracle; also great under jit)
# ---------------------------------------------------------------------------


def window_partition_xla(x, window_size: int):
    B, H, W, C = x.shape
    x = x.reshape(B, H // window_size, window_size, W // window_size,
                  window_size, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size,
                                                 window_size, C)


def window_reverse_xla(windows, window_size: int, H: int, W: int):
    B = windows.shape[0] // (H * W // window_size // window_size)
    x = windows.reshape(B, H // window_size, W // window_size, window_size,
                        window_size, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def roll_and_window_partition_xla(x, shift_size: int, window_size: int):
    if shift_size > 0:
        x = jnp.roll(x, (-shift_size, -shift_size), axis=(1, 2))
    return window_partition_xla(x, window_size)


def window_merge_and_roll_xla(windows, shift_size: int, window_size: int,
                              H: int, W: int):
    x = window_reverse_xla(windows, window_size, H, W)
    if shift_size > 0:
        x = jnp.roll(x, (shift_size, shift_size), axis=(1, 2))
    return x


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _roll_partition_kernel(x_ref, out_ref, *, shift, ws, H, W, C):
    x = x_ref[0]                                   # (H, W, C)
    if shift > 0:
        # pltpu.roll requires non-negative shifts: -s == N - s (mod N)
        x = pltpu.roll(x, H - shift, 0)
        x = pltpu.roll(x, W - shift, 1)
    nH, nW = H // ws, W // ws
    out_ref[:] = (x.reshape(nH, ws, nW, ws, C)
                  .transpose(0, 2, 1, 3, 4)
                  .reshape(nH * nW, ws, ws, C))


def _merge_roll_kernel(w_ref, out_ref, *, shift, ws, H, W, C):
    nH, nW = H // ws, W // ws
    x = (w_ref[:].reshape(nH, nW, ws, ws, C)
         .transpose(0, 2, 1, 3, 4)
         .reshape(H, W, C))
    if shift > 0:
        x = pltpu.roll(x, shift, 0)
        x = pltpu.roll(x, shift, 1)
    out_ref[0] = x


def _use_interpret():
    return jax.default_backend() != "tpu"


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def roll_and_window_partition(x, shift_size: int, window_size: int):
    """(B, H, W, C) -> (B*nH*nW, ws, ws, C), fused cyclic shift."""
    B, H, W, C = x.shape
    ws = window_size
    nwin = (H // ws) * (W // ws)
    return pl.pallas_call(
        partial(_roll_partition_kernel, shift=shift_size, ws=ws, H=H, W=W,
                C=C),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nwin, ws, ws, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * nwin, ws, ws, C), x.dtype),
        interpret=_use_interpret(),
    )(x)


def _rwp_fwd(x, shift_size, window_size):
    return roll_and_window_partition(x, shift_size, window_size), x.shape


def _rwp_bwd(shift_size, window_size, shape, g):
    B, H, W, C = shape
    return (window_merge_and_roll(g, shift_size, window_size, H, W),)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def window_merge_and_roll(windows, shift_size: int, window_size: int,
                          H: int, W: int):
    """(B*nH*nW, ws, ws, C) -> (B, H, W, C), fused reverse shift."""
    ws = window_size
    C = windows.shape[-1]
    nwin = (H // ws) * (W // ws)
    B = windows.shape[0] // nwin
    return pl.pallas_call(
        partial(_merge_roll_kernel, shift=shift_size, ws=ws, H=H, W=W, C=C),
        grid=(B,),
        in_specs=[pl.BlockSpec((nwin, ws, ws, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), windows.dtype),
        interpret=_use_interpret(),
    )(windows)


def _wmr_fwd(windows, shift_size, window_size, H, W):
    return window_merge_and_roll(windows, shift_size, window_size, H, W), \
        None


def _wmr_bwd(shift_size, window_size, H, W, _, g):
    return (roll_and_window_partition(g, shift_size, window_size),)


roll_and_window_partition.defvjp(_rwp_fwd, _rwp_bwd)
window_merge_and_roll.defvjp(_wmr_fwd, _wmr_bwd)

# reference-API aliases (window_process.py:11,37)
WindowProcess = roll_and_window_partition
WindowProcessReverse = window_merge_and_roll
