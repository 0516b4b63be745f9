"""Sequence-parallel (sp) long-form inference — shard TIME over the mesh.

Beyond the reference (whose long-form story is chunk + stitch,
audio_test_css.py:104-137): run ONE full-utterance TDANet forward with
the time axis sharded across devices, so a 60 s+ mixture that would
blow a single chip's HBM — or serve too slowly — is separated by the
whole slice with XLA inserting the communication:

- depthwise/strided convs  -> spatially partitioned with halo exchanges
- GlobLN statistics        -> cross-device all-reduce (exact, not per-shard)
- adaptive-pool global sum -> sharded-contraction matmul + psum
- the coarse-scale GA transformer: its sequence is T/16 — tiny — so the
  partitioner may gather it; that traffic is negligible by design.

This is the scaling-book recipe verbatim: choose a mesh, annotate the
argument shardings, let GSPMD insert the collectives. Model code is
unchanged — correctness is layout-independent, pinned by
tests/test_sequence_parallel.py (sp=8 forward == single-device forward
of the same padded input, CPU mesh).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sp_mesh(n: int | None = None, devices=None) -> Mesh:
    """1-D mesh with a single 'sp' (sequence/spatial) axis."""
    devices = devices if devices is not None else jax.devices()
    if n is not None:
        devices = devices[:n]
    return Mesh(np.asarray(devices), ("sp",))


def pad_for_sp(wav, model, n_sp: int):
    """Right-pad so the padded length is lattice-aligned AND sample count
    divides the sp axis (frames then divide it too: the encoder stride
    divides the per-device sample slab). Returns (padded, orig_len)."""
    T = wav.shape[-1]
    unit = int(np.lcm(model.lcm, n_sp * model.enc_kernel_size))
    Tp = -(-T // unit) * unit
    pad = [(0, 0)] * (wav.ndim - 1) + [(0, Tp - T)]
    return jnp.pad(wav, pad), T


def separate_sp(model, params, wav, mesh: Mesh | None = None,
                compute_dtype=None):
    """Separate one long mixture with time sharded over ``mesh``'s 'sp'
    axis. ``wav``: (T,) or (1, T) float32. Returns (n_src, T) numpy.

    The forward itself is ``model.apply`` unchanged — only the input
    layout differs: samples sharded P('sp'), params replicated, output
    gathered. Numerics match the single-device forward of the same
    padded input (GlobLN statistics are global all-reduces, not
    per-shard approximations).
    """
    mesh = mesh if mesh is not None else make_sp_mesh()
    n_sp = mesh.shape["sp"]
    wav = jnp.asarray(wav, jnp.float32)
    if wav.ndim == 1:
        wav = wav[None]
    padded, orig = pad_for_sp(wav, model, n_sp)

    fwd, in_sh = _sp_forward(model, mesh, compute_dtype)
    est = fwd(params, jax.device_put(padded, in_sh))
    return np.asarray(est, np.float32)[0, :, :orig]


@lru_cache(maxsize=16)
def _sp_forward(model, mesh, compute_dtype):
    # one jitted program per (model, mesh, dtype): a fresh lambda per
    # separate_sp call would retrace — and on TPU recompile, minutes —
    # once per utterance in the `audio_test_css.py --mode sp` loop
    in_sh = NamedSharding(mesh, P(None, "sp"))
    rep = NamedSharding(mesh, P())
    fwd = jax.jit(
        lambda p, x: model.apply(p, x, compute_dtype=compute_dtype),
        in_shardings=(rep, in_sh), out_shardings=rep)
    return fwd, in_sh
