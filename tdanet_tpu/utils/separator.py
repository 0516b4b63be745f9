"""High-level separation helpers (reference: utils/separator.py:27-75):
device-safe separate() with output energy renormalization, for numpy or
jax arrays, with jit caching bucketed on the model's stride lattice."""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp


@lru_cache(maxsize=64)
def _compiled_forward(model, length, compute_dtype):
    def fwd(params, wav):
        out = model.apply(params, wav, compute_dtype=compute_dtype)
        # energy renormalization (separator.py:63)
        scale = jnp.sum(jnp.abs(wav)) / (jnp.sum(jnp.abs(out)) + 1e-8)
        return out * scale
    return jax.jit(fwd)


def separate(model, params, wav, compute_dtype=None, lattice=None):
    """wav: (T,) or (B, T) numpy/jax -> separated (n_src, T)/(B, n_src, T).

    Variable lengths are bucketed up to the model's lattice so repeated
    calls share compiled programs; outputs are trimmed back.
    """
    is_numpy = isinstance(wav, np.ndarray)
    x = jnp.asarray(wav, jnp.float32)
    was_1d = x.ndim == 1
    if was_1d:
        x = x[None]
    T = x.shape[-1]
    lattice = lattice or getattr(model, "lcm", 1)
    target = -(-T // lattice) * lattice
    if target != T:
        x = jnp.pad(x, ((0, 0), (0, target - T)))
    fwd = _compiled_forward(model, target, compute_dtype)
    out = fwd(params, x)[..., :T]
    if was_1d:
        out = out[0]
    return np.asarray(out) if is_numpy else out
