"""Tensor/shape utilities (reference: utils/torch_utils.py:12-49,
utils/nets_utils.py:64-272, utils/lightning_utils.py:28-30)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def honor_jax_platforms_env():
    """Re-assert ``os.environ['JAX_PLATFORMS']`` as jax config.

    In this container the axon sitecustomize's PJRT-plugin registration
    overwrites ``jax_platforms`` to ``"axon,cpu"`` at interpreter start
    (axon/register/pjrt.py), so the standard env knob is silently
    ignored — and when the TPU tunnel is wedged, even a CPU-only
    subprocess (``JAX_PLATFORMS=cpu python bench.py``) hangs at its
    first device use while jax dials the dead axon backend. Entry
    scripts call this before touching devices; it is a no-op when the
    env var is unset or in a standard JAX install (where the env was
    already honored)."""
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        jax.config.update("jax_platforms", platforms)


def pad_x_to_y(x, y, axis: int = -1):
    """Right-pad or trim ``x`` to match ``y``'s length on ``axis``
    (torch_utils.py:12-30)."""
    if axis != -1:
        raise NotImplementedError
    inp_len = y.shape[axis]
    out_len = x.shape[axis]
    if out_len >= inp_len:
        return x[..., :inp_len]
    pads = [(0, 0)] * (x.ndim - 1) + [(0, inp_len - out_len)]
    return jnp.pad(x, pads)


def shape_reconstructed(reconstructed, size):
    """Reshape (B, 1, T) -> (B, T) (torch_utils.py:33-49)."""
    if len(size) == 1:
        return reconstructed.squeeze(0)
    return reconstructed


def tensors_to_device(tensors, device):
    """Recursively device_put arrays (torch_utils.py:36-49)."""
    if isinstance(tensors, (np.ndarray, jnp.ndarray)):
        return jax.device_put(jnp.asarray(tensors), device)
    if isinstance(tensors, (list, tuple)):
        return type(tensors)(tensors_to_device(t, device) for t in tensors)
    if isinstance(tensors, dict):
        return {k: tensors_to_device(v, device) for k, v in tensors.items()}
    return tensors


def make_pad_mask(lengths, max_len=None):
    """True at padded positions (nets_utils.py:64-170): (B,) -> (B, T)."""
    lengths = jnp.asarray(lengths)
    if max_len is None:
        max_len = int(jnp.max(lengths))
    idx = jnp.arange(max_len)[None, :]
    return idx >= lengths[:, None]


def make_non_pad_mask(lengths, max_len=None):
    """True at valid positions (nets_utils.py:173-272)."""
    return ~make_pad_mask(lengths, max_len)


def pad_list(xs, pad_value=0.0):
    """Stack variable-length 1-D arrays with right padding
    (nets_utils.py:34-61)."""
    n = len(xs)
    max_len = max(x.shape[0] for x in xs)
    out = np.full((n, max_len) + xs[0].shape[1:], pad_value,
                  dtype=xs[0].dtype)
    for i, x in enumerate(xs):
        out[i, :x.shape[0]] = x
    return out


def get_activation(act: str):
    """Activation-by-name (nets_utils.py:490-502 / get_layer_from_string)."""
    table = {
        "relu": jax.nn.relu, "gelu": jax.nn.gelu, "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh, "silu": jax.nn.silu, "swish": jax.nn.silu,
        "elu": jax.nn.elu, "softplus": jax.nn.softplus,
        "leaky_relu": jax.nn.leaky_relu, "identity": lambda x: x,
        "hardtanh": lambda x: jnp.clip(x, -1.0, 1.0),
    }
    if act.lower() not in table:
        raise ValueError(f"Unknown activation {act!r}")
    return table[act.lower()]


_PRINTED_RANK = {"is_zero": True}


def print_only(*args, **kwargs):
    """Rank-zero printing (lightning_utils.py:28-30). With jax.distributed,
    only process 0 prints."""
    import jax
    if jax.process_index() == 0:
        print(*args, **kwargs)
