"""Layer-from-string + invertible interface (reference:
utils/get_layer_from_string.py:6-42, utils/inversible_interface.py:7-12)."""

from __future__ import annotations

import jax

from tdanet_tpu import ops


_LAYER_TABLE = {
    # activations (functional)
    "relu": lambda: jax.nn.relu,
    "relu6": lambda: (lambda x: jax.numpy.clip(x, 0, 6)),
    "gelu": lambda: jax.nn.gelu,
    "sigmoid": lambda: jax.nn.sigmoid,
    "tanh": lambda: jax.numpy.tanh,
    "silu": lambda: jax.nn.silu,
    "elu": lambda: jax.nn.elu,
    "softmax": lambda: jax.nn.softmax,
    "leakyrelu": lambda: jax.nn.leaky_relu,
    "identity": lambda: (lambda x: x),
}


def get_layer(l_name, library=None):
    """Return a callable layer factory by (case-insensitive) name; mirrors
    getattr-over-torch.nn with a helpful error (get_layer_from_string.py)."""
    key = l_name.lower().replace("_", "")
    if library:
        fn = getattr(library, l_name, None)
        if fn is not None:
            return fn
    if key not in _LAYER_TABLE:
        raise NotImplementedError(
            f"Layer with name {l_name} not found. Available: "
            f"{sorted(_LAYER_TABLE)}")
    return _LAYER_TABLE[key]()


class InversibleInterface:
    """Protocol for invertible transforms (inversible_interface.py:7-12)."""

    def inverse(self, input, input_lengths=None):
        raise NotImplementedError
