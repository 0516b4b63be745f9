"""FLOPs/params profiling (the reference prints thop MACs/params at train
start, audio_train.py:165-168; the TPU-native equivalent is XLA's own
cost analysis of the compiled program)."""

from __future__ import annotations

import numpy as np

import jax


def count_params(params) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params))


def count_flops(fn, *args) -> float:
    """FLOPs of the jitted ``fn(*args)`` per XLA cost analysis (compiled
    for the current default backend)."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def profile_model(model, params, example_input, compute_dtype=None):
    """Returns dict(params, flops, macs) for model.apply on the example."""
    flops = count_flops(
        lambda p, x: model.apply(p, x, compute_dtype=compute_dtype),
        params, example_input)
    return {"params": count_params(params), "flops": flops,
            "macs": flops / 2.0}
