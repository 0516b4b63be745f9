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


class trace:
    """Context manager around jax.profiler.trace (the TPU-native
    replacement for the reference's commented Lightning AdvancedProfiler,
    audio_train.py:37,183): writes a TensorBoard-viewable trace.

        with profiling.trace("/tmp/jax-trace"):
            train_step(...)
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def __enter__(self):
        import jax.profiler
        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        import jax.profiler
        jax.profiler.stop_trace()
        return False
