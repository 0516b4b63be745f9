"""Fused depthwise-conv+GlobLN Pallas kernel: correctness vs the ops
reference (CPU interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdanet_tpu import ops
from tdanet_tpu.kernels.fused_pyramid import dw_conv_glob_ln


@pytest.mark.parametrize("stride,T", [(1, 101), (2, 101), (1, 64), (2, 65)])
def test_matches_ops_reference(stride, T):
    C = 64
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, C, T))
    w = jax.random.normal(jax.random.fold_in(key, 1), (C, 1, 5)) * 0.2
    b = jax.random.normal(jax.random.fold_in(key, 2), (C,)) * 0.1
    g = jax.random.normal(jax.random.fold_in(key, 3), (C,))
    be = jax.random.normal(jax.random.fold_in(key, 4), (C,))
    want = ops.glob_ln(
        ops.conv1d(x, {"weight": w, "bias": b}, stride=stride, padding=2,
                   groups=C), {"gamma": g, "beta": be})
    got = dw_conv_glob_ln(x.transpose(0, 2, 1), w, b, g, be, stride=stride)
    np.testing.assert_allclose(np.asarray(got.transpose(0, 2, 1)),
                               np.asarray(want), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("T", [700, 512, 513])
def test_chunked_streaming_matches_ops_reference(T):
    """DMA-streaming two-pass variant (kernels/fused_pyramid_chunked.py):
    stride-1 'same' conv + GlobLN, chunk-boundary and tail handling."""
    from tdanet_tpu.kernels.fused_pyramid_chunked import (
        dw_conv_glob_ln_chunked)
    C, K = 64, 5
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, T, C))
    w = jax.random.normal(jax.random.fold_in(key, 1), (C, 1, K)) * 0.2
    b = jax.random.normal(jax.random.fold_in(key, 2), (C,)) * 0.1
    g = jax.random.normal(jax.random.fold_in(key, 3), (C,))
    be = jax.random.normal(jax.random.fold_in(key, 4), (C,))
    xn = jnp.transpose(x, (0, 2, 1))
    want = ops.glob_ln(
        ops.conv1d(xn, {"weight": w, "bias": b}, stride=1, padding=K // 2,
                   groups=C), {"gamma": g, "beta": be})
    got = jnp.transpose(dw_conv_glob_ln_chunked(x, w, b, g, be), (0, 2, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
