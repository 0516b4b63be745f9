"""Fidelity tests for the fused UConvBlock kernels (interpret mode on CPU)
against the reference-faithful components.py path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdanet_tpu.models.components import UConvBlock
from tdanet_tpu.kernels import uconv_block as uk


def _block_and_params(depth=5, C_out=64, C_in=128, seed=0):
    blk = UConvBlock(out_channels=C_out, in_channels=C_in,
                     upsampling_depth=depth)
    params = blk.init(jax.random.PRNGKey(seed))
    return blk, params


def _ops_pyramid(blk, params, x):
    """The components.py forward up to (scales, pooled-sum)."""
    from tdanet_tpu import ops
    output1 = blk.proj_1x1.apply(params["proj_1x1"], x)
    output = [blk.spp_dw[0].apply(params["spp_dw"]["0"], output1)]
    for k in range(1, blk.depth):
        output.append(blk.spp_dw[k].apply(params["spp_dw"][str(k)],
                                          output[-1]))
    coarsest = output[-1].shape[-1]
    global_f = output[-1]
    for fea in output[:-1]:
        global_f = global_f + ops.adaptive_avg_pool1d(fea, coarsest)
    return output, global_f


@pytest.mark.parametrize("T,depth", [(402, 5), (201, 4)])
def test_pyramid_fused_matches_ops(T, depth):
    blk, params = _block_and_params(depth=depth)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, T), jnp.float32)
    want_scales, want_pool = _ops_pyramid(blk, params, x)
    got_scales, got_pool = uk.pyramid_fused(x, params, depth=depth)
    assert len(got_scales) == depth
    for ws, gs in zip(want_scales, got_scales):
        assert gs.shape == ws.shape
        np.testing.assert_allclose(np.asarray(gs), np.asarray(ws),
                                   rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_pool), np.asarray(want_pool),
                               rtol=2e-3, atol=2e-4)


def _fused_block_forward(blk, params, x):
    """kernel A -> XLA GA -> kernel B, returning model-layout output."""
    import jax.numpy as jnp
    depth = blk.depth
    Ts = uk.scale_lengths(x.shape[-1], depth)
    scales_raw, g_raw = uk.pyramid_fused(x, params, depth=depth, raw=True)
    g = jnp.swapaxes(g_raw[:, :Ts[-1]], 1, 2)           # (B, C, Tg)
    g = blk.globalatt.apply(params["globalatt"], g)
    rows_g = g_raw.shape[1]
    g_raw = jnp.pad(jnp.swapaxes(g, 1, 2),
                    ((0, 0), (0, rows_g - Ts[-1]), (0, 0))).astype(
        scales_raw[0].dtype)
    rows0 = uk._pads(Ts[0])
    x_raw = jnp.pad(jnp.swapaxes(x, 1, 2),
                    ((0, 0), (uk.PAD, rows0 - Ts[0] - uk.PAD), (0, 0)))
    out_raw = uk.fuse_expand_fused(scales_raw, g_raw, x_raw, params, Ts=Ts)
    return jnp.swapaxes(out_raw[:, uk.PAD:uk.PAD + Ts[0]], 1, 2)


@pytest.mark.parametrize("T,depth", [(402, 5), (201, 4)])
def test_full_block_fused_matches_ops(T, depth):
    blk, params = _block_and_params(depth=depth)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, T), jnp.float32)
    want = blk.apply(params, x)
    got = _fused_block_forward(blk, params, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-4)


def test_full_block_fused_matmul_up2_matches():
    blk, params = _block_and_params(depth=5)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 402), jnp.float32)
    want = blk.apply(params, x)
    old = uk.UP2
    uk.UP2 = "matmul"
    try:
        got = _fused_block_forward(blk, params, x)
    finally:
        uk.UP2 = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-4)


def test_pyramid_fused_matmul_decimation_matches():
    blk, params = _block_and_params(depth=4)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 201), jnp.float32)
    want_scales, want_pool = _ops_pyramid(blk, params, x)
    old = uk.DECIMATE
    uk.DECIMATE = "matmul"
    try:
        got_scales, got_pool = uk.pyramid_fused(x, params, depth=4)
    finally:
        uk.DECIMATE = old
    for ws, gs in zip(want_scales, got_scales):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(ws),
                                   rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_pool), np.asarray(want_pool),
                               rtol=2e-3, atol=2e-4)
