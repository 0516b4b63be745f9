"""Early-exit (variable-depth) inference on the shared-weight recurrence:
apply-time ``num_blocks`` override must equal a model constructed at that
depth, and the serving engines must honor the knob."""
import numpy as np

import jax
import jax.numpy as jnp

from tdanet_tpu.models import TDANetBest
from tdanet_tpu.serving import AsyncBatchServer, StreamingSeparator

CFG = dict(out_channels=32, in_channels=64, upsampling_depth=4,
           enc_kernel_size=4, num_sources=2, sample_rate=8000)


def test_apply_override_matches_shallow_model():
    deep = TDANetBest(num_blocks=3, **CFG)
    shallow = TDANetBest(num_blocks=1, **CFG)
    params = deep.init(jax.random.PRNGKey(0))  # depth-independent tree
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 8000)).astype(np.float32) * 0.1)
    got = deep.apply(params, x, num_blocks=1)
    want = shallow.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # different depths genuinely differ
    full = deep.apply(params, x)
    assert np.abs(np.asarray(full) - np.asarray(got)).max() > 1e-4


def test_serving_engines_honor_num_blocks():
    model = TDANetBest(num_blocks=2, **CFG)
    params = model.init(jax.random.PRNGKey(1))
    wav = (np.random.default_rng(1).standard_normal(8000) * 0.1) \
        .astype(np.float32)

    ref = TDANetBest(num_blocks=1, **CFG)
    want = np.asarray(ref.apply(params, jnp.asarray(wav[None]))[0])

    stream = StreamingSeparator(model, params, segment=1.0, overlap=0.0,
                                sample_rate=8000, num_blocks=1)
    got = np.concatenate([stream.push(wav), stream.flush()], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # lattice-aligned length: the server pads requests up to the model
    # lattice, which shifts GlobLN statistics for non-aligned lengths —
    # orthogonal to the depth knob under test here
    T2 = model.lcm * (8000 // model.lcm + 1)
    wav2 = (np.random.default_rng(2).standard_normal(T2) * 0.1) \
        .astype(np.float32)
    want2 = np.asarray(ref.apply(params, jnp.asarray(wav2[None]))[0])
    srv = AsyncBatchServer(model, params, max_batch=2, max_wait_ms=1.0,
                           num_blocks=1)
    try:
        out = srv.separate(wav2, timeout=120)
        scale = np.abs(wav2).sum() / (np.abs(want2).sum() + 1e-8)
        np.testing.assert_allclose(out, want2 * scale, rtol=1e-4,
                                   atol=1e-5)
    finally:
        srv.close()


def test_depth_override_out_of_range_raises():
    """Depth 0 would silently run 1 iteration (the recurrence always
    executes once before the scan); depths beyond the trained count are
    untested extrapolation — both must fail loudly."""
    import pytest
    model = TDANetBest(num_blocks=2, **CFG)
    params = model.init(jax.random.PRNGKey(2))
    x = jnp.zeros((1, 8000), jnp.float32)
    for bad in (0, -1, 3):
        with pytest.raises(ValueError, match="n_iter"):
            model.apply(params, x, num_blocks=bad)
