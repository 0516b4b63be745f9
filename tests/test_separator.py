"""separate() / separate_batched(): bucketing, trimming, equivalence."""
import numpy as np

import jax

from tdanet_tpu.models import TDANetBest
from tdanet_tpu.utils import separate
from tdanet_tpu.utils.separator import separate_batched


def test_batched_matches_single():
    model = TDANetBest(out_channels=64, in_channels=128, num_blocks=1,
                       upsampling_depth=4, enc_kernel_size=4,
                       num_sources=2, sample_rate=8000)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(T).astype(np.float32) * 0.1
            for T in (4000, 4100, 5000, 4000, 8000)]
    singles = [np.asarray(separate(model, params, w)) for w in wavs]
    batched = separate_batched(model, params, wavs, batch_size=3)
    assert len(batched) == len(wavs)
    for s, b, w in zip(singles, batched, wavs):
        assert b.shape == (2, w.shape[-1])
        # same bucket length -> identical math modulo fp reassociation
        np.testing.assert_allclose(b, s, rtol=1e-3, atol=1e-4)


def test_streaming_matches_batched():
    """separate_batched_stream: same outputs as separate_batched, yielded
    in bucket order with IO/compute overlap (audio_test.py's fast path)."""
    from tdanet_tpu.utils.separator import separate_batched_stream
    model = TDANetBest(out_channels=64, in_channels=128, num_blocks=1,
                       upsampling_depth=4, enc_kernel_size=4,
                       num_sources=2, sample_rate=8000)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    wavs = [rng.standard_normal(T).astype(np.float32) * 0.1
            for T in (4000, 4100, 5000, 4000, 8000, 4096)]
    want = separate_batched(model, params, wavs, batch_size=3)
    got = {}
    loads = []
    for i, item, est in separate_batched_stream(
            model, params, [w.shape[-1] for w in wavs],
            lambda i: (wavs[i], None, f"utt{i}"), batch_size=3):
        assert item[2] == f"utt{i}"
        loads.append(i)
        got[i] = est
    assert sorted(loads) == list(range(len(wavs)))
    for i, w in enumerate(wavs):
        assert got[i].shape == (2, w.shape[-1])
        np.testing.assert_allclose(got[i], want[i], rtol=1e-5, atol=1e-6)


def test_streaming_mesh_sharded_matches_single_device():
    """--dp eval scale-out: the padded batch shards over a dp mesh with
    replicated params; outputs equal the unsharded stream."""
    from tdanet_tpu.parallel.mesh import make_mesh
    from tdanet_tpu.utils.separator import separate_batched_stream

    model = TDANetBest(out_channels=64, in_channels=128, num_blocks=1,
                       upsampling_depth=4, enc_kernel_size=4,
                       num_sources=2, sample_rate=8000)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    wavs = [rng.standard_normal(T).astype(np.float32) * 0.1
            for T in (4000, 4100, 5000, 4000, 8000, 4096)]
    lengths = [w.shape[-1] for w in wavs]
    get = lambda i: (wavs[i], None, f"utt{i}")
    want = {i: est for i, _, est in separate_batched_stream(
        model, params, lengths, get, batch_size=4)}
    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    n = 0
    for i, _, est in separate_batched_stream(
            model, params, lengths, get, batch_size=4, mesh=mesh):
        np.testing.assert_allclose(est, want[i], rtol=1e-4, atol=1e-5)
        n += 1
    assert n == len(wavs)
