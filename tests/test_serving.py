"""Streaming separator: incremental output equals the offline stitcher."""
import numpy as np

import jax

from tdanet_tpu.models import TDANetBest
from tdanet_tpu.serving import StreamingSeparator
from tdanet_tpu.utils.css import stitch_segments

SR = 8000


def build():
    model = TDANetBest(out_channels=32, in_channels=64, num_blocks=1,
                       upsampling_depth=4, enc_kernel_size=4,
                       num_sources=2, sample_rate=SR)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_streaming_matches_offline_stitcher():
    model, params = build()
    rng = np.random.default_rng(0)
    T = int(SR * 3.3)
    wav = (rng.standard_normal(T) * 0.1).astype(np.float32)

    segment, overlap = 1.0, 0.25
    seg_len = int(SR * segment)
    overlap_len = int(seg_len * overlap)
    hop = seg_len - overlap_len

    # offline reference: LibriCSS-style slicing + stitcher
    segs, start, pad_len = [], 0, 0
    while start < T:
        s = wav[start:start + seg_len]
        if start + seg_len > T:
            pad_len = start + seg_len - T
            s = np.concatenate([s, np.zeros(pad_len, np.float32)])
            start += pad_len
        segs.append(s)
        start += hop
    want = stitch_segments(model, params, segs, overlap_len)
    if pad_len:
        want = want[:, :-pad_len]

    # streaming: arbitrary chunk sizes
    stream = StreamingSeparator(model, params, segment=segment,
                                overlap=overlap, sample_rate=SR)
    outs = []
    pos = 0
    for chunk_size in (1000, 3777, 5000, 200, 9000, T):
        chunk = wav[pos:pos + chunk_size]
        pos += len(chunk)
        outs.append(stream.push(chunk))
        if pos >= T:
            break
    outs.append(stream.flush())
    got = np.concatenate(outs, axis=1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-3, atol=1e-4)


def test_streaming_incremental_latency():
    model, params = build()
    stream = StreamingSeparator(model, params, segment=1.0, overlap=0.25,
                                sample_rate=SR)
    # less than one segment -> nothing finalized yet
    out = stream.push(np.zeros(SR // 2, np.float32))
    assert out.shape == (2, 0)
    out = stream.push(np.zeros(SR // 2, np.float32))
    assert out.shape == (2, SR)  # first full segment emitted entirely
