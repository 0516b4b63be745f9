"""Streaming separator: incremental output equals the offline stitcher."""
import numpy as np

import jax

from tdanet_tpu.models import TDANetBest
from tdanet_tpu.serving import MultiStreamSeparator, StreamingSeparator
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


def test_multistream_matches_single_stream():
    """N concurrent streams through one batched dispatch produce exactly
    what each would produce through its own StreamingSeparator (vmap
    keeps batch=1 semantics; stitch state is per-stream)."""
    model, params = build()
    rng = np.random.default_rng(1)
    n_streams, T = 3, int(SR * 2.6)
    wavs = [(rng.standard_normal(T) * 0.1).astype(np.float32)
            for _ in range(n_streams)]

    multi = MultiStreamSeparator(model, params, max_streams=4,
                                 segment=1.0, overlap=0.25, sample_rate=SR)
    got = {i: [] for i in range(n_streams)}
    for i, w in enumerate(wavs):
        multi.open(i)
    # interleaved pushes of uneven chunk sizes, stepping as we go
    pos = [0] * n_streams
    sizes = (1000, 3777, 5000, 200, 9000, T)
    for k, size in enumerate(sizes):
        for i, w in enumerate(wavs):
            if pos[i] < T:
                chunk = w[pos[i]:pos[i] + size + 531 * i]
                pos[i] += len(chunk)
                multi.push(i, chunk)
        while True:
            out = multi.step()
            if not out:
                break
            for i, o in out.items():
                got[i].append(o)
    for i in range(n_streams):
        got[i].append(multi.flush(i))

    for i, w in enumerate(wavs):
        single = StreamingSeparator(model, params, segment=1.0,
                                    overlap=0.25, sample_rate=SR)
        want = np.concatenate([single.push(w), single.flush()], axis=1)
        have = np.concatenate(got[i], axis=1)
        assert have.shape == want.shape
        np.testing.assert_allclose(have, want, rtol=1e-4, atol=1e-5)


def test_multistream_int16_emission():
    """emit_dtype='int16' returns device-quantized PCM equal to the f32
    path within one quantization step, with identical stitching."""
    model, params = build()
    rng = np.random.default_rng(2)
    T = int(SR * 1.8)
    w = (rng.standard_normal(T) * 0.05).astype(np.float32)

    outs = {}
    for dt in ("float32", "int16"):
        m = MultiStreamSeparator(model, params, max_streams=2, segment=1.0,
                                 overlap=0.25, sample_rate=SR,
                                 emit_dtype=dt)
        m.open(0)
        m.push(0, w)
        parts = []
        while True:
            o = m.step()
            if not o:
                break
            parts.append(o[0])
        parts.append(m.flush(0))
        outs[dt] = np.concatenate(parts, axis=1)
    assert outs["int16"].dtype == np.int16
    got = outs["int16"].astype(np.float32) / 32767.0
    np.testing.assert_allclose(got, np.clip(outs["float32"], -1, 1),
                               atol=1.0 / 32767.0)


def test_multistream_overflow_and_capacity():
    model, params = build()
    multi = MultiStreamSeparator(model, params, max_streams=2,
                                 segment=1.0, overlap=0.25, sample_rate=SR)
    multi.open("a")
    multi.open("b")
    try:
        multi.open("c")
        assert False, "expected capacity error"
    except ValueError:
        pass
    # re-opening a live stream must raise, not silently drop its
    # buffered samples and stitch tails (and not hit the capacity error)
    try:
        multi.open("a")
        assert False, "expected already-open error"
    except ValueError as e:
        assert "already open" in str(e)
    # a backlog of several segments drains over repeated steps
    multi.push("a", np.zeros(SR * 3, np.float32))
    total = 0
    while True:
        out = multi.step()
        if not out:
            break
        total += out["a"].shape[1]
    assert total > 0
    multi.flush("a")
    multi.flush("b")
    assert multi._streams == {}


def test_streaming_incremental_latency():
    model, params = build()
    stream = StreamingSeparator(model, params, segment=1.0, overlap=0.25,
                                sample_rate=SR)
    # less than one segment -> nothing finalized yet
    out = stream.push(np.zeros(SR // 2, np.float32))
    assert out.shape == (2, 0)
    out = stream.push(np.zeros(SR // 2, np.float32))
    assert out.shape == (2, SR)  # first full segment emitted entirely


def test_async_batch_server_matches_batched_path():
    """AsyncBatchServer futures must resolve to the same audio as the
    synchronous bucketed eval path, across mixed lengths submitted
    concurrently, and coalesce them into few dispatches."""
    from tdanet_tpu.serving import AsyncBatchServer
    from tdanet_tpu.utils.separator import separate_batched

    model, params = build()
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(T).astype(np.float32) * 0.1
            for T in (SR, SR, SR + 123, SR, SR + 123, SR)]
    want = separate_batched(model, params, wavs, batch_size=4)

    server = AsyncBatchServer(model, params, max_batch=4, max_wait_ms=50)
    try:
        futs = [server.submit(w) for w in wavs]
        got = [f.result(timeout=120) for f in futs]
    finally:
        server.close()
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-5)


def test_async_batch_server_error_propagates():
    """Malformed requests raise AT submit() (a 2-D or empty row would
    otherwise blow up batch assembly on the dispatch thread, killing it
    and hanging every other client) — and the server keeps serving
    afterwards."""
    import pytest

    from tdanet_tpu.serving import AsyncBatchServer
    model, params = build()
    server = AsyncBatchServer(model, params, max_batch=2, max_wait_ms=1)
    try:
        with pytest.raises(ValueError, match="mono"):
            server.submit(np.zeros((0,), np.float32))  # empty audio
        with pytest.raises(ValueError, match="mono"):
            server.submit(np.zeros((2, SR), np.float32))  # stacked chans
        ok = server.separate(
            np.random.default_rng(1).standard_normal(SR)
            .astype(np.float32) * 0.1, timeout=120)
        assert ok.shape[0] == 2
    finally:
        server.close()


def test_multistream_flush_without_step_drains_backlog():
    """flush() on a stream holding MORE than one full segment (client
    never called step()) must separate the backlog, not crash on a
    negative pad or drop audio."""
    model, params = build()
    multi = MultiStreamSeparator(model, params, max_streams=2, segment=1.0,
                                 overlap=0.25, sample_rate=SR)
    rng = np.random.default_rng(7)
    T = int(SR * 2.4)  # > 2 segments buffered
    multi.open("a")
    multi.push("a", rng.standard_normal(T).astype(np.float32) * 0.1)
    out = multi.flush("a")
    assert out.shape == (2, T)

    # exact single-segment boundary is the other historical edge
    multi.open("b")
    multi.push("b", rng.standard_normal(multi.seg_len)
               .astype(np.float32) * 0.1)
    out = multi.flush("b")
    assert out.shape == (2, multi.seg_len)

    # flush's batched backlog dispatch must emit exactly what the
    # incremental step() path emits for the same audio (rows are
    # independent under the vmapped forward)
    wav = rng.standard_normal(T).astype(np.float32) * 0.1
    multi.open("inc")
    multi.push("inc", wav)
    parts = []
    while True:
        got = multi.step()
        if not got:
            break
        parts.append(got["inc"])
    parts.append(multi.flush("inc"))
    incremental = np.concatenate(parts, axis=1)
    multi.open("cold")
    multi.push("cold", wav)
    cold = multi.flush("cold")
    np.testing.assert_array_equal(cold, incremental)


def test_async_batch_server_close_resolves_queued_and_rejects_new():
    from tdanet_tpu.serving import AsyncBatchServer
    model, params = build()
    server = AsyncBatchServer(model, params, max_batch=2, max_wait_ms=1)
    rng = np.random.default_rng(8)
    # resolve one normally so the worker is warm
    server.separate(rng.standard_normal(SR).astype(np.float32) * 0.1,
                    timeout=300)
    futs = [server.submit(rng.standard_normal(SR).astype(np.float32) * 0.1)
            for _ in range(3)]
    server.close()
    for f in futs:
        try:
            r = f.result(timeout=60)  # either separated before close...
            assert r.shape[0] == 2
        except RuntimeError:
            pass  # ...or resolved with the closed-server error — never hangs
    import pytest
    with pytest.raises(RuntimeError):
        server.submit(np.zeros(SR, np.float32))


def test_mesh_sharded_serving_matches_single_device():
    """dp scale-out (beyond reference): the padded batch axis shards
    over the mesh's 'dp' devices with replicated params; results must
    equal the single-device engines exactly (same program, same
    per-utterance vmap semantics, just partitioned)."""
    from tdanet_tpu.parallel.mesh import make_mesh
    from tdanet_tpu.serving import AsyncBatchServer, BatchSeparationServer

    model, params = build()
    rng = np.random.default_rng(11)
    wavs = [(rng.standard_normal(int(SR * s)) * 0.1).astype(np.float32)
            for s in (1.0, 1.3, 0.8, 1.0, 1.1, 0.9)]
    want = BatchSeparationServer(model, params, batch_size=4).separate(wavs)

    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    got = BatchSeparationServer(model, params, batch_size=4,
                                mesh=mesh).separate(wavs)
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-5)

    server = AsyncBatchServer(model, params, max_batch=4, max_wait_ms=2,
                              mesh=mesh)
    try:
        futs = [server.submit(w) for w in wavs]
        for f, w in zip(futs, want):
            np.testing.assert_allclose(f.result(timeout=300), w,
                                       rtol=1e-4, atol=1e-5)
    finally:
        server.close()

    import pytest
    with pytest.raises(ValueError):
        AsyncBatchServer(model, params, max_batch=6, mesh=mesh)


def test_async_batch_server_adaptive_grows_under_overload():
    """Adaptive batch sizing: under a standing queue the dispatch size
    must climb the ladder toward max_batch (VERDICT r3 #2 — the B=8
    saturation point left ~1.7x on the table vs B=24), results must be
    identical to the synchronous bucketed path, and the rung must fall
    back down when traffic thins."""
    from tdanet_tpu.serving import AsyncBatchServer
    from tdanet_tpu.utils.separator import separate_batched

    model, params = build()
    rng = np.random.default_rng(3)
    wavs = [(rng.standard_normal(SR) * 0.1).astype(np.float32)
            for _ in range(40)]
    want = separate_batched(model, params, wavs, batch_size=8)

    server = AsyncBatchServer(model, params, max_batch=8, max_wait_ms=2,
                              adaptive=True, min_batch=2)
    assert server._ladder == [2, 4, 8]
    try:
        futs = [server.submit(w) for w in wavs]  # storm: queue stands
        got = [f.result(timeout=300) for f in futs]
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-5)
        # 40 queued requests against a rung-0 cap of 2 guarantee >=2
        # consecutive full coalesces with backlog -> the rung grew
        assert server.stats["rung_highwater"] >= 1, server.stats
        assert server.stats["rows"] == 40

        # thin traffic: one lone request per coalesce shrinks the rung
        # back to 0 (never pays big-batch padded latency when idle)
        import time
        for _ in range(12):
            server.separate(wavs[0], timeout=300)
            time.sleep(0.01)
        assert server._rung == 0, (server._rung, server.stats)
    finally:
        server.close()


def test_async_batch_server_adaptive_mesh_validates_min_batch():
    """Adaptive + dp mesh: every ladder rung must shard evenly, so
    min_batch must be a multiple of dp; a valid ladder serves correctly."""
    import pytest

    from tdanet_tpu.parallel.mesh import make_mesh
    from tdanet_tpu.serving import AsyncBatchServer
    from tdanet_tpu.utils.separator import separate_batched

    model, params = build()
    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="min_batch"):
        AsyncBatchServer(model, params, max_batch=8, mesh=mesh,
                         adaptive=True, min_batch=2)

    rng = np.random.default_rng(5)
    wavs = [(rng.standard_normal(SR) * 0.1).astype(np.float32)
            for _ in range(16)]
    want = separate_batched(model, params, wavs, batch_size=8)
    server = AsyncBatchServer(model, params, max_batch=8, max_wait_ms=2,
                              mesh=mesh, adaptive=True, min_batch=4)
    try:
        futs = [server.submit(w) for w in wavs]
        for f, w in zip(futs, want):
            np.testing.assert_allclose(f.result(timeout=300), w,
                                       rtol=1e-4, atol=1e-5)
    finally:
        server.close()

def test_adaptive_right_size_dispatch_and_sticky_shrink():
    """Round-4 policy fixes, pinned white-box (the mid-overload dip:
    109.8x at 157x offered vs 140.7x fixed-B — docs/SERVING.md):

    1. a group smaller than the current rung dispatches through the
       smallest READY rung that fits it (padding rows burn real device
       time — never ship a half-filled coalesce through the big
       program);
    2. a coalesce that would NOT have fit the lower rung is not
       evidence for shrinking (n=6 at rung 8 is still >4-deep traffic;
       shrinking on it oscillated 8<->16 right at the rung boundary).
    """
    from tdanet_tpu.serving import AsyncBatchServer

    model, params = build()
    server = AsyncBatchServer(model, params, max_batch=8, max_wait_ms=2,
                              adaptive=True, min_batch=2)
    assert server._ladder == [2, 4, 8]
    try:
        target = 8000

        # force the top rung, as after a sustained overload
        server._rung = 2

        # (1) n=2 fits rung 0: must come back B=2 (rung 0 builds
        # synchronously, so it is always READY) — not B=8
        B, fwd, err = server._pick_fwd(target, n=2)
        assert err is None and fwd is not None
        assert B == 2, B

        # n=8 needs the top rung; until its background compile lands,
        # the synchronous rung-0 baseline serves (chunked dispatch)
        B, _, _ = server._pick_fwd(target, n=8)
        assert B in (2, 8), B

        # (2) shrink accounting: with the queue empty, an n=6 coalesce
        # at rung 8 must NOT count toward shrinking (6 > ladder[1]=4)...
        server._rung = 2
        server._idle = 0
        for _ in range(8):
            server._adapt(6)
        assert server._rung == 2, server._rung
        # ...but four consecutive coalesces that fit the lower rung do
        for _ in range(4):
            server._adapt(3)
        assert server._rung == 1, server._rung
        for _ in range(4):
            server._adapt(1)
        assert server._rung == 0, server._rung
    finally:
        server.close()


def test_async_batch_server_length_buckets():
    """2-D padding ladder, length axis: variable-length submissions route
    to the configured coarse buckets (one program per bucket instead of
    one per lattice length); a wav longer than the largest bucket falls
    back to exact lattice padding. Semantics: pad-to-bucket, separate,
    trim + renorm over the true region — the same pad-and-trim
    convention the lattice bucketing already uses, at coarser
    granularity (GlobLN stats see the padding, so this is checked
    against the pad-to-bucket oracle, NOT the exact-length forward;
    the quality cost of the coarser padding is measured on the
    converged checkpoint in docs/SERVING.md)."""
    from tdanet_tpu.serving import AsyncBatchServer
    from tdanet_tpu.utils.separator import trim_renorm

    model, params = build()
    rng = np.random.default_rng(1)
    lengths = [SR // 2, SR - 321, SR + 123, 2 * SR - 7, SR // 3,
               3 * SR + 17]  # last one: beyond the largest bucket
    wavs = [rng.standard_normal(T).astype(np.float32) * 0.1
            for T in lengths]

    server = AsyncBatchServer(model, params, max_batch=4, max_wait_ms=50,
                              length_buckets=[SR, 2 * SR])
    lattice = server.lattice

    def oracle(wav):
        t = -(-wav.shape[-1] // lattice) * lattice
        for b in server.length_buckets:
            if b >= t:
                t = b
                break
        x = np.zeros((1, t), np.float32)
        x[0, :wav.shape[-1]] = wav
        est = np.asarray(model.apply(params, jnp.asarray(x))[0])
        return trim_renorm(wav, est)

    import jax.numpy as jnp
    want = [oracle(w) for w in wavs]
    try:
        server.prewarm()  # compiles the (2 buckets x 1 rung) grid
        assert len(server._fwd_cache) == 2
        futs = [server.submit(w) for w in wavs]
        got = [f.result(timeout=120) for f in futs]
        # every request at/below 2 s went through a bucket program; only
        # the 3 s outlier added an exact-lattice program
        targets = {t for t, _ in server._fwd_cache}
        assert set(server.length_buckets) <= targets
        assert len(targets) == 3, targets
    finally:
        server.close()
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-5)


def test_async_batch_server_deadline_sheds_stale():
    """Deadline-aware admission: requests older than deadline_ms at
    dispatch time resolve with DeadlineExceeded instead of consuming
    device time; fresh requests still succeed."""
    import time as _time

    from tdanet_tpu.serving import AsyncBatchServer, DeadlineExceeded

    model, params = build()
    rng = np.random.default_rng(2)
    wav = rng.standard_normal(SR).astype(np.float32) * 0.1

    server = AsyncBatchServer(model, params, max_batch=2, max_wait_ms=1,
                              deadline_ms=200.0)
    try:
        # first request warms the compile; the SECOND one, submitted
        # right behind it, ages past the deadline while the compile runs
        f0 = server.submit(wav)
        _time.sleep(0.02)
        f1 = server.submit(wav)
        r0 = f0.result(timeout=120)
        assert r0.shape == (2, SR)
        # f1 was dispatched after f0's compile (>> 200 ms) — shed
        try:
            f1.result(timeout=120)
            shed = False
        except DeadlineExceeded:
            shed = True
        assert shed, "stale request was not shed"
        assert server.stats_shed >= 1
        # a fresh request after warm-up completes fine
        r2 = server.separate(wav, timeout=120)
        np.testing.assert_allclose(r2, r0, rtol=1e-5, atol=1e-6)
    finally:
        server.close()
