"""Worker-recycle machinery: a mid-stream process handoff must drop zero
hops, repeat zero samples, and bound RSS per worker generation (the
documented answer to the axon client's ~250 KB/dispatch host leak —
docs/PERF.md soak section; machinery in tdanet_tpu/serving_worker.py)."""
import numpy as np
import pytest

import jax

from tdanet_tpu.models import TDANetBest
from tdanet_tpu.serving import MultiStreamSeparator
from tdanet_tpu.serving_worker import RecyclingMultiStreamSeparator

SR = 8000
MODEL_KW = dict(out_channels=32, in_channels=64, num_blocks=1,
                upsampling_depth=4, enc_kernel_size=4,
                num_sources=2, sample_rate=SR)
ENGINE_KW = dict(max_streams=2, segment=1.0, overlap=0.25, sample_rate=SR)


@pytest.fixture(scope="module")
def setup():
    model = TDANetBest(**MODEL_KW)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    wavs = {sid: (rng.standard_normal(int(SR * 4.6)) * 0.1)
            .astype(np.float32) for sid in ("a", "b")}
    return model, params, wavs


def _run(engine, wavs, chunk=3000):
    outs = {sid: [] for sid in wavs}
    for sid in wavs:
        engine.open(sid)
    pos = 0
    longest = max(len(w) for w in wavs.values())
    while pos < longest:
        for sid, w in wavs.items():
            if pos < len(w):
                engine.push(sid, w[pos:pos + chunk])
        pos += chunk
        stepped = engine.step()
        while stepped:  # drain multi-segment backlogs like a server would
            for sid, part in stepped.items():
                outs[sid].append(part)
            stepped = engine.step()
    for sid in wavs:
        outs[sid].append(engine.flush(sid))
    return {sid: np.concatenate(parts, axis=1)
            for sid, parts in outs.items()}


def test_recycle_mid_stream_bitexact_and_bounded_rss(setup):
    model, params, wavs = setup

    # in-process reference run
    ref_engine = MultiStreamSeparator(model, params, **ENGINE_KW)
    want = _run(ref_engine, wavs)

    # recycled run: a fresh worker process every 2 hops
    with RecyclingMultiStreamSeparator(
            "TDANetBest", MODEL_KW, params, max_steps_per_worker=2,
            platform="cpu", **ENGINE_KW) as eng:
        pids, rss = [eng.worker_pid], [eng.worker_rss_kb()]

        outs = {sid: [] for sid in wavs}
        for sid in wavs:
            eng.open(sid)
        pos, chunk = 0, 3000
        longest = max(len(w) for w in wavs.values())
        while pos < longest:
            for sid, w in wavs.items():
                if pos < len(w):
                    eng.push(sid, w[pos:pos + chunk])
            pos += chunk
            stepped = eng.step()
            while stepped:
                for sid, part in stepped.items():
                    outs[sid].append(part)
                stepped = eng.step()
            if eng.worker_pid != pids[-1]:
                pids.append(eng.worker_pid)
                rss.append(eng.worker_rss_kb())
        for sid in wavs:
            outs[sid].append(eng.flush(sid))
        got = {sid: np.concatenate(parts, axis=1)
               for sid, parts in outs.items()}
        generations = eng.generation

    # >= 2 recycles actually happened, each in a fresh process
    assert generations >= 3, generations
    assert len(set(pids)) == len(pids) and len(pids) >= 3

    # zero dropped/repeated hops: output identical to the single-process
    # engine (same params, same XLA program -> same numerics)
    for sid in wavs:
        assert got[sid].shape == want[sid].shape, sid
        np.testing.assert_allclose(got[sid], want[sid], rtol=0, atol=1e-5)

    # bounded RSS: no generation inherits the previous one's growth —
    # every fresh worker starts from the same baseline ballpark
    assert max(rss) < 2.0 * min(rss), rss


def test_prewarmed_standby_recycle(setup):
    """prewarm=True: recycle adopts the background-compiled standby —
    stream continuity preserved, pid changes, standby replenished."""
    model, params, wavs = setup
    wav = wavs["a"]

    ref_engine = MultiStreamSeparator(model, params, **ENGINE_KW)
    want = _run(ref_engine, {"a": wav})["a"]

    with RecyclingMultiStreamSeparator(
            "TDANetBest", MODEL_KW, params, prewarm=True,
            platform="cpu", **ENGINE_KW) as eng:
        pid0 = eng.worker_pid
        eng.open("a")
        outs = []
        eng.push("a", wav[:20000])
        stepped = eng.step()
        while stepped:
            outs.append(stepped["a"])
            stepped = eng.step()
        eng.recycle()  # manual, mid-stream, onto the standby
        assert eng.worker_pid != pid0
        assert eng.generation == 2
        eng.push("a", wav[20000:])
        stepped = eng.step()
        while stepped:
            outs.append(stepped["a"])
            stepped = eng.step()
        outs.append(eng.flush("a"))
        got = np.concatenate(outs, axis=1)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_rpc_timeout_poisons_and_respawn_recovers(setup):
    """An RPC timeout kills the worker: its LATE reply would otherwise
    be consumed as the next command's response (a recycle would restore
    a step dict as engine state; a retried step would return the
    previous hop's audio). Until respawn(), every call must fail
    loudly; respawn() starts a fresh, working worker."""
    from tdanet_tpu.serving_worker import WorkerError
    model, params, wavs = setup
    with RecyclingMultiStreamSeparator(
            "TDANetBest", MODEL_KW, params, platform="cpu",
            **ENGINE_KW) as eng:
        pid0 = eng.worker_pid
        real_timeout = eng._timeout
        eng._timeout = 0.0  # poll(0) on an empty pipe: guaranteed miss
        with pytest.raises(WorkerError, match="timed out"):
            eng.worker_rss_kb()
        eng._timeout = real_timeout
        # poisoned: no silent consumption of the stale reply
        with pytest.raises(WorkerError, match="respawn"):
            eng.step()
        eng.respawn()
        assert eng.worker_pid != pid0
        assert eng.generation == 2
        # the fresh worker serves; state starts empty (streams re-open)
        eng.open("a")
        eng.push("a", wavs["a"][:20000])
        out = eng.step()
        assert "a" in out and out["a"].shape[0] == 2


def test_export_restore_roundtrip_in_process(setup):
    """State snapshot alone (no subprocess) resumes a stream exactly."""
    model, params, wavs = setup
    wav = wavs["a"]
    eng1 = MultiStreamSeparator(model, params, **ENGINE_KW)
    eng1.open("s")
    eng1.push("s", wav[:20000])
    out1 = [part for part in [eng1.step().get("s")] if part is not None]
    while True:
        step = eng1.step()
        if "s" not in step:
            break
        out1.append(step["s"])
    snap = eng1.export_state()

    eng2 = MultiStreamSeparator(model, params, **ENGINE_KW)
    eng2.restore_state(snap)
    eng2.push("s", wav[20000:])
    while True:
        step = eng2.step()
        if "s" not in step:
            break
        out1.append(step["s"])
    out1.append(eng2.flush("s"))
    got = np.concatenate(out1, axis=1)

    ref = MultiStreamSeparator(model, params, **ENGINE_KW)
    ref.open("s")
    ref.push("s", wav)
    want_parts = []
    while True:
        step = ref.step()
        if "s" not in step:
            break
        want_parts.append(step["s"])
    want_parts.append(ref.flush("s"))
    want = np.concatenate(want_parts, axis=1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
