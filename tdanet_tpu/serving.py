"""Streaming separation service (production-serving layer).

The reference's long-form story is offline: slice, separate each segment
in a Python loop, stitch (audio_test_css.py:104-137). This module turns
that into an online, state-carrying streaming engine suitable for
serving:

- ``StreamingSeparator``: push arbitrary-sized audio chunks; fixed-size
  overlapped segments are separated through ONE pre-compiled jit program
  (static shapes, compiled once at construction), permutation-aligned
  against the previous segment's tails by overlap cosine similarity (the
  reference's stitching rule), and emitted incrementally with bounded
  latency of one segment;
- ``MultiStreamSeparator``: N concurrent streams sharing ONE batched
  dispatch per tick — amortizes the ~30 ms RPC dispatch floor (which
  dominates single-stream latency at batch 1, docs/PERF.md) across all
  active streams; per-utterance (batch=1) semantics preserved via vmap;
- ``BatchSeparationServer``: a micro-batching offline engine over the
  bucketed ``separate_batched`` path;
- ``AsyncBatchServer``: request/response online serving — ``submit``
  returns a Future, a worker thread coalesces requests into one
  batched dispatch under a latency budget (``max_wait_ms``).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tdanet_tpu import ops
from tdanet_tpu.utils.separator import depth_kw, trim_renorm


class DeadlineExceeded(RuntimeError):
    """Raised into a request's future when deadline-aware admission
    sheds it (AsyncBatchServer(deadline_ms=...)): the request was older
    than the deadline when its batch was assembled."""


def _resolve(fut, result=None, exc=None):
    """Resolve a Future, tolerating client-side cancellation — an
    InvalidStateError here must never kill a server worker thread."""
    try:
        if exc is not None:
            fut.set_exception(exc)
        else:
            fut.set_result(result)
    except Exception:
        pass


def _cos(a, b):
    a = np.asarray(a, np.float32)  # int16 emission would overflow a raw dot
    b = np.asarray(b, np.float32)
    return float(np.dot(a, b) /
                 (np.linalg.norm(a) * np.linalg.norm(b) + 1e-8))


def _perm_align(tails: Optional[np.ndarray], est: np.ndarray,
                n_src: int, overlap_len: int) -> np.ndarray:
    """Reorder est's sources to best match the reference tails by
    overlap cosine similarity (audio_test_css.py:122-131; greedy
    pairing for n>2). Reference-exact quirks: the tails are the FIRST
    segment's (frozen — see _StreamState.finalize), and a tied score
    swaps (keep requires strict >)."""
    if tails is None or overlap_len == 0:
        return est
    head = est[:, :overlap_len]
    if n_src == 2:
        keep = _cos(tails[0], head[0]) + _cos(tails[1], head[1])
        swap = _cos(tails[0], head[1]) + _cos(tails[1], head[0])
        return est if keep > swap else est[::-1]
    order, used = [], set()
    for i in range(n_src):
        best, bj = -2.0, None
        for j in range(n_src):
            if j not in used:
                c = _cos(tails[i], head[j])
                if c > best:
                    best, bj = c, j
        order.append(bj)
        used.add(bj)
    return est[order]


class _StreamState:
    """Per-stream buffering + overlap-stitch bookkeeping."""

    def __init__(self, n_src: int, seg_len: int, overlap_len: int):
        self.n_src, self.seg_len = n_src, seg_len
        self.overlap_len = overlap_len
        self.hop = seg_len - overlap_len
        self.buffer = np.zeros(0, np.float32)
        self.tails: Optional[np.ndarray] = None
        self.consumed = 0

    def feed(self, chunk: np.ndarray) -> None:
        self.buffer = np.concatenate(
            [self.buffer, np.asarray(chunk, np.float32)])

    def ready(self) -> bool:
        return self.buffer.shape[0] >= self.seg_len

    def peek_segment(self) -> np.ndarray:
        return self.buffer[:self.seg_len]

    def finalize(self, est: np.ndarray) -> np.ndarray:
        """Align a separated segment, advance the buffer, and return the
        newly finalized samples."""
        est = _perm_align(self.tails, est, self.n_src, self.overlap_len)
        if self.consumed == 0:
            # reference quirk (load-bearing for parity with the offline
            # stitcher and the torch CSS loop): the comparison tails are
            # FROZEN at the first segment's estimates — every later
            # segment aligns against segment 0, not its predecessor
            # (audio_test_css.py:117-120 assigns s1_t_minus_1 only at
            # k == 0)
            self.tails = est[:, -self.overlap_len:] if self.overlap_len \
                else est[:, :0]
        out = est if self.consumed == 0 else est[:, self.overlap_len:]
        self.buffer = self.buffer[self.hop:]
        self.consumed += 1
        return out

    def tail_segment(self):
        """(padded_segment, n_emit) for flush; None if nothing to emit."""
        n = self.buffer.shape[0]
        emitted_overlap = self.overlap_len if self.consumed > 0 else 0
        if n <= emitted_overlap:
            return None
        pad_len = self.seg_len - n
        seg = np.concatenate([self.buffer, np.zeros(pad_len, np.float32)])
        return seg, emitted_overlap, pad_len

    def export(self) -> dict:
        """Picklable snapshot: everything a fresh process needs to
        continue this stream with zero dropped or repeated samples."""
        return {"buffer": self.buffer.copy(),
                "tails": None if self.tails is None else self.tails.copy(),
                "consumed": self.consumed}

    def restore(self, snap: dict) -> None:
        self.buffer = np.asarray(snap["buffer"], np.float32).copy()
        self.tails = None if snap["tails"] is None else \
            np.asarray(snap["tails"]).copy()
        self.consumed = int(snap["consumed"])


class StreamingSeparator:
    """Online chunked separation with PIT-consistent stitching.

    Latency: one segment (``segment`` seconds); each ``push`` returns the
    newly-finalized samples per source (possibly empty). ``flush``
    processes the zero-padded tail and returns the remainder, mirroring
    the reference's pad/trim bookkeeping (libricssdatamodule.py:94-100,
    audio_test_css.py:122-136).
    """

    def __init__(self, model, params, segment=4.0, overlap=0.25,
                 sample_rate=8000, compute_dtype=None, dw_fold=True,
                 num_blocks=None, forward_fn=None, n_src=None):
        self.model, self.params = model, params
        self.sr = sample_rate
        self.seg_len = int(segment * sample_rate)
        self.overlap_len = int(self.seg_len * overlap)
        self.hop = self.seg_len - self.overlap_len
        self.n_src = n_src if n_src is not None else \
            getattr(model, "num_sources", 2)
        if forward_fn is not None:
            # pre-built jittable (params, (1, seg_len)) -> (1, n_src, T)
            # forward — e.g. a deployment bundle's exported program
            # (deploy.load_streaming); dw_fold/num_blocks were baked in
            # (or not) when it was built
            self._fwd = jax.jit(forward_fn)
            self._fwd(params, jnp.zeros((1, self.seg_len), jnp.float32))
            self.reset()
            return
        # num_blocks: early-exit depth override (latency/quality knob on
        # the shared-weight recurrence; docs/PERF.md early-exit study)
        kw = depth_kw(num_blocks)
        self._fwd = jax.jit(
            lambda p, x: model.apply(p, x, compute_dtype=compute_dtype,
                                     **kw))
        # warm compile on the fixed segment shape; streaming is
        # latency-bound at batch 1, where the phase-split stride-2 dw
        # conv beats XLA's space-to-batched conv (+19% at B=4,
        # docs/PERF.md) — every later dispatch reuses this trace
        with ops.dw_s2_fold(10 ** 9 if dw_fold else 0):
            self._fwd(params, jnp.zeros((1, self.seg_len), jnp.float32))
        self.reset()

    def reset(self):
        self._state = _StreamState(self.n_src, self.seg_len,
                                   self.overlap_len)

    def export_state(self) -> dict:
        """Picklable mid-stream state for worker handoff (the documented
        recovery/recycle story: buffered samples + overlap tails fully
        determine the continuation)."""
        return self._state.export()

    def restore_state(self, snap: dict) -> None:
        self.reset()
        self._state.restore(snap)

    def _separate(self, seg: np.ndarray) -> np.ndarray:
        return np.asarray(self._fwd(self.params, jnp.asarray(seg[None])))[0]

    def push(self, chunk: np.ndarray) -> np.ndarray:
        """Feed samples; returns newly finalized (n_src, n_new) audio."""
        self._state.feed(chunk)
        outs: List[np.ndarray] = []
        while self._state.ready():
            est = self._separate(self._state.peek_segment())
            outs.append(self._state.finalize(est))
        if outs:
            return np.concatenate(outs, axis=1)
        return np.zeros((self.n_src, 0), np.float32)

    def flush(self) -> np.ndarray:
        """Process the remaining tail (zero-padded) and reset."""
        tail = self._state.tail_segment()
        if tail is None:
            self.reset()
            return np.zeros((self.n_src, 0), np.float32)
        seg, emitted_overlap, pad_len = tail
        est = _perm_align(self._state.tails, self._separate(seg),
                          self.n_src, self.overlap_len)
        out = est[:, emitted_overlap:self.seg_len - pad_len]
        self.reset()
        return out


class MultiStreamSeparator:
    """Concurrent online streams sharing one batched device dispatch.

    Up to ``max_streams`` independent streams are stitched with the same
    per-stream semantics as ``StreamingSeparator``, but every ``step()``
    separates ALL ready segments in a single pre-compiled
    ``vmap``-batched forward (so each stream still sees the reference's
    batch=1 MHA semantics). With the ~30 ms tunnel dispatch floor
    amortized over the batch, per-stream hop latency stays ~flat in the
    number of streams.

    Usage: ``open(sid)`` -> ``push(sid, chunk)`` (buffers only) ->
    ``step()`` -> {sid: newly finalized audio} -> ``flush(sid)``.
    """

    def __init__(self, model, params, max_streams=4, segment=4.0,
                 overlap=0.25, sample_rate=8000, compute_dtype=None,
                 emit_dtype="float32", dw_fold=True, num_blocks=None,
                 forward_fn=None, n_src=None):
        self.model, self.params = model, params
        self.max_streams = max_streams
        self.seg_len = int(segment * sample_rate)
        self.overlap_len = int(self.seg_len * overlap)
        self.n_src = n_src if n_src is not None else \
            getattr(model, "num_sources", 2)
        self.emit_dtype = emit_dtype
        if forward_fn is not None:
            # pre-built jittable (params, (max_streams, seg_len)) ->
            # (max_streams, n_src, T) vmapped forward (e.g. a deployment
            # bundle's exported program, deploy.load_streaming); only
            # the emission conversion is traced on top
            single = None
        else:
            kw = depth_kw(num_blocks)
            single = lambda p, w: model.apply(p, w[None],
                                              compute_dtype=compute_dtype,
                                              **kw)[0]

        def fwd(p, x):
            if forward_fn is not None:
                est = forward_fn(p, x)
            else:
                est = jax.vmap(single, in_axes=(None, 0))(p, x)
            if emit_dtype == "int16":
                # device-side 16-bit PCM: the f32 readback is ~20 ms of
                # the per-hop latency through the ~30 ms RPC tunnel;
                # int16 is the wav wire format anyway (-96 dB quant)
                est = jnp.round(jnp.clip(est.astype(jnp.float32),
                                         -1.0, 1.0) * 32767.0)
                est = est.astype(jnp.int16)
            return est

        self._fwd = jax.jit(fwd)
        # warm compile; fold formulation wins for hop-latency-bound
        # small batches (<=8 streams measured, docs/PERF.md)
        with ops.dw_s2_fold(
                10 ** 9 if (dw_fold and max_streams <= 8) else 0):
            self._fwd(params, jnp.zeros((max_streams, self.seg_len),
                                        jnp.float32))
        self._streams: Dict[object, _StreamState] = {}

    def open(self, stream_id) -> None:
        if stream_id in self._streams:
            # silent replacement would drop buffered samples and stitch
            # tails (and a re-open at capacity is not a new stream)
            raise ValueError(f"stream {stream_id!r} is already open; "
                             f"close() it first")
        if len(self._streams) >= self.max_streams:
            raise ValueError(f"max_streams={self.max_streams} exceeded")
        self._streams[stream_id] = _StreamState(
            self.n_src, self.seg_len, self.overlap_len)

    def export_state(self) -> dict:
        """Picklable {stream_id: snapshot} of every open stream."""
        return {sid: st.export() for sid, st in self._streams.items()}

    def restore_state(self, state: dict) -> None:
        self._streams.clear()
        for sid, snap in state.items():
            self.open(sid)
            self._streams[sid].restore(snap)

    def close(self, stream_id) -> None:
        self._streams.pop(stream_id, None)

    def push(self, stream_id, chunk: np.ndarray) -> None:
        """Buffer samples for one stream (no device work)."""
        self._streams[stream_id].feed(chunk)

    def _dispatch(self, segs: List[np.ndarray]) -> np.ndarray:
        batch = np.zeros((self.max_streams, self.seg_len), np.float32)
        batch[:len(segs)] = np.stack(segs)
        # pass the numpy batch straight to the jitted fn: the transfer
        # rides the execute call instead of a separate upload RPC
        # (~8 ms/hop through the tunnel, measured)
        return np.asarray(self._fwd(self.params, batch))

    def step(self) -> Dict[object, np.ndarray]:
        """Separate one ready segment from every stream that has one, in
        a single batched dispatch. Returns {stream_id: (n_src, n_new)}.
        Call repeatedly until empty to drain multi-segment backlogs."""
        ready = [(sid, st) for sid, st in self._streams.items()
                 if st.ready()]
        out: Dict[object, np.ndarray] = {}
        for group_start in range(0, len(ready), self.max_streams):
            group = ready[group_start:group_start + self.max_streams]
            ests = self._dispatch([st.peek_segment() for _, st in group])
            for (sid, st), est in zip(group, ests):
                out[sid] = st.finalize(est)
        return out

    def flush(self, stream_id) -> np.ndarray:
        """Drain any full segments still buffered (a client may flush
        without a final step()), then process the zero-padded tail and
        close the stream.

        The whole backlog is computable from the buffer up front
        (segment slices advance by ``hop``; permutation alignment is
        host-side post-processing), so a k-segment backlog shares
        ``ceil((k+1)/max_streams)`` batched dispatches instead of
        paying one padded max_streams dispatch — and its ~30 ms tunnel
        RPC floor — per segment."""
        st = self._streams[stream_id]
        segs: List[np.ndarray] = []
        n, off = st.buffer.shape[0], 0
        while n - off >= st.seg_len:
            segs.append(st.buffer[off:off + st.seg_len])
            off += st.hop
        # the zero-padded tail is known up front too — same bookkeeping
        # as _StreamState.tail_segment evaluated after the full
        # segments would have been consumed
        emitted_overlap = st.overlap_len if (st.consumed + len(segs)) \
            else 0
        tail_meta = None
        if n - off > emitted_overlap:
            pad_len = st.seg_len - (n - off)
            segs.append(np.concatenate(
                [st.buffer[off:], np.zeros(pad_len, np.float32)]))
            tail_meta = (emitted_overlap, pad_len)
        ests: List[np.ndarray] = []
        for s0 in range(0, len(segs), self.max_streams):
            chunk = segs[s0:s0 + self.max_streams]
            ests.extend(self._dispatch(chunk)[:len(chunk)])
        parts: List[np.ndarray] = []
        n_full = len(segs) - (1 if tail_meta else 0)
        for est in ests[:n_full]:
            parts.append(st.finalize(est))
        if tail_meta:
            emitted_overlap, pad_len = tail_meta
            est = _perm_align(st.tails, ests[-1], self.n_src,
                              self.overlap_len)
            parts.append(est[:, emitted_overlap:self.seg_len - pad_len])
        self.close(stream_id)
        if parts:
            return np.concatenate(parts, axis=1)
        return np.zeros((self.n_src, 0),
                        np.int16 if self.emit_dtype == "int16"
                        else np.float32)


class BatchSeparationServer:
    """Offline micro-batching engine over bucketed batched separation."""

    def __init__(self, model, params, batch_size=8, compute_dtype=None,
                 mesh=None):
        self.model, self.params = model, params
        self.batch_size = batch_size
        self.compute_dtype = compute_dtype
        self.mesh = mesh  # dp scale-out (see separate_batched)

    def separate(self, wavs):
        from tdanet_tpu.utils.separator import separate_batched
        return separate_batched(self.model, self.params, wavs,
                                batch_size=self.batch_size,
                                compute_dtype=self.compute_dtype,
                                mesh=self.mesh)


class AsyncBatchServer:
    """Asynchronous micro-batching separation server (online request/
    response serving, the piece between the offline
    ``BatchSeparationServer`` and the stateful streaming engines).

    ``submit(wav)`` returns a ``concurrent.futures.Future`` immediately;
    a dispatch thread drains the request queue, coalescing up to
    ``max_batch`` requests or waiting at most ``max_wait_ms`` for the
    batch to fill, buckets them by lattice-padded length (one compiled
    program per bucket, shapes static), and resolves every future with
    the (n_src, T) separated audio — same trimming + per-utterance
    energy renormalization as the eval path (utils/separator.py).

    CONTINUOUS (pipelined) batching: JAX dispatch is asynchronous, so
    the dispatch thread hands the in-flight device result to a separate
    resolver thread and immediately coalesces batch k+1 while batch k
    computes — host coalescing, device compute, and result readback
    overlap. ``pipeline_depth`` bounds in-flight batches; when the
    device falls behind, the bounded handoff queue applies backpressure
    and arriving requests accumulate, so later batches coalesce FULL
    without waiting — the batching policy adapts to load by itself
    (max_wait only ever delays dispatch on an idle device).

    vmap preserves the reference's per-utterance batch=1 MHA semantics;
    batches are padded to a fixed row count so each bucket compiles
    exactly once per batch size. Reference capability being replaced:
    the batch=1 eval loop (audio_test.py:111-134).

    ADAPTIVE batch sizing (``adaptive=True``): the dispatch size walks a
    ladder ``min_batch, 2*min_batch, ..., max_batch``. Under sustained
    overload (full coalesces with a standing queue) the server grows one
    rung at a time toward ``max_batch`` — the measured B=24
    compute+readback operating point is ~1.7x the B=8 saturation
    (docs/SERVING.md) — and shrinks back when traffic thins so a lone
    request never pays big-batch padded latency. Bigger-rung programs
    are compiled on a BACKGROUND thread and only become eligible once
    ready, so growth never stalls the live pipeline behind a multi-
    minute TPU compile; until then dispatches keep running at the
    largest ready rung.
    """

    def __init__(self, model, params, max_batch=8, max_wait_ms=5.0,
                 compute_dtype=None, dw_fold=None, pipeline_depth=2,
                 num_blocks=None, mesh=None, adaptive=False,
                 min_batch=None, length_buckets=None, deadline_ms=None):
        import queue as _queue
        import threading
        self.model, self.params = model, params
        self.max_batch = max_batch
        # 2-D padding ladder, length axis: with variable-length traffic,
        # exact lattice-granular bucketing (64 ms steps at the recipe
        # shape) scatters a coalesce over many tiny per-length groups —
        # each a separate compiled program AND a separate under-filled
        # dispatch. Coarse length buckets (samples, lattice-aligned up)
        # trade bounded padding waste for full batches and a bounded
        # program set; a wav longer than the largest bucket falls back
        # to exact lattice padding. See docs/SERVING.md (round-5
        # variable-length study).
        self.length_buckets = None
        if length_buckets:
            lat = getattr(model, "lcm", 1)
            self.length_buckets = sorted(
                {-(-int(t) // lat) * lat for t in length_buckets})
        # deadline-aware admission: a request older than deadline_ms at
        # DISPATCH time has already missed any latency target it had —
        # shedding it (DeadlineExceeded on its future) spends the device
        # on requests that can still make it, bounding p95 under
        # overload instead of serving everyone late.
        self.deadline = deadline_ms / 1e3 if deadline_ms else None
        self.stats_shed = 0
        # dp scale-out: shard the padded batch axis over the mesh's 'dp'
        # devices, params replicated — one compiled program, N chips
        # each separating max_batch/N utterances per dispatch
        self.mesh = mesh
        self._x_sharding = None
        if mesh is not None:
            from tdanet_tpu.parallel.mesh import dp_batch_setup
            self._x_sharding, self.params = dp_batch_setup(
                mesh, max_batch, params, what="max_batch")
        self.max_wait = max_wait_ms / 1e3
        self.compute_dtype = compute_dtype
        self.num_blocks = num_blocks
        self.lattice = getattr(model, "lcm", 1)
        # None = auto per batch size (fold wins at latency-sized B<=8)
        self._dw_fold_user = dw_fold
        if adaptive:
            lo = min_batch if min_batch is not None else min(8, max_batch)
            if mesh is not None:
                dp = mesh.shape["dp"]
                if lo % dp:
                    raise ValueError(
                        f"min_batch ({lo}) must be a multiple of the "
                        f"mesh dp axis ({dp}) for sharded serving")
            ladder, b = [], lo
            while b < max_batch:
                ladder.append(b)
                b *= 2
            ladder.append(max_batch)
            self._ladder = sorted(set(ladder))
        else:
            self._ladder = [max_batch]
        self._rung = 0          # index of the current target rung
        self._pressure = 0      # consecutive full-coalesce-with-backlog
        self._idle = 0          # consecutive under-filled coalesces
        # observability for tests + the saturation bench: how big did
        # dispatches actually get, and how high did the rung climb
        self.stats = {"dispatches": 0, "rows": 0, "max_B": 0,
                      "rung_highwater": 0}
        self._targets: Dict[int, None] = {}  # active bucket lengths (LRU-ish)
        self._fwd_cache: Dict[tuple, object] = {}   # (target, B) -> fn
        self._cache_lock = threading.Lock()
        self._compile_sched: set = set()     # (target, B) queued/building
        self._compile_q: "_queue.Queue" = _queue.Queue()
        self._q: "_queue.Queue" = _queue.Queue()
        self._inflight: "_queue.Queue" = _queue.Queue(
            maxsize=max(1, pipeline_depth))
        self._alive = True
        # serializes submit's alive-check+enqueue against close's
        # alive-flip: without it a submit racing close can enqueue after
        # both drains ran, leaving a future that never resolves
        self._submit_lock = threading.Lock()
        self._resolver = threading.Thread(target=self._resolve_loop,
                                          daemon=True)
        self._resolver.start()
        self._compiler = None
        if len(self._ladder) > 1:
            self._compiler = threading.Thread(target=self._compile_loop,
                                              daemon=True)
            self._compiler.start()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- client side -------------------------------------------------------

    def submit(self, wav: np.ndarray):
        from concurrent.futures import Future
        wav = np.asarray(wav, np.float32)
        if wav.ndim != 1 or wav.size == 0:
            # reject HERE: a malformed row would otherwise raise during
            # batch assembly on the dispatch thread, killing it and
            # hanging every other client's future
            raise ValueError(
                f"submit() takes one mono waveform (T,), got shape "
                f"{wav.shape}")
        import time as _time
        with self._submit_lock:
            if not self._alive:
                raise RuntimeError("AsyncBatchServer is closed")
            fut: Future = Future()
            self._q.put((wav, fut, _time.monotonic()))
        return fut

    def separate(self, wav: np.ndarray, timeout=None) -> np.ndarray:
        return self.submit(wav).result(timeout=timeout)

    def prewarm(self, lengths=None, rungs=None):
        """Speculatively compile the (length-bucket x batch-rung) program
        grid on the CALLING thread — production warm-up before taking
        traffic, so neither a first-of-its-length request nor a rung
        grow at the saturation knee ever waits on a multi-minute TPU
        compile. Defaults: the configured length_buckets x full ladder."""
        lengths = lengths if lengths is not None else \
            (self.length_buckets or [])
        for t in lengths:
            t = -(-int(t) // self.lattice) * self.lattice
            self._note_target(t)
            for B in (rungs if rungs is not None else self._ladder):
                self._get_fwd(t, B)

    def close(self):
        with self._submit_lock:
            self._alive = False
            self._q.put(None)
        self._worker.join(timeout=10)
        self._resolver.join(timeout=10)
        if self._compiler is not None:
            self._compile_q.put(None)
            self._compiler.join(timeout=10)
        self._drain_queue(RuntimeError("AsyncBatchServer closed"))

    def _drain_queue(self, exc):
        import queue as _queue
        while True:
            try:
                item = self._q.get_nowait()
            except _queue.Empty:
                return
            if item is not None:
                _resolve(item[1], exc=exc)

    # -- dispatch thread ---------------------------------------------------

    def _build_fwd(self, target: int, B: int):
        kw = depth_kw(self.num_blocks)
        single = lambda p, w: self.model.apply(
            p, w[None], compute_dtype=self.compute_dtype, **kw)[0]
        fwd = jax.jit(lambda p, x: jax.vmap(
            single, in_axes=(None, 0))(p, x))
        fold = self._dw_fold_user if self._dw_fold_user is not None \
            else B <= 8
        # explicit thread-local gate either way: this runs on the
        # dispatch thread OR the background rung compiler, and the two
        # must not see each other's fold choice mid-trace
        with ops.dw_s2_fold(10 ** 9 if fold else 0):
            fwd(self.params, self._place(
                np.zeros((B, target), np.float32)))
        return fwd

    def _get_fwd(self, target: int, B: int):
        """Blocking build (dispatch thread): rung-0 / non-adaptive path."""
        key = (target, B)
        with self._cache_lock:
            fn = self._fwd_cache.get(key)
        if fn is None:
            fn = self._build_fwd(target, B)
            with self._cache_lock:
                self._fwd_cache[key] = fn
        return fn

    def _ready_fwd(self, target: int, B: int):
        with self._cache_lock:
            return self._fwd_cache.get((target, B))

    def _schedule_compile(self, target: int, B: int) -> None:
        with self._cache_lock:
            key = (target, B)
            if key in self._fwd_cache or key in self._compile_sched:
                return
            self._compile_sched.add(key)
        self._compile_q.put(key)

    def _compile_loop(self):
        """Background compiler: bigger-rung programs become eligible
        without ever blocking the live dispatch pipeline."""
        while True:
            key = self._compile_q.get()
            if key is None:
                return
            target, B = key
            try:
                fn = self._build_fwd(target, B)
                with self._cache_lock:
                    self._fwd_cache[key] = fn
            except Exception:
                # an unbuildable rung is simply never grown into; the
                # live rung keeps serving
                pass
            finally:
                with self._cache_lock:
                    self._compile_sched.discard(key)

    def _place(self, x):
        """Host batch -> device(s): dp-sharded when serving on a mesh."""
        if self._x_sharding is not None:
            return jax.device_put(x, self._x_sharding)
        return jnp.asarray(x)

    def _coalesce(self, first):
        """Continuous-batching policy: fill up to the current rung's
        batch size, waiting at most ``max_wait`` on an idle device — but
        while the in-flight pipe is FULL, waiting costs nothing (a slot
        must open before this batch could run anyway), so keep
        coalescing past the deadline. This is what keeps batches full
        under load instead of shipping partial batches into a standing
        queue."""
        import queue as _queue
        import time as _time
        cap = self._ladder[self._rung]
        batch = [first]
        deadline = _time.monotonic() + self.max_wait
        while self._alive and len(batch) < cap:
            now = _time.monotonic()
            past = now >= deadline
            if past and not self._inflight.full():
                break
            # past-deadline polls must be fine-grained: the break
            # condition is an inflight slot opening, and a coarse poll
            # would add its whole period to the batch's latency
            timeout = 0.005 if past else max(deadline - now, 0.002)
            try:
                nxt = self._q.get(timeout=timeout)
            except _queue.Empty:
                if not self._inflight.full():
                    break
                continue
            if nxt is None:
                self._alive = False
                break
            batch.append(nxt)
        return batch

    def _run(self):
        import queue as _queue
        while self._alive:
            try:
                item = self._q.get(timeout=0.2)
            except _queue.Empty:
                continue
            if item is None:
                break
            batch = self._coalesce(item)
            self._adapt(len(batch))
            self._dispatch(batch)
        # tell the resolver to finish what's in flight, then exit
        self._inflight.put(None)
        # nothing queued behind the sentinel may hang
        self._drain_queue(RuntimeError("AsyncBatchServer worker exited"))

    def _note_target(self, target: int) -> None:
        """Track hot bucket lengths (small LRU) so a rung-grow can warm
        the bigger program for every length currently in play."""
        self._targets.pop(target, None)
        self._targets[target] = None
        while len(self._targets) > 16:
            self._targets.pop(next(iter(self._targets)))

    def _adapt(self, n: int) -> None:
        """Walk the batch-size ladder: sustained full coalesces WITH a
        standing queue grow the rung (after warming the bigger program
        in the background); sustained under-filled coalesces shrink it
        so a lone request never pays big-batch padded latency."""
        if len(self._ladder) == 1:
            return
        cap = self._ladder[self._rung]
        if n >= cap and not self._q.empty():
            self._pressure += 1
            self._idle = 0
            if self._pressure >= 2 and self._rung < len(self._ladder) - 1:
                self._rung += 1
                self._pressure = 0
                self.stats["rung_highwater"] = max(
                    self.stats["rung_highwater"], self._rung)
                for t in list(self._targets):
                    self._schedule_compile(t, self._ladder[self._rung])
        elif self._rung > 0 and n <= self._ladder[self._rung - 1]:
            # only coalesces that would have FIT the lower rung count as
            # idle: n=12 at rung 16 is still >8-deep traffic, and
            # shrinking on it caused grow/shrink oscillation right at
            # the rung boundary (the round-4 mid-overload dip)
            self._idle += 1
            self._pressure = 0
            if self._idle >= 4:
                self._rung -= 1
                self._idle = 0
        else:
            self._pressure = 0
            self._idle = 0

    def _pick_fwd(self, target: int, n: int = None):
        """(B, fwd, err): the largest READY rung <= the current target
        rung; schedules a background compile for the target rung when
        it isn't ready yet. Rung 0 builds synchronously — it is the
        always-available baseline (and the only path when adaptive=False).

        When ``n`` (the actual group size) is given, the scan starts at
        the SMALLEST rung that fits n instead of the current rung:
        shipping a half-filled coalesce through the big program spends
        the padding rows' compute for nothing, which is exactly what
        made throughput collapse at the grow/shrink boundary under
        mid-overload (measured: 109.8x at 157x offered vs 140.7x for
        the fixed-B server — docs/SERVING.md round-4 curve)."""
        top = self._rung
        if n is not None:
            while top > 0 and self._ladder[top - 1] >= n:
                top -= 1
        for i in range(top, 0, -1):
            B = self._ladder[i]
            fn = self._ready_fwd(target, B)
            if fn is not None:
                return B, fn, None
            if i == top:
                self._schedule_compile(target, B)
        try:
            return self._ladder[0], self._get_fwd(target, self._ladder[0]), \
                None
        except Exception as e:  # compile failure: caller fails the bucket
            return 0, None, e

    def _dispatch(self, batch):
        """Bucket + launch device work WITHOUT materializing results;
        the resolver thread blocks on readback. Compile/dispatch errors
        resolve the affected futures here and must not kill the thread."""
        import time as _time
        if self.deadline is not None:
            now = _time.monotonic()
            kept = []
            for wav, fut, ts in batch:
                if now - ts > self.deadline:
                    self.stats_shed += 1
                    _resolve(fut, exc=DeadlineExceeded(
                        f"request waited {(now - ts) * 1e3:.0f} ms > "
                        f"deadline {self.deadline * 1e3:.0f} ms"))
                else:
                    kept.append((wav, fut, ts))
            batch = kept
        buckets: Dict[int, list] = {}
        for wav, fut, _ts in batch:
            t = -(-wav.shape[-1] // self.lattice) * self.lattice
            if self.length_buckets is not None:
                for b in self.length_buckets:
                    if b >= t:
                        t = b
                        break
            buckets.setdefault(t, []).append((wav, fut))
        for target, reqs in buckets.items():
            self._note_target(target)
            B, fwd, err = self._pick_fwd(target, n=len(reqs))
            if fwd is None:
                for _, fut in reqs:
                    _resolve(fut, exc=err)
                continue
            for s in range(0, len(reqs), B):
                group = reqs[s:s + B]
                self.stats["dispatches"] += 1
                self.stats["rows"] += len(group)
                self.stats["max_B"] = max(self.stats["max_B"], B)
                try:
                    # assembly inside the try: any surprise here must
                    # resolve the group's futures, never kill the
                    # dispatch thread (which would hang every client)
                    x = np.zeros((B, target), np.float32)
                    for row, (wav, _) in enumerate(group):
                        x[row, :wav.shape[-1]] = wav
                    est_dev = fwd(self.params, self._place(x))  # async
                except Exception as e:  # resolve, don't hang clients
                    for _, fut in group:
                        _resolve(fut, exc=e)
                    continue
                # bounded handoff: blocks when pipeline_depth batches
                # are in flight -> requests pile up -> next batch
                # coalesces full instantly (adaptive under load)
                self._inflight.put((est_dev, group))

    # -- resolver thread ---------------------------------------------------

    def _resolve_loop(self):
        # One batch per materialization, oldest first. Joint readback of
        # everything in flight (jax.device_get([...])) was measured and
        # REJECTED: despite a ~20% win in an isolated transfer
        # microbench, end-to-end overload throughput halved (80x vs
        # 170x aggregate) — the joint fetch waits on the NEWEST batch's
        # compute before resolving the oldest batch's futures, and
        # transfer stops overlapping compute. (Ready-gated grouping is
        # not possible: Array.is_ready() answers locally/optimistically
        # on the tunneled backend.) Numbers in docs/PERF.md.
        while True:
            item = self._inflight.get()
            if item is None:
                return
            est_dev, group = item
            try:
                est = np.asarray(est_dev)  # blocks on device + transfer
            except Exception as e:
                for _, fut in group:
                    _resolve(fut, exc=e)
                continue
            for row, (wav, fut) in enumerate(group):
                _resolve(fut, result=trim_renorm(wav, est[row]))
