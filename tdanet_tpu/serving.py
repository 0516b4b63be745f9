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
- ``BatchSeparationServer``: a micro-batching offline engine over the
  bucketed ``separate_batched`` path.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp


class StreamingSeparator:
    """Online chunked separation with PIT-consistent stitching.

    Latency: one segment (``segment`` seconds); each ``push`` returns the
    newly-finalized samples per source (possibly empty). ``flush``
    processes the zero-padded tail and returns the remainder, mirroring
    the reference's pad/trim bookkeeping (libricssdatamodule.py:94-100,
    audio_test_css.py:122-136).
    """

    def __init__(self, model, params, segment=4.0, overlap=0.25,
                 sample_rate=8000, compute_dtype=None):
        self.model, self.params = model, params
        self.sr = sample_rate
        self.seg_len = int(segment * sample_rate)
        self.overlap_len = int(self.seg_len * overlap)
        self.hop = self.seg_len - self.overlap_len
        self.n_src = getattr(model, "num_sources", 2)
        self._fwd = jax.jit(
            lambda p, x: model.apply(p, x, compute_dtype=compute_dtype))
        # warm compile on the fixed segment shape
        self._fwd(params, jnp.zeros((1, self.seg_len), jnp.float32))
        self.reset()

    def reset(self):
        self._buffer = np.zeros(0, np.float32)
        self._tails: Optional[np.ndarray] = None  # (n_src, overlap)
        self._consumed = 0

    def _separate_segment(self, seg: np.ndarray) -> np.ndarray:
        est = np.asarray(self._fwd(self.params,
                                   jnp.asarray(seg[None])))[0]
        if self._tails is not None and self.overlap_len > 0:
            head = est[:, :self.overlap_len]
            # 2-source permutation score like audio_test_css.py:122-127;
            # generalized to n sources via greedy pairing on cosine sim
            def cos(a, b):
                return float(np.dot(a, b) /
                             (np.linalg.norm(a) * np.linalg.norm(b) + 1e-8))
            if self.n_src == 2:
                keep = (cos(self._tails[0], head[0])
                        + cos(self._tails[1], head[1]))
                swap = (cos(self._tails[0], head[1])
                        + cos(self._tails[1], head[0]))
                if swap > keep:
                    est = est[::-1]
            else:
                order = []
                used = set()
                for i in range(self.n_src):
                    best, bj = -2.0, None
                    for j in range(self.n_src):
                        if j in used:
                            continue
                        c = cos(self._tails[i], head[j])
                        if c > best:
                            best, bj = c, j
                    order.append(bj)
                    used.add(bj)
                est = est[order]
        self._tails = est[:, -self.overlap_len:] if self.overlap_len \
            else est[:, :0]
        return est

    def push(self, chunk: np.ndarray) -> np.ndarray:
        """Feed samples; returns newly finalized (n_src, n_new) audio."""
        self._buffer = np.concatenate(
            [self._buffer, np.asarray(chunk, np.float32)])
        outs: List[np.ndarray] = []
        while self._buffer.shape[0] >= self.seg_len:
            seg = self._buffer[:self.seg_len]
            est = self._separate_segment(seg)
            if self._consumed == 0:
                outs.append(est)               # first segment: emit all
            else:
                outs.append(est[:, self.overlap_len:])
            self._buffer = self._buffer[self.hop:]
            self._consumed += 1
        if outs:
            return np.concatenate(outs, axis=1)
        return np.zeros((self.n_src, 0), np.float32)

    def flush(self) -> np.ndarray:
        """Process the remaining tail (zero-padded) and reset."""
        n = self._buffer.shape[0]
        emitted_overlap = self.overlap_len if self._consumed > 0 else 0
        if n <= emitted_overlap:
            self.reset()
            return np.zeros((self.n_src, 0), np.float32)
        pad_len = self.seg_len - n
        seg = np.concatenate([self._buffer,
                              np.zeros(pad_len, np.float32)])
        est = self._separate_segment(seg)
        out = est[:, emitted_overlap:self.seg_len - pad_len]
        self.reset()
        return out


class BatchSeparationServer:
    """Offline micro-batching engine over bucketed batched separation."""

    def __init__(self, model, params, batch_size=8, compute_dtype=None):
        self.model, self.params = model, params
        self.batch_size = batch_size
        self.compute_dtype = compute_dtype

    def separate(self, wavs):
        from tdanet_tpu.utils.separator import separate_batched
        return separate_batched(self.model, self.params, wavs,
                                batch_size=self.batch_size,
                                compute_dtype=self.compute_dtype)
