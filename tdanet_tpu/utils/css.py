"""Continuous-speech-separation stitching (reference:
audio_test_css.py:104-137): overlap-add of per-segment separations with
cosine-similarity permutation alignment across the overlap region.

TPU-friendly formulation: all segments of an utterance are separated in
ONE batched jit call (the reference loops segments one by one), then the
permutation chain is resolved with a cheap host scan over the overlap
cosine scores.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _cos(a, b, eps=1e-8):
    return float(np.dot(a, b) /
                 ((np.linalg.norm(a) * np.linalg.norm(b)) + eps))


def stitch_segments(model, params, segments, overlap_len: int) -> np.ndarray:
    """segments: list of (seg_len,) arrays -> stitched (n_src, total_len).

    Follows the 2-source alignment rule of the reference: for each segment
    k>0, keep or swap the pair according to the sum of overlap cosine
    similarities with the previous segment's tails.
    """
    segs = np.stack([np.asarray(s, np.float32) for s in segments])  # (K, L)
    # vmap over segments: the unfixed-MHA models attend over the batch
    # axis, so a plain batched forward would mix segments and diverge from
    # the reference's one-segment-at-a-time loop (audio_test_css.py:111);
    # vmap keeps batch=1 semantics while executing all segments fused.
    fwd = jax.jit(jax.vmap(lambda p, s: model.apply(p, s[None])[0],
                           in_axes=(None, 0)))
    est = np.asarray(fwd(params, jnp.asarray(segs)))
    # est: (K, n_src, L)
    K, n_src, L = est.shape
    assert n_src == 2, "reference stitching is defined for 2 sources"

    out1, out2 = [est[0, 0]], [est[0, 1]]
    tail1, tail2 = est[0, 0][-overlap_len:], est[0, 1][-overlap_len:]
    for k in range(1, K):
        s1, s2 = est[k, 0], est[k, 1]
        comb1 = _cos(tail1, s1[:overlap_len]) + _cos(tail2, s2[:overlap_len])
        comb2 = _cos(tail1, s2[:overlap_len]) + _cos(tail2, s1[:overlap_len])
        if comb2 > comb1:
            s1, s2 = s2, s1
        out1.append(s1[overlap_len:])
        out2.append(s2[overlap_len:])
        tail1, tail2 = s1[-overlap_len:], s2[-overlap_len:]
    return np.stack([np.concatenate(out1), np.concatenate(out2)])
