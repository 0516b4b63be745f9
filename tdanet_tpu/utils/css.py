"""Continuous-speech-separation stitching (reference:
audio_test_css.py:104-137): overlap-add of per-segment separations with
cosine-similarity permutation alignment across the overlap region.

TPU-friendly formulation: all segments of an utterance are separated in
ONE batched jit call (the reference loops segments one by one), then the
permutation chain is resolved with a cheap host scan over the overlap
cosine scores. Optionally the per-segment forward is progressive
(adaptive depth): every segment runs at a cheap depth and only the
segments whose recurrence hasn't converged continue — exactly — to full
depth (tdanet_tpu/progressive.py), which suits long-form audio where
most segments are single-speaker-easy and a few overlaps are hard.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp


def _cos(a, b, eps=1e-8):
    return float(np.dot(a, b) /
                 ((np.linalg.norm(a) * np.linalg.norm(b)) + eps))


@lru_cache(maxsize=8)
def _segment_fwd(model):
    # one jitted program per model: a fresh lambda per stitch call would
    # RETRACE (and on TPU recompile, minutes) once per utterance in the
    # CSS eval loop. vmap over segments: the unfixed-MHA models attend
    # over the batch axis, so a plain batched forward would mix segments
    # and diverge from the reference's one-segment-at-a-time loop
    # (audio_test_css.py:111); vmap keeps batch=1 semantics while
    # executing all segments fused.
    return jax.jit(jax.vmap(lambda p, s: model.apply(p, s[None])[0],
                            in_axes=(None, 0)))


def stitch_segments(model, params, segments, overlap_len: int,
                    progressive_depth: int | None = None,
                    progressive_threshold: float = 0.05) -> np.ndarray:
    """segments: list of (seg_len,) arrays -> stitched (n_src, total_len).

    Follows the 2-source alignment rule of the reference: for each segment
    k>0, keep or swap the pair according to the sum of overlap cosine
    similarities with the previous segment's tails.

    ``progressive_depth``: if set, segments are separated adaptively —
    stage 1 at this depth, exact continuation to full depth for segments
    whose convergence proxy exceeds ``progressive_threshold``.
    """
    segs = np.stack([np.asarray(s, np.float32) for s in segments])  # (K, L)
    if progressive_depth is not None:
        from tdanet_tpu.progressive import separate_progressive
        est, _ = separate_progressive(
            model, params, segs, depth1=progressive_depth,
            threshold=progressive_threshold)
    else:
        est = np.asarray(_segment_fwd(model)(params, jnp.asarray(segs)))
    return stitch_chain(est, overlap_len)


def stitch_chain(est: np.ndarray, overlap_len: int) -> np.ndarray:
    """Resolve the permutation chain over pre-separated segments
    ``est`` (K, 2, L) — the host half of :func:`stitch_segments`,
    split out so the chain can be pinned against the reference loop.

    Reference-exact quirks (audio_test_css.py:116-131, both
    load-bearing for oracle parity — do not "fix"):

    - the comparison tails are FROZEN at segment 0's estimates
      (``s1_t_minus_1``/``s2_t_minus_1`` are assigned only under
      ``k == 0`` and never updated), so every segment aligns against
      segment 0, not its predecessor;
    - a tied score SWAPS (the keep branch requires
      ``comb1_score > comb2_score``).
    """
    K, n_src, L = est.shape
    assert n_src == 2, "reference stitching is defined for 2 sources"
    if K > 1 and overlap_len < 1:
        # the reference crashes here too (cosine over an empty slice);
        # fail with a message instead
        raise ValueError("stitching needs overlap_len >= 1 "
                         "(got 0 — use a nonzero --overlap)")

    out1, out2 = [est[0, 0]], [est[0, 1]]
    tail1, tail2 = est[0, 0][-overlap_len:], est[0, 1][-overlap_len:]
    for k in range(1, K):
        s1, s2 = est[k, 0], est[k, 1]
        comb1 = _cos(tail1, s1[:overlap_len]) + _cos(tail2, s2[:overlap_len])
        comb2 = _cos(tail1, s2[:overlap_len]) + _cos(tail2, s1[:overlap_len])
        if not comb1 > comb2:  # reference keeps ONLY on strict >
            s1, s2 = s2, s1
        out1.append(s1[overlap_len:])
        out2.append(s2[overlap_len:])
    return np.stack([np.concatenate(out1), np.concatenate(out2)])
