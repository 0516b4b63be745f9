"""Numerical-equivalence oracle for the native BSS-eval SDR.

The reference metric is ``fast_bss_eval.sdr_pit_loss``
(/root/reference/look2hear/metrics/wrapper.py:50-52);
``tdanet_tpu/metrics/bss_eval.py`` reimplements the same algorithm
(length-L FIR projection via Toeplitz normal equations, SDR =
10 log10(coh/(1-coh))) with FFT correlations + Levinson (solve_toeplitz).
This file pins it against a deliberately naive, independent fp64
implementation: the delay matrix is materialized EXPLICITLY
(O(T·L) memory, O(L^2) and worse solves), correlations are plain
matmuls, and the linear system is solved with np.linalg.solve /
np.linalg.lstsq — no FFT, no Levinson recursion. A wrong constant or
off-by-one lag in the fast path cannot agree with this across random
and near-degenerate inputs.
"""
import numpy as np
import pytest

from tdanet_tpu.metrics.bss_eval import sdr_matrix, sdr_pit


def naive_sdr_matrix(refs, ests, filter_length=512, eps=1e-10):
    """Explicit-matrix BSS-eval SDR (independent of the FFT/Toeplitz
    fast path; same eps regularization semantics)."""
    refs = np.asarray(refs, np.float64)
    ests = np.asarray(ests, np.float64)
    n_ref, T = refs.shape
    n_est = ests.shape[0]
    L = filter_length
    out = np.empty((n_est, n_ref))
    for j in range(n_ref):
        # A[t, k] = ref[t - k]: columns are the reference delayed by
        # 0..L-1 over the full convolution span (T+L-1 rows)
        A = np.zeros((T + L - 1, L))
        for k in range(L):
            A[k:k + T, k] = refs[j]
        R = A.T @ A                       # Toeplitz autocorr, explicit
        for i in range(n_est):
            e = np.zeros(T + L - 1)
            e[:T] = ests[i]
            c = A.T @ e                   # cross-correlation, explicit
            h = np.linalg.solve(R + eps * R[0, 0] * np.eye(L), c)
            num = float(h @ c)
            coh = num / (float(e @ e) + eps)
            coh = min(max(coh, eps), 1.0 - 1e-12)
            out[i, j] = 10.0 * np.log10(coh / (1.0 - coh))
    return out


def _mix(rng, n_src, T):
    src = rng.standard_normal((n_src, T))
    mat = np.eye(n_src) + 0.3 * rng.standard_normal((n_src, n_src))
    return src, mat @ src


def test_matches_naive_random():
    rng = np.random.default_rng(0)
    refs, ests = _mix(rng, 2, 4000)
    fast = sdr_matrix(refs, ests, filter_length=512)
    naive = naive_sdr_matrix(refs, ests, filter_length=512)
    np.testing.assert_allclose(fast, naive, rtol=0, atol=1e-6)


def test_matches_naive_three_sources_short_filter():
    rng = np.random.default_rng(1)
    refs, ests = _mix(rng, 3, 2500)
    fast = sdr_matrix(refs, ests, filter_length=128)
    naive = naive_sdr_matrix(refs, ests, filter_length=128)
    np.testing.assert_allclose(fast, naive, rtol=0, atol=1e-6)


def test_matches_naive_near_degenerate_sinusoid():
    """Sinusoidal references make the autocorrelation Toeplitz matrix
    numerically rank-2 — the case where Levinson vs direct solve would
    expose a missing/incorrect regularization."""
    T = 3000
    t = np.arange(T)
    refs = np.stack([np.sin(2 * np.pi * 0.01 * t),
                     np.sin(2 * np.pi * 0.027 * t + 0.3)])
    rng = np.random.default_rng(2)
    ests = refs + 0.05 * rng.standard_normal(refs.shape)
    fast = sdr_matrix(refs, ests, filter_length=64)
    naive = naive_sdr_matrix(refs, ests, filter_length=64)
    # ill-conditioned solves: both paths regularize identically but the
    # Levinson recursion accumulates differently — dB-level agreement
    np.testing.assert_allclose(fast, naive, rtol=0, atol=1e-3)


def test_matches_naive_delayed_copy():
    """est = delayed+scaled ref is exactly representable by the allowed
    FIR distortion -> coh ~ 1, the clamp boundary."""
    rng = np.random.default_rng(3)
    ref = rng.standard_normal(3200)
    est = np.zeros_like(ref)
    est[7:] = 0.8 * ref[:-7]
    other = rng.standard_normal(3200)
    refs = np.stack([ref, other])
    ests = np.stack([est, other + 0.2 * rng.standard_normal(3200)])
    fast = sdr_matrix(refs, ests, filter_length=32)
    naive = naive_sdr_matrix(refs, ests, filter_length=32)
    np.testing.assert_allclose(fast, naive, rtol=0, atol=1e-3)
    # near-perfect projection; the eps*R[0,0] diagonal regularization
    # (identical in both implementations) floors coh ~1e-3 below 1.0
    assert fast[0, 0] > 25.0


def test_matches_naive_independent_noise():
    """est independent of ref -> coh ~ 0, the other clamp boundary."""
    rng = np.random.default_rng(4)
    refs = rng.standard_normal((2, 2000))
    ests = rng.standard_normal((2, 2000))
    fast = sdr_matrix(refs, ests, filter_length=256)
    naive = naive_sdr_matrix(refs, ests, filter_length=256)
    np.testing.assert_allclose(fast, naive, rtol=0, atol=1e-5)
    assert np.all(fast < 3.0)


def test_projection_residual_consistency():
    """Independent formula check: with the optimal FIR projection p = A h,
    SDR must equal 10 log10(||p||^2 / ||e - p||^2) (energy split of the
    orthogonal decomposition), up to the eps regularization."""
    rng = np.random.default_rng(5)
    refs, ests = _mix(rng, 2, 3000)
    L = 128
    fast = sdr_matrix(refs, ests, filter_length=L)
    T = refs.shape[1]
    for j in range(2):
        A = np.zeros((T + L - 1, L))
        for k in range(L):
            A[k:k + T, k] = refs[j]
        for i in range(2):
            e = np.zeros(T + L - 1)
            e[:T] = ests[i]
            h, *_ = np.linalg.lstsq(A, e, rcond=None)
            p = A @ h
            sdr = 10 * np.log10((p @ p) / ((e - p) @ (e - p)))
            assert abs(sdr - fast[i, j]) < 1e-4, (i, j, sdr, fast[i, j])


@pytest.mark.parametrize("n_src", [3, 4])
def test_pit_perm_matches_brute_force(n_src):
    """n_src=4 exercises the Hungarian path (factorial search would
    dominate eval there); both must equal exhaustive search."""
    rng = np.random.default_rng(6)
    refs, ests = _mix(rng, n_src, 2000)
    best, per_src, perm = sdr_pit(refs, ests, filter_length=64)
    mat = naive_sdr_matrix(refs, ests, filter_length=64)
    from itertools import permutations
    naive_best = max(np.mean([mat[i, p] for i, p in enumerate(pm)])
                     for pm in permutations(range(n_src)))
    assert abs(best - naive_best) < 1e-5
    assert abs(np.mean(per_src) - best) < 1e-9
