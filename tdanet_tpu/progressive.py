"""Progressive (adaptive-depth) batched separation.

The flagship separator applies ONE shared-weight UConvBlock 16 times
(reference: the fixed-depth Recurrent loop, TDANet_best.py:383-399).
The early-exit study (docs/PERF.md) showed depth is a latency/quality
knob — but a FIXED lower depth pays its quality cost on every
utterance. This module makes the depth adaptive per utterance with no
approximation on the escalated path:

1. stage 1: every utterance runs at a cheap depth d1; the recurrence
   also emits a per-example convergence proxy
   ``delta = ||x_d1 - x_{d1-1}|| / ||x_d1||`` (how much the last
   iteration still moved the solution);
2. stage 2: utterances with ``delta > threshold`` CONTINUE — exactly,
   from the saved carry, through the same recurrence body — to full
   depth. Continuation is not a re-run: depth-d1 state + (16 - d1)
   more iterations IS the depth-16 program (pinned by
   tests/test_progressive.py).

Compute cost: N*d1 + N_escalated*(d_full - d1) block iterations
instead of N*d_full, at full-depth quality for every utterance the
proxy flags. Both stages are fixed-shape jit programs (one compile
each); escalated utterances are gathered ON DEVICE into full batches,
so host<->device traffic stays [mixes in, estimates + one tiny delta
vector out] — the transfer floor of the plain eval path.

vmap preserves the reference's per-utterance batch=1 MHA semantics
(the batch-axis attention quirk; see utils/separator.py).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp


@lru_cache(maxsize=32)
def _compiled_stages(model, depth1, n_more, rest, compute_dtype):
    """One (stage1, stage2) jit pair per configuration — repeated
    separate_progressive calls (sweeps, serving loops) must reuse the
    compiled programs, not retrace fresh lambdas (a recompile is
    minutes on the tunneled TPU)."""

    def _s1(p, w):
        est, st = model.apply_stage1(p, w[None], depth=depth1,
                                     compute_dtype=compute_dtype)
        return est[0], jax.tree_util.tree_map(lambda a: a[0], st)

    def _s2(p, st):
        return model.apply_stage2(
            p, jax.tree_util.tree_map(lambda a: a[None], st),
            n_more=n_more, rest=rest)[0]

    stage1 = jax.jit(lambda p, x: jax.vmap(_s1, in_axes=(None, 0))(p, x))
    stage2 = jax.jit(lambda p, st: jax.vmap(_s2, in_axes=(None, 0))(p, st))
    return stage1, stage2


def separate_progressive(model, params, mixes, depth1=8, depth_full=None,
                         threshold=0.05, batch_size=8,
                         compute_dtype=None, mesh=None):
    """Adaptive-depth separation of ``mixes`` (N, T) equal-length
    mixtures. Returns ``(ests, info)``: ests (N, n_src, T) float32 in
    input order; info carries per-utterance ``delta``, the boolean
    ``escalated`` mask, and the depths used.

    ``threshold``: escalate utterances with delta above it. 0 or
    negative escalates everything (== fixed full depth, for A/Bs);
    ``np.inf`` escalates nothing (== fixed depth1). Stage-1 states are
    kept on device until the escalation pass, so memory scales with N —
    chunk the corpus for very large N.

    ``mesh``: dp scale-out (same contract as separate_batched): every
    stage-1/stage-2 batch shards its batch axis over 'dp', params
    replicate, and the escalation gather runs on the sharded state.
    """
    if not hasattr(model, "apply_stage1"):
        raise TypeError(
            f"progressive separation needs a model with the staged "
            f"apply surface (apply_stage1/apply_stage2/pad_rest — the "
            f"flagship TDANetBest); {type(model).__name__} has none. "
            f"Use utils.separator.separate_batched for other models.")
    mixes = np.asarray(mixes, np.float32)
    N, T = mixes.shape
    depth_full = depth_full if depth_full is not None else model.num_blocks
    if depth_full > model.num_blocks:
        # continue_apply would happily extrapolate past the trained
        # iteration count that Recurrent.apply rejects — same loud
        # failure here instead of a mislabeled sweep (components.py
        # n_iter bound)
        raise ValueError(
            f"depth_full ({depth_full}) exceeds the trained depth "
            f"({model.num_blocks})")
    n_more = depth_full - depth1
    if n_more <= 0:
        raise ValueError(f"depth_full ({depth_full}) must exceed "
                         f"depth1 ({depth1})")
    rest = model.pad_rest(T)
    n_src = model.num_sources
    stage1, stage2 = _compiled_stages(model, depth1, n_more, rest,
                                      compute_dtype)
    x_sharding = None
    if mesh is not None:
        # no-op (device_put short-circuits) when the caller already
        # placed the params — separate_progressive_stream does the
        # setup once so per-group calls don't re-transfer the tree
        from tdanet_tpu.parallel.mesh import dp_batch_setup
        x_sharding, params = dp_batch_setup(mesh, batch_size, params)

    return progressive_loop(stage1, stage2, params, mixes, n_src,
                            threshold, batch_size, x_sharding,
                            depth1=depth1, depth_full=depth_full)


def progressive_loop(stage1, stage2, params, mixes, n_src, threshold,
                     batch_size, x_sharding=None, *, depth1, depth_full):
    """Host orchestration shared by :func:`separate_progressive` and the
    deployment-bundle path (deploy.load_progressive): stage-1 sweep,
    threshold census, device-side escalation gather, stage-2
    continuation. ``stage1``/``stage2`` are the compiled batch programs
    — jitted model closures here, deserialized StableHLO in a bundle —
    so the two paths are the same code and their outputs bit-identical."""
    mixes = np.asarray(mixes, np.float32)
    N, T = mixes.shape

    def _place(x):
        return jnp.asarray(x) if x_sharding is None else \
            jax.device_put(x, x_sharding)

    ests = np.zeros((N, n_src, T), np.float32)
    deltas = np.zeros(N, np.float32)
    states = []
    for s0 in range(0, N, batch_size):
        n_rows = min(N, s0 + batch_size) - s0
        xb = np.zeros((batch_size, T), np.float32)
        xb[:n_rows] = mixes[s0:s0 + n_rows]
        est, st = stage1(params, _place(xb))
        ests[s0:s0 + n_rows] = np.asarray(est, np.float32)[:n_rows]
        deltas[s0:s0 + n_rows] = np.asarray(st["delta"],
                                            np.float32)[:n_rows]
        states.append(st)

    # threshold <= 0 is the documented "escalate everything" A/B mode —
    # a strict > would skip exact-zero deltas (e.g. all-silent inputs)
    escalated = (deltas > threshold) if threshold > 0 else \
        np.ones(N, bool)
    hard = np.where(escalated)[0]
    if len(hard):
        # device-side gather: utterance i sits at concat row i (every
        # stage-1 batch contributes exactly batch_size rows, pads last)
        state_cat = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs), *states)
        for c0 in range(0, len(hard), batch_size):
            chunk = hard[c0:c0 + batch_size]
            pad_idx = np.concatenate(
                [chunk, np.full(batch_size - len(chunk), chunk[-1],
                                np.int64)])
            st = jax.tree_util.tree_map(
                lambda a: a[jnp.asarray(pad_idx)], state_cat)
            if x_sharding is not None:
                # re-shard the gathered rows over dp so stage 2 runs
                # the same one compiled dp program every batch
                st = jax.device_put(st, x_sharding)
            est2 = stage2(params, st)
            ests[chunk] = np.asarray(est2, np.float32)[:len(chunk)]

    return ests, {"delta": deltas, "escalated": escalated,
                  "depth1": depth1, "depth_full": depth_full,
                  "n_escalated": int(escalated.sum())}


def separate_progressive_stream(model, params, lengths, get_item,
                                depth1=8, depth_full=None, threshold=0.05,
                                batch_size=8, group_size=None,
                                compute_dtype=None, lattice=None,
                                prefetch=2, stats=None, mesh=None):
    """Adaptive-depth eval stream over variable-length utterances —
    the progressive counterpart of
    :func:`tdanet_tpu.utils.separator.separate_batched_stream` (same
    interface: ``lengths[i]`` plans buckets without loading audio,
    ``get_item(i)`` is prefetched on a reader thread, yields
    ``(i, item, est)`` with ``est`` trimmed to the true length and
    energy-renormalized exactly like the fixed-depth eval path).

    Utterances are bucketed on the model's stride lattice (each bucket
    shape compiles its own stage pair) and processed in groups of
    ``group_size`` (default ``4 * batch_size``) so stage-2 escalations
    POOL across stage-1 batches — a group with 5 flagged utterances
    spread over 4 batches runs one escalation batch, not four.

    ``stats`` (optional dict) is updated in place with the running
    escalation census: ``n``, ``n_escalated``, ``delta_mean``,
    ``depth1``, ``depth_full``. ``mesh``: dp scale-out, forwarded to
    :func:`separate_progressive` (batch_size must divide dp).
    """
    from tdanet_tpu.utils.separator import (plan_lattice_buckets,
                                            start_prefetch_reader,
                                            trim_renorm)

    if mesh is not None:
        # place the replicated param tree ONCE; the per-group
        # separate_progressive calls then re-put a no-op (the
        # fixed-depth stream does the same hoist)
        from tdanet_tpu.parallel.mesh import dp_batch_setup
        _, params = dp_batch_setup(mesh, batch_size, params)
    lattice = lattice or getattr(model, "lcm", 1)
    group = group_size or 4 * batch_size
    plan = plan_lattice_buckets(lengths, lattice, group)
    q, t = start_prefetch_reader(plan, get_item,
                                 max(1, prefetch) * batch_size)

    if stats is not None:
        stats.update(n=0, n_escalated=0, delta_sum=0.0, delta_mean=0.0,
                     depth1=depth1,
                     depth_full=(depth_full if depth_full is not None
                                 else model.num_blocks))
    for target, chunk in plan:
        items = [q.get() for _ in chunk]
        mixes = np.zeros((len(chunk), target), np.float32)
        for row, it in enumerate(items):
            w = np.asarray(it[0], np.float32)
            mixes[row, :w.shape[-1]] = w
        ests, info = separate_progressive(
            model, params, mixes, depth1=depth1, depth_full=depth_full,
            threshold=threshold, batch_size=batch_size,
            compute_dtype=compute_dtype, mesh=mesh)
        if stats is not None:
            stats["n"] += len(chunk)
            stats["n_escalated"] += info["n_escalated"]
            stats["delta_sum"] += float(info["delta"].sum())
            stats["delta_mean"] = stats["delta_sum"] / stats["n"]
        for row, i in enumerate(chunk):
            mix = np.asarray(items[row][0], np.float32)
            yield i, items[row], trim_renorm(mix, ests[row])
    t.join()
