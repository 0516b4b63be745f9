"""High-level separation helpers (reference: utils/separator.py:27-75):
device-safe separate() with output energy renormalization, for numpy or
jax arrays, with jit caching bucketed on the model's stride lattice."""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp


def depth_kw(num_blocks):
    """Early-exit depth override kwarg (only models exposing the knob
    accept it; None keeps every model's trained depth)."""
    return {} if num_blocks is None else {"num_blocks": num_blocks}


@lru_cache(maxsize=64)
def _compiled_forward(model, length, compute_dtype, num_blocks=None):
    kw = depth_kw(num_blocks)
    return jax.jit(
        lambda params, wav: model.apply(params, wav,
                                        compute_dtype=compute_dtype, **kw))


def separate_batched(model, params, wavs, batch_size=8, compute_dtype=None,
                     lattice=None, num_blocks=None, mesh=None):
    """Batched bucketed separation of variable-length utterances.

    The reference eval loop runs batch=1 with a fresh dynamic shape per
    utterance (audio_test.py:111-134). Here utterances are grouped into
    length buckets on the model's stride lattice, padded, and separated
    ``batch_size`` at a time — each bucket shape compiles once and the
    MXU stays fed. Returns outputs in the input order, each trimmed to
    its true length and energy-renormalized per utterance.

    The batch is mapped with ``jax.vmap`` rather than a plain batch axis:
    the unfixed-MHA models attend over the BATCH axis (the reference
    checkpoint quirk), so naive batching would leak information across
    utterances and change results vs the reference's batch=1 eval. vmap
    keeps exact batch=1 semantics per example while XLA still executes
    the whole batch in one fused program.

    ``mesh``: scale-out over a device mesh (beyond reference, which is
    single-GPU at eval) — the padded batch axis shards over 'dp' and
    params replicate, so N chips each separate batch_size/N utterances
    of the same compiled program. Batches are padded to a full
    ``batch_size`` rows (static shape, a multiple of dp).
    """
    if mesh is not None:
        from tdanet_tpu.parallel.mesh import dp_batch_setup
        x_sharding, params = dp_batch_setup(mesh, batch_size, params)
    lattice = lattice or getattr(model, "lcm", 1)
    buckets = {}
    for i, w in enumerate(wavs):
        T = int(np.asarray(w).shape[-1])
        target = -(-T // lattice) * lattice
        buckets.setdefault(target, []).append(i)

    fwd_cache = {}
    kw = depth_kw(num_blocks)

    def get_fwd(target):
        if target not in fwd_cache:
            fwd_cache[target] = jax.jit(jax.vmap(
                lambda p, w: model.apply(p, w[None],
                                         compute_dtype=compute_dtype,
                                         **kw)[0],
                in_axes=(None, 0)))
        return fwd_cache[target]

    outputs = [None] * len(wavs)
    for target, idxs in sorted(buckets.items()):
        fwd = get_fwd(target)
        for s in range(0, len(idxs), batch_size):
            chunk = idxs[s:s + batch_size]
            rows = batch_size if mesh is not None else len(chunk)
            batch = np.zeros((rows, target), np.float32)
            for row, i in enumerate(chunk):
                w = np.asarray(wavs[i], np.float32)
                batch[row, :w.shape[-1]] = w
            xb = jnp.asarray(batch) if mesh is None else \
                jax.device_put(batch, x_sharding)
            est = np.asarray(fwd(params, xb))
            for row, i in enumerate(chunk):
                T = int(np.asarray(wavs[i]).shape[-1])
                out = est[row, :, :T]
                scale = (np.abs(wavs[i]).sum()
                         / (np.abs(out).sum() + 1e-8))
                outputs[i] = out * scale
    return outputs


def separate(model, params, wav, compute_dtype=None, lattice=None,
             num_blocks=None):
    """wav: (T,) or (B, T) numpy/jax -> separated (n_src, T)/(B, n_src, T).

    Variable lengths are bucketed up to the model's lattice so repeated
    calls share compiled programs; outputs are trimmed back.
    """
    is_numpy = isinstance(wav, np.ndarray)
    x = jnp.asarray(wav, jnp.float32)
    was_1d = x.ndim == 1
    if was_1d:
        x = x[None]
    T = x.shape[-1]
    lattice = lattice or getattr(model, "lcm", 1)
    target = -(-T // lattice) * lattice
    if target != T:
        x = jnp.pad(x, ((0, 0), (0, target - T)))
    fwd = _compiled_forward(model, target, compute_dtype, num_blocks)
    out = fwd(params, x)[..., :T]
    x = x[..., :T]
    # per-utterance energy renormalization over the true region.
    # Deliberate divergence from separator.py:63, which sums |.| over
    # the WHOLE tensor — coupling utterances at B>1. The reference only
    # ever calls it at B=1 (where the two are identical); per-utterance
    # keeps batched results equal to the reference's batch=1 behavior.
    scale = jnp.sum(jnp.abs(x), axis=-1)[:, None, None] / (
        jnp.sum(jnp.abs(out), axis=(-1, -2))[:, None, None] + 1e-8)
    out = out * scale
    if was_1d:
        out = out[0]
    return np.asarray(out) if is_numpy else out


def plan_lattice_buckets(lengths, lattice, group):
    """Shared eval-stream planning: bucket utterance indices by their
    length padded up to the model's stride ``lattice`` (each padded
    shape compiles once), then split every bucket into chunks of
    ``group`` indices. Returns ``[(padded_len, [idx, ...]), ...]`` —
    corpus order preserved within a bucket. Used by both the
    fixed-depth and the progressive eval streams so their bucketing
    semantics cannot drift."""
    buckets = {}
    for i in range(len(lengths)):
        target = -(-int(lengths[i]) // lattice) * lattice
        buckets.setdefault(target, []).append(i)
    plan = []
    for target, idxs in sorted(buckets.items()):
        for s in range(0, len(idxs), group):
            plan.append((target, idxs[s:s + group]))
    return plan


def start_prefetch_reader(plan, get_item, depth):
    """Start the eval-stream reader thread: prefetches ``get_item(i)``
    in plan order, at most ``depth`` items ahead. Returns
    ``(queue, thread)``; the consumer must ``get()`` exactly one item
    per planned index (overlaps audio IO with device compute — the
    reference eval loop, audio_test.py:111-134, serializes them)."""
    import queue as _queue
    import threading

    q = _queue.Queue(maxsize=max(1, depth))

    def reader():
        for _target, chunk in plan:
            for i in chunk:
                q.put(get_item(i))

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    return q, t


def trim_renorm(mix, est_row):
    """Trim a padded (n_src, T_pad) estimate to the mixture's true
    length and apply the reference's per-utterance energy
    renormalization over the true region (separator.py:63). The single
    definition both eval streams share."""
    T = mix.shape[-1]
    out = est_row[:, :T]
    scale = np.abs(mix).sum() / (np.abs(out).sum() + 1e-8)
    return out * scale


def separate_batched_stream(model, params, lengths, get_item,
                            batch_size=8, compute_dtype=None, lattice=None,
                            prefetch=2, num_blocks=None, mesh=None):
    """Streaming variant of :func:`separate_batched` for eval pipelines.

    Same bucketed vmap semantics, but audio IO overlaps device compute
    (the reference eval loop — audio_test.py:111-134 — serializes
    load/forward/metrics per utterance):

    - ``lengths[i]`` gives utterance i's sample count WITHOUT loading it
      (manifests carry lengths), so buckets are planned upfront;
    - a reader thread prefetches ``get_item(i)`` in processing order,
      ``prefetch`` batches ahead;
    - the device pipeline is one batch deep: batch k+1 is dispatched
      before batch k's result is materialized, so host-side metric/IO
      work on batch k runs while the chip executes batch k+1.

    Yields ``(i, item, est)`` in bucket processing order, where ``est``
    is the trimmed, energy-renormalized (n_src, T_i) numpy estimate and
    ``item`` is whatever ``get_item`` returned (its first element must
    be the mixture waveform).
    """
    if mesh is not None:  # dp scale-out, same contract as separate_batched
        from tdanet_tpu.parallel.mesh import dp_batch_setup
        x_sharding, params = dp_batch_setup(mesh, batch_size, params)
    lattice = lattice or getattr(model, "lcm", 1)
    plan = plan_lattice_buckets(lengths, lattice, batch_size)
    q, t = start_prefetch_reader(plan, get_item,
                                 max(1, prefetch) * batch_size)

    fwd_cache = {}
    kw = depth_kw(num_blocks)

    def get_fwd(target):
        if target not in fwd_cache:
            fwd_cache[target] = jax.jit(jax.vmap(
                lambda p, w: model.apply(p, w[None],
                                         compute_dtype=compute_dtype,
                                         **kw)[0],
                in_axes=(None, 0)))
        return fwd_cache[target]

    def materialize(pending):
        target, chunk, items, est_dev = pending
        est = np.asarray(est_dev, np.float32)
        for row, i in enumerate(chunk):
            mix = np.asarray(items[row][0], np.float32)
            yield i, items[row], trim_renorm(mix, est[row])

    pending = None
    for target, chunk in plan:
        items = [q.get() for _ in chunk]
        # always pad the batch axis to batch_size: a ragged final chunk
        # would otherwise compile a SECOND multi-minute TPU program per
        # bucket for its remainder shape (rows are independent under
        # vmap; materialize() trims by chunk)
        batch = np.zeros((batch_size, target), np.float32)
        for row, it in enumerate(items):
            w = np.asarray(it[0], np.float32)
            batch[row, :w.shape[-1]] = w
        xb = jnp.asarray(batch) if mesh is None else \
            jax.device_put(batch, x_sharding)
        est_dev = get_fwd(target)(params, xb)  # async
        if pending is not None:
            yield from materialize(pending)
        pending = (target, chunk, items, est_dev)
    if pending is not None:
        yield from materialize(pending)
    t.join()
