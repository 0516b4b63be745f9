"""Progressive (adaptive-depth) separation: stage-1 output must equal
the fixed depth-d1 forward, stage-1 + exact continuation must equal the
full-depth forward, and the end-to-end policy must reduce to its two
fixed-depth extremes at threshold -inf/+inf
(tdanet_tpu/progressive.py; recurrence machinery in
models/components.py Recurrent.apply_with_state/continue_apply)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdanet_tpu.models import TDANetBest
from tdanet_tpu.progressive import (separate_progressive,
                                    separate_progressive_stream)

CFG = dict(out_channels=32, in_channels=64, upsampling_depth=4,
           enc_kernel_size=4, num_sources=2, sample_rate=8000)
D_FULL, D1 = 4, 2


@pytest.fixture(scope="module")
def setup():
    model = TDANetBest(num_blocks=D_FULL, **CFG)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    mixes = (rng.standard_normal((5, 8000)) * 0.1).astype(np.float32)
    return model, params, mixes


def test_stage1_matches_fixed_depth(setup):
    model, params, mixes = setup
    x = jnp.asarray(mixes[:2])
    est, state = model.apply_stage1(params, x, depth=D1)
    want = model.apply(params, x, num_blocks=D1)
    np.testing.assert_allclose(np.asarray(est), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    assert state["delta"].shape == (2,)
    assert np.all(np.asarray(state["delta"]) > 0)


def test_continuation_is_exact(setup):
    """depth-d1 state + (full - d1) more iterations IS the full-depth
    program — same weights, same body, split at an iteration boundary."""
    model, params, mixes = setup
    x = jnp.asarray(mixes[:2])
    _, state = model.apply_stage1(params, x, depth=D1)
    got = model.apply_stage2(params, state, n_more=D_FULL - D1,
                             rest=model.pad_rest(mixes.shape[1]))
    want = model.apply(params, x)  # full depth
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_recurrent_state_depth_bounds(setup):
    model, params, _ = setup
    feats = jnp.zeros((1, CFG["out_channels"], 64), jnp.float32)
    for bad in (0, 1, D_FULL + 1):
        with pytest.raises(ValueError, match="n_iter"):
            model.sm.apply_with_state(params["sm"], feats, n_iter=bad)


def test_policy_extremes_reduce_to_fixed_depth(setup):
    """threshold=-1: everything escalates == full depth; threshold=inf:
    nothing escalates == fixed depth1. vmapped per-utterance semantics
    on both paths (batch-MHA quirk)."""
    model, params, mixes = setup

    single = jax.jit(lambda p, w, d: model.apply(
        p, w[None], num_blocks=d)[0], static_argnums=2)
    want_full = np.stack([np.asarray(single(params, jnp.asarray(m),
                                            D_FULL)) for m in mixes])
    want_d1 = np.stack([np.asarray(single(params, jnp.asarray(m), D1))
                        for m in mixes])

    ests, info = separate_progressive(model, params, mixes, depth1=D1,
                                      threshold=-1.0, batch_size=2)
    assert info["n_escalated"] == len(mixes)
    np.testing.assert_allclose(ests, want_full, rtol=1e-4, atol=1e-5)

    ests, info = separate_progressive(model, params, mixes, depth1=D1,
                                      threshold=np.inf, batch_size=2)
    assert info["n_escalated"] == 0
    np.testing.assert_allclose(ests, want_d1, rtol=1e-4, atol=1e-5)


def test_policy_partial_escalation(setup):
    """A mid threshold escalates a strict subset; escalated rows equal
    the full-depth output, the rest equal depth1 — in input order."""
    model, params, mixes = setup
    _, info0 = separate_progressive(model, params, mixes, depth1=D1,
                                    threshold=np.inf, batch_size=2)
    thr = float(np.median(info0["delta"]))
    ests, info = separate_progressive(model, params, mixes, depth1=D1,
                                      threshold=thr, batch_size=2)
    assert 0 < info["n_escalated"] < len(mixes)

    single = jax.jit(lambda p, w, d: model.apply(
        p, w[None], num_blocks=d)[0], static_argnums=2)
    for i, esc in enumerate(info["escalated"]):
        want = np.asarray(single(params, jnp.asarray(mixes[i]),
                                 D_FULL if esc else D1))
        np.testing.assert_allclose(ests[i], want, rtol=1e-4, atol=1e-5)


def _stream_items(model, lengths, seed=1):
    """Variable-length (mix, sources, key) items like an eval dataset."""
    rng = np.random.default_rng(seed)
    items = [((rng.standard_normal(L) * 0.1).astype(np.float32),
              (rng.standard_normal((2, L)) * 0.1).astype(np.float32),
              f"utt{i}") for i, L in enumerate(lengths)]
    return items


def test_stream_matches_fixed_depth_eval(setup):
    """The progressive stream with threshold=inf must reproduce the
    fixed depth-d1 eval path per utterance: lattice-pad, separate, trim
    to the true length, energy-renormalize — on variable-length input
    that spans several buckets and pools stage batches."""
    model, params, _ = setup
    lat = model.lcm
    lengths = [lat * 3, lat * 3 - 7, lat * 5, lat * 3, lat * 5 - 1]
    items = _stream_items(model, lengths)

    got = {}
    stats = {}
    stream = separate_progressive_stream(
        model, params, lengths, lambda i: items[i], depth1=D1,
        threshold=np.inf, batch_size=2, group_size=3, stats=stats)
    for i, item, est in stream:
        assert item[2] == f"utt{i}"
        got[i] = est
    assert sorted(got) == list(range(len(lengths)))
    assert stats["n"] == len(lengths) and stats["n_escalated"] == 0
    assert stats["depth1"] == D1 and stats["depth_full"] == D_FULL

    single = jax.jit(lambda p, w: model.apply(
        p, w[None], num_blocks=D1)[0])
    for i, L in enumerate(lengths):
        target = -(-L // lat) * lat
        pad = np.zeros(target, np.float32)
        pad[:L] = items[i][0]
        out = np.asarray(single(params, jnp.asarray(pad)))[:, :L]
        scale = np.abs(items[i][0]).sum() / (np.abs(out).sum() + 1e-8)
        assert got[i].shape == (2, L)
        np.testing.assert_allclose(got[i], out * scale,
                                   rtol=1e-4, atol=1e-5)


def test_stream_escalation_pools_and_is_exact(setup):
    """threshold=-1 escalates everything: stream output must equal the
    full-depth fixed eval per utterance, and the stats census must
    record every escalation."""
    model, params, _ = setup
    lat = model.lcm
    lengths = [lat * 3, lat * 3, lat * 3 - 5, lat * 3]
    items = _stream_items(model, lengths, seed=2)

    stats = {}
    got = dict((i, est) for i, _it, est in separate_progressive_stream(
        model, params, lengths, lambda i: items[i], depth1=D1,
        threshold=-1.0, batch_size=2, stats=stats))
    assert stats["n_escalated"] == len(lengths)
    assert stats["delta_mean"] > 0

    single = jax.jit(lambda p, w: model.apply(p, w[None])[0])
    for i, L in enumerate(lengths):
        target = -(-L // lat) * lat
        pad = np.zeros(target, np.float32)
        pad[:L] = items[i][0]
        out = np.asarray(single(params, jnp.asarray(pad)))[:, :L]
        scale = np.abs(items[i][0]).sum() / (np.abs(out).sum() + 1e-8)
        np.testing.assert_allclose(got[i], out * scale,
                                   rtol=1e-4, atol=1e-5)


def test_progressive_dp_mesh_matches_single_device(setup):
    """separate_progressive over a dp=2 mesh must equal the unsharded
    run exactly (same compiled math, batch axis sharded) — including
    the escalation gather on the dp-sharded stage-1 state."""
    import jax as _jax
    from tdanet_tpu.parallel import make_mesh
    model, params, mixes = setup
    mesh = make_mesh(dp=2, tp=1, devices=_jax.devices()[:2])

    _, info0 = separate_progressive(model, params, mixes, depth1=D1,
                                    threshold=np.inf, batch_size=2)
    thr = float(np.median(info0["delta"]))
    want, info_w = separate_progressive(model, params, mixes, depth1=D1,
                                        threshold=thr, batch_size=2)
    got, info_g = separate_progressive(model, params, mixes, depth1=D1,
                                       threshold=thr, batch_size=2,
                                       mesh=mesh)
    assert info_g["n_escalated"] == info_w["n_escalated"] > 0
    np.testing.assert_allclose(info_g["delta"], info_w["delta"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError, match="multiple"):
        separate_progressive(model, params, mixes, depth1=D1,
                             batch_size=3, mesh=mesh)


def test_progressive_css_stitch(setup):
    """stitch_segments(progressive_depth=d1, threshold=-1) must equal
    the plain (full-depth) stitch — the progressive forward at
    escalate-everything IS the fixed forward; threshold=inf gives the
    depth-d1 stitch (different output, same shape)."""
    from tdanet_tpu.utils.css import stitch_segments
    model, params, _ = setup
    lat = model.lcm
    rng = np.random.default_rng(7)
    segs = [(rng.standard_normal(lat * 3) * 0.1).astype(np.float32)
            for _ in range(3)]
    overlap = lat

    want = stitch_segments(model, params, segs, overlap)
    got = stitch_segments(model, params, segs, overlap,
                          progressive_depth=D1,
                          progressive_threshold=-1.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    shallow = stitch_segments(model, params, segs, overlap,
                              progressive_depth=D1,
                              progressive_threshold=np.inf)
    assert shallow.shape == want.shape
    assert not np.allclose(shallow, want, atol=1e-3)


def test_guards(setup):
    """Loud failures instead of mislabeled sweeps: depth_full beyond
    the trained recurrence count, and a model without the staged apply
    surface; threshold=0 must escalate exact-zero deltas (all-silent
    input) — the documented 'escalate everything' A/B mode."""
    model, params, mixes = setup
    with pytest.raises(ValueError, match="trained depth"):
        separate_progressive(model, params, mixes, depth1=D1,
                             depth_full=D_FULL + 1)

    class NotStaged:
        num_blocks = D_FULL
    with pytest.raises(TypeError, match="TDANetBest"):
        separate_progressive(NotStaged(), params, mixes, depth1=D1)

    silent = np.zeros((2, 8000), np.float32)
    _, info = separate_progressive(model, params, silent, depth1=D1,
                                   threshold=0.0, batch_size=2)
    assert info["n_escalated"] == 2  # delta == 0 exactly, still escalated


def test_stream_empty_plan_census(setup):
    """Zero utterances: the stream must terminate and still leave a
    complete census (audio_test.py prints delta_mean unconditionally)."""
    model, params, _ = setup
    stats = {}
    out = list(separate_progressive_stream(
        model, params, [], lambda i: None, depth1=D1, stats=stats))
    assert out == []
    assert stats["n"] == 0 and stats["n_escalated"] == 0
    assert stats["delta_mean"] == 0.0
    assert stats["depth1"] == D1 and stats["depth_full"] == D_FULL
