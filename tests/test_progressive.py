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
from tdanet_tpu.progressive import separate_progressive

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
