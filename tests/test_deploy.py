"""Deployment bundles: jax.export-serialized serving programs.

The exported artifact must reproduce the in-framework bucketed eval
exactly (same vmapped batch=1-semantics forward, same trim/renorm —
reference eval loop: audio_test.py:111-134, renorm separator.py:63) and
load WITHOUT the model code."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from tdanet_tpu import deploy
from tdanet_tpu.models import TDANetBest
from tdanet_tpu.utils.separator import separate_batched

SR = 8000


def build():
    model = TDANetBest(out_channels=32, in_channels=64, num_blocks=1,
                       upsampling_depth=4, enc_kernel_size=4,
                       num_sources=2, sample_rate=SR)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def make_wavs(rng, lengths_s):
    return [(rng.standard_normal(int(SR * s)) * 0.1).astype(np.float32)
            for s in lengths_s]


def test_bundle_roundtrip_matches_separator(tmp_path):
    """Lattice-exact routing: every utterance runs in the program of its
    own stride-lattice round-up, so outputs equal the in-framework
    bucketed eval exactly (same pad, same vmapped program)."""
    model, params = build()
    rng = np.random.default_rng(1)
    lengths_s = [0.5, 0.43, 0.9, 0.77, 0.5]
    wavs = make_wavs(rng, lengths_s)

    meta = deploy.save_bundle(str(tmp_path), model, params,
                              lengths=lengths_s, batch_size=3)
    assert meta["model_name"] == "TDANetBest"
    assert set(os.listdir(tmp_path / "programs")) == {
        f"T{t}_B3.shlo" for t in meta["targets"]}

    dep = deploy.load_bundle(str(tmp_path))
    got = dep.separate_batched(wavs)
    want = separate_batched(model, params, wavs, batch_size=3)
    for g, w, src in zip(got, want, wavs):
        assert g.shape == (2, src.shape[-1])
        np.testing.assert_allclose(g, np.asarray(w), rtol=1e-5, atol=1e-6)


def test_bundle_coarse_routing(tmp_path):
    """Without the exact program: default raises with guidance; coarse
    mode routes up a bucket and stays a small, renorm-compensated
    approximation of the exact result."""
    model, params = build()
    rng = np.random.default_rng(4)
    wav = make_wavs(rng, [0.43])[0]

    deploy.save_bundle(str(tmp_path), model, params, lengths=[0.6],
                       batch_size=2)
    with pytest.raises(ValueError, match="lattice-exact"):
        deploy.load_bundle(str(tmp_path)).separate(wav)

    dep = deploy.load_bundle(str(tmp_path), coarse=True)
    got = dep.separate(wav)
    assert got.shape == (2, wav.shape[-1])
    # approximate: padding past the lattice round-up shifts the GlobLN
    # statistics, so this genuinely differs from the lattice-exact run
    want = separate_batched(model, params, [wav], batch_size=2)[0]
    assert np.abs(got - np.asarray(want)).max() > 0
    # ...but the trim/renorm contract still holds exactly:
    # sum|est| == sum|mix| by construction (separator.py:63 semantics)
    np.testing.assert_allclose(np.abs(got).sum(), np.abs(wav).sum(),
                               rtol=1e-4)


def test_bundle_single_reweight_and_errors(tmp_path):
    model, params = build()
    rng = np.random.default_rng(2)
    wav = make_wavs(rng, [0.6])[0]

    deploy.save_bundle(str(tmp_path), model, params, lengths=[0.6],
                       batch_size=2)
    dep = deploy.load_bundle(str(tmp_path))
    out = dep.separate(wav)
    assert out.shape == (2, wav.shape[-1])

    # utterance longer than every exported bucket -> clear error even
    # under coarse routing
    dep_c = deploy.load_bundle(str(tmp_path), coarse=True)
    with pytest.raises(ValueError, match="exceeds every exported bucket"):
        dep_c.separate(make_wavs(rng, [1.5])[0])

    # weights are program ARGUMENTS: swapping them changes the output
    # without re-exporting (and without model code)
    params2 = model.init(jax.random.PRNGKey(7))
    np.savez(tmp_path / "params2.npz", **deploy._flatten(params2))
    dep2 = deploy.load_bundle(str(tmp_path),
                              params_npz=str(tmp_path / "params2.npz"))
    out2 = dep2.separate(wav)
    assert not np.allclose(out, out2)
    want2 = separate_batched(model, params2, [wav], batch_size=2)[0]
    np.testing.assert_allclose(out2, np.asarray(want2), rtol=1e-5, atol=1e-6)


def test_bundle_flatten_roundtrip():
    model, params = build()
    flat = deploy._flatten(params)
    tree = deploy._unflatten(flat)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves2, treedef2 = jax.tree_util.tree_flatten(tree)
    assert treedef == treedef2
    for a, b in zip(leaves, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_streaming_from_bundle(tmp_path):
    """A bundle exported with streaming=... serves live streams through
    serving.MultiStreamSeparator's exact stitching semantics, forward
    from the deserialized program — outputs equal the model-code
    engine."""
    model, params = build()
    meta = deploy.save_bundle(
        str(tmp_path), model, params,
        streaming=dict(segment=1.0, max_streams=2, overlap=0.25))
    assert meta["streaming"]["seg_len"] == SR
    assert meta["streaming"]["n_src"] == 2
    # streaming-only bundle: the batched loader must point at
    # load_streaming instead of returning something broken
    with pytest.raises(ValueError, match="streaming-only"):
        deploy.load_bundle(str(tmp_path))

    from tdanet_tpu.serving import MultiStreamSeparator
    engines = {
        "bundle": deploy.load_streaming(str(tmp_path)),
        "direct": MultiStreamSeparator(model, params, max_streams=2,
                                       segment=1.0, overlap=0.25,
                                       sample_rate=SR, dw_fold=False),
    }
    rng = np.random.default_rng(5)
    wavs = {sid: (rng.standard_normal(int(SR * 2.6)) * 0.1
                  ).astype(np.float32) for sid in ("a", "b")}
    outs = {}
    for name, eng in engines.items():
        parts = {sid: [] for sid in wavs}
        for sid, w in wavs.items():
            eng.open(sid)
            eng.push(sid, w)
        while True:
            got = eng.step()
            if not got:
                break
            for sid, est in got.items():
                parts[sid].append(est)
        for sid in wavs:
            parts[sid].append(eng.flush(sid))
        outs[name] = {sid: np.concatenate(parts[sid], axis=1)
                      for sid in wavs}
    for sid in wavs:
        assert outs["bundle"][sid].shape == outs["direct"][sid].shape
        assert outs["bundle"][sid].shape[0] == 2
        np.testing.assert_allclose(outs["bundle"][sid],
                                   outs["direct"][sid],
                                   rtol=1e-5, atol=1e-6)


def build_deep(num_blocks=3):
    model = TDANetBest(out_channels=32, in_channels=64,
                       num_blocks=num_blocks, upsampling_depth=4,
                       enc_kernel_size=4, num_sources=2, sample_rate=SR)
    return model, model.init(jax.random.PRNGKey(0))


def test_bundle_early_exit_programs(tmp_path):
    """early_exit=[d] exports one extra program per (depth, bucket);
    load_bundle(num_blocks=d) serves it bit-identically to the
    in-framework early-exit engine (the depth knob, docs/PERF.md)."""
    model, params = build_deep()
    rng = np.random.default_rng(6)
    wavs = make_wavs(rng, [0.5, 0.43])

    meta = deploy.save_bundle(str(tmp_path), model, params,
                              lengths=[0.5, 0.43], batch_size=2,
                              early_exit=[1])
    assert meta["early_exit"] == [1]
    assert all(
        os.path.exists(tmp_path / "programs" / f"E1_T{t}_B2.shlo")
        for t in meta["targets"])

    # full-depth default still routes to the T programs
    dep_full = deploy.load_bundle(str(tmp_path))
    want_full = separate_batched(model, params, wavs, batch_size=2)
    for g, w in zip(dep_full.separate_batched(wavs), want_full):
        np.testing.assert_allclose(g, np.asarray(w), rtol=1e-5, atol=1e-6)

    dep1 = deploy.load_bundle(str(tmp_path), num_blocks=1)
    want1 = separate_batched(model, params, wavs, batch_size=2,
                             num_blocks=1)
    for g, w, full in zip(dep1.separate_batched(wavs), want1, want_full):
        np.testing.assert_allclose(g, np.asarray(w), rtol=1e-5, atol=1e-6)
        assert np.abs(g - np.asarray(full)).max() > 1e-4  # a real knob

    with pytest.raises(ValueError, match="early-exit depths"):
        deploy.load_bundle(str(tmp_path), num_blocks=2)

    # validation: depths outside (0, num_blocks) refuse at export
    with pytest.raises(ValueError, match="early_exit depth"):
        deploy.save_bundle(str(tmp_path / "bad"), model, params,
                           lengths=[0.5], batch_size=2, early_exit=[3])

    # early_exit without length buckets would advertise depths with
    # zero programs — refuse at export, not at separate() time
    with pytest.raises(ValueError, match="needs lengths"):
        deploy.save_bundle(str(tmp_path / "bad"), model, params,
                           lengths=[], batch_size=2, early_exit=[1])

    # a pre-guard bundle whose early-exit programs are gone must fail
    # loudly at load, not with a lattice-routing error at separate()
    for t in meta["targets"]:
        os.remove(tmp_path / "programs" / f"E1_T{t}_B2.shlo")
    with pytest.raises(ValueError, match="no early-exit programs"):
        deploy.load_bundle(str(tmp_path), num_blocks=1)


def test_bundle_progressive_matches_engine(tmp_path):
    """progressive=dict(depth1=...) exports the stage pair; the loaded
    separator runs the SAME progressive_loop orchestration as
    tdanet_tpu.progressive — outputs bit-identical at every threshold
    regime (VERDICT r3 #7), without model code."""
    from tdanet_tpu.progressive import separate_progressive
    from tdanet_tpu.utils.separator import trim_renorm

    model, params = build_deep()
    rng = np.random.default_rng(7)
    wavs = make_wavs(rng, [0.5, 0.5, 0.43])

    # stage-2 must not extrapolate the shared-weight recurrence past
    # the trained iteration count (components.py n_iter bound)
    with pytest.raises(ValueError, match="exceeds the trained depth"):
        deploy.save_bundle(str(tmp_path / "bad"), model, params,
                           lengths=[0.5], batch_size=2,
                           progressive=dict(depth1=2, depth_full=5))

    meta = deploy.save_bundle(str(tmp_path), model, params,
                              lengths=[0.5, 0.43], batch_size=2,
                              progressive=dict(depth1=2, threshold=0.05))
    assert meta["progressive"] == {"depth1": 2, "depth_full": 3,
                                   "threshold": 0.05}

    dep = deploy.load_progressive(str(tmp_path))
    assert dep.n_src == 2
    for thr in (-1.0, np.inf, 0.05):
        stats = {}
        got = dep.separate_batched(wavs, threshold=thr, stats=stats)
        assert stats["n"] == 3
        # engine reference: bucket exactly like the bundle and run the
        # in-framework progressive path on the padded batches
        for i, w in enumerate(wavs):
            T = w.shape[-1]
            target = -(-T // dep.lattice) * dep.lattice
            mix = np.zeros((1, target), np.float32)
            mix[0, :T] = w
            ests, _ = separate_progressive(
                model, params, mix, depth1=2, threshold=thr,
                batch_size=2)
            want = trim_renorm(w, ests[0])
            np.testing.assert_allclose(got[i], want, rtol=1e-5,
                                       atol=1e-6)
        if thr == np.inf:
            assert stats["n_escalated"] == 0
        elif thr == -1.0:
            assert stats["n_escalated"] == 3

    # loader guidance when the bundle has no progressive programs
    deploy.save_bundle(str(tmp_path / "plain"), model, params,
                       lengths=[0.5], batch_size=2)
    with pytest.raises(ValueError, match="no progressive programs"):
        deploy.load_progressive(str(tmp_path / "plain"))


@pytest.mark.slow
def test_bundle_runs_without_model_code(tmp_path):
    """A fresh interpreter serves the bundle without ever importing
    tdanet_tpu.models — the deployment claim, checked literally."""
    model, params = build()
    rng = np.random.default_rng(3)
    wav = make_wavs(rng, [0.5])[0]
    deploy.save_bundle(str(tmp_path), model, params, lengths=[0.5],
                       batch_size=1)
    want = separate_batched(model, params, [wav], batch_size=1)[0]
    np.save(tmp_path / "wav.npy", wav)
    np.save(tmp_path / "want.npy", np.asarray(want))

    code = f"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from tdanet_tpu import deploy
dep = deploy.load_bundle({str(tmp_path)!r})
out = dep.separate(np.load({str(tmp_path / 'wav.npy')!r}))
assert "tdanet_tpu.models" not in sys.modules, "bundle pulled in model code"
np.testing.assert_allclose(out, np.load({str(tmp_path / 'want.npy')!r}),
                           rtol=1e-5, atol=1e-6)
print("OK")
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK" in r.stdout
