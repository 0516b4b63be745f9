"""ops.act_storage / store_activation hooks (8-bit activation-storage
experiment, docs/PERF.md round 3): off by default and bit-transparent,
quantizing when armed, thread-safe save/restore like dw_s2_fold."""
import numpy as np

import jax
import jax.numpy as jnp

from tdanet_tpu import ops
from tdanet_tpu.models import TDANetBest

CFG = dict(out_channels=32, in_channels=64, num_blocks=2,
           upsampling_depth=4, enc_kernel_size=4, num_sources=2,
           sample_rate=8000)


def test_off_is_identity():
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((4, 8)).astype(np.float32))
    assert ops.store_activation(x) is x
    with ops.act_storage(None):
        assert ops.store_activation(x) is x


def test_int8_roundtrip_error_bound():
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((64, 128)).astype(np.float32))
    with ops.act_storage("int8"):
        y = np.asarray(ops.store_activation(x))
    step = float(jnp.max(jnp.abs(x))) / 127.0
    assert np.abs(y - np.asarray(x)).max() <= step * 0.5 + 1e-7
    assert np.abs(y - np.asarray(x)).max() > 0  # actually quantized


def test_fp8_cast_changes_values():
    x = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((32,)).astype(np.float32))
    with ops.act_storage("fp8_e4m3"):
        y = np.asarray(ops.store_activation(x))
    rel = np.abs(y - np.asarray(x)) / np.maximum(np.abs(np.asarray(x)),
                                                 1e-6)
    assert 0 < rel.max() < 0.08  # e4m3 mantissa ~2^-3 relative step


def test_context_restores_and_nests():
    mode = ops.basic._act_storage_mode
    assert mode() is None
    with ops.act_storage("int8"):
        assert mode() == "int8"
        with ops.act_storage("fp8_e5m2"):
            assert mode() == "fp8_e5m2"
        assert mode() == "int8"
    assert mode() is None


def test_trace_flags_are_thread_local():
    """The trace-time formulation flags must not leak between threads:
    AsyncBatchServer's background rung compiler warms fold-off B=16/24
    programs WHILE the dispatch thread may be warming a fold-on rung-0
    program (round-4 review find — the old process-global flag either
    baked fold into the big rung or serialized compiles behind a lock
    held for the whole multi-minute TPU compile)."""
    import threading

    seen = {}
    inside = threading.Event()
    release = threading.Event()

    def holder():
        with ops.dw_s2_fold():  # fold ON in this thread only
            inside.set()
            release.wait(timeout=10)
            seen["holder"] = ops.basic._dw_fold_gate()

    t = threading.Thread(target=holder)
    t.start()
    try:
        assert inside.wait(timeout=10)
        # concurrent reader thread (the "other" build) sees the default
        assert ops.basic._dw_fold_gate() == 0
        with ops.dw_s2_fold(0):  # explicit no-fold entry
            assert ops.basic._dw_fold_gate() == 0
        seen["main"] = ops.basic._dw_fold_gate()
    finally:
        release.set()
        t.join(timeout=10)
    assert seen["main"] == 0
    assert seen["holder"] == 10 ** 9


def test_model_forward_quantized_snr_reasonable():
    m = TDANetBest(**CFG)
    p = m.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(3)
                    .standard_normal((1, 4000)).astype(np.float32) * 0.1)
    ref = np.asarray(m.apply(p, x))
    with ops.act_storage("int8"):
        out = np.asarray(jax.jit(lambda p, x: m.apply(p, x))(p, x))
    err = out - ref
    snr = 10 * np.log10((ref ** 2).sum() / ((err ** 2).sum() + 1e-30))
    assert 15.0 < snr < 80.0, snr  # quantized but still faithful
    assert np.abs(err).max() > 0
