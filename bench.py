"""Headline benchmark: realtime factor (RTFx) of flagship TDANetBest
separation on one TPU chip, 16 kHz LRS2-style 2 s clips.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the BASELINE.json north star of 200x realtime per chip.

Measurement notes: on the tunneled ('axon') TPU platform,
``block_until_ready`` does not actually synchronize, so we time a queue
of dispatches drained by a single scalar host readback — the readback
cannot complete until every queued forward has executed, and its ~30 ms
RPC cost is amortized over the iterations. The summed scalar ties the
timing to real computed values.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from tdanet_tpu.utils.misc import honor_jax_platforms_env

honor_jax_platforms_env()  # BENCH on CPU: JAX_PLATFORMS=cpu must win
# even though this container's axon plugin registration overwrites
# jax_platforms at interpreter start (a wedged tunnel otherwise hangs
# the CPU-only driver-contract run at first device use)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "24"))
    seconds = float(os.environ.get("BENCH_SECONDS", "2.0"))
    blocks = int(os.environ.get("BENCH_BLOCKS", "16"))  # <16: CI/CPU only
    sr = 16000
    dtype = {"bf16": jnp.bfloat16, "fp32": jnp.float32}[
        os.environ.get("BENCH_DTYPE", "bf16")]

    from tdanet_tpu.models import TDANetBest

    model = TDANetBest(out_channels=128, in_channels=512,
                       num_blocks=blocks,
                       upsampling_depth=5, enc_kernel_size=4, num_sources=2,
                       sample_rate=sr)
    params = model.init(jax.random.PRNGKey(0))

    T = int(sr * seconds)
    mix = jax.random.normal(jax.random.PRNGKey(1), (batch, T), jnp.float32)

    # vmap over utterances: per-utterance (batch=1) semantics — the
    # reference's eval behavior — at full batched throughput; the
    # degenerate batch-axis attention collapses to two matmuls.
    # Summing a small slice forces full execution but keeps readback tiny.
    single = lambda p, w: model.apply(p, w[None], compute_dtype=dtype)[0]
    fwd = jax.jit(lambda p, x: jnp.sum(
        jax.vmap(single, in_axes=(None, 0))(p, x)[:, 0, :8]))
    float(fwd(params, mix))  # compile + warm
    float(fwd(params, mix))

    iters = int(os.environ.get("BENCH_ITERS", "20"))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fwd(params, mix)
    float(out)  # drains the serialized execution queue
    dt = (time.perf_counter() - t0) / iters

    audio_seconds = batch * seconds
    rtfx = audio_seconds / dt

    # Secondary figure (stderr; stdout stays one JSON line for the
    # driver): achieved HBM bandwidth vs the v5e's ~819 GB/s, from the
    # measured per-block traffic model in docs/PERF.md (~15 passes over
    # the scale-pyramid's ~190 MB of bf16 activations per block at
    # B=24 — the separator is memory-bound, so this tracks regressions).
    frames = int(sr * seconds) // (model.enc_kernel_size // 4) + 1
    scale_bytes = sum(batch * 512 * max(frames >> s, 1) * 2
                      for s in range(model.upsampling_depth))
    approx_gb = 15 * scale_bytes * blocks / 1e9
    bw = approx_gb / dt
    print(f"approx HBM traffic {approx_gb:.1f} GB/fwd, achieved "
          f"{bw:.0f} GB/s = {bw / 819:.0%} of v5e peak", file=sys.stderr)

    print(json.dumps({
        "metric": "rtfx_tdanet_best_16k_2s",
        "value": round(rtfx, 2),
        "unit": "x realtime per chip",
        "vs_baseline": round(rtfx / 200.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
