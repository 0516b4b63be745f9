"""In-model A/B of the small-batch stride-2 depthwise-conv fold path:
full TDANetBest serving forward at streaming (B=4) and throughput
(B=24) batch, fold gate on vs off.

Usage: python scripts/probe_fold_serving.py [batches...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tdanet_tpu.ops import basic
from tdanet_tpu.models import TDANetBest


def main():
    batches = [int(a) for a in sys.argv[1:]] or [4, 24]
    sr, seconds = 16000, 2.0
    model = TDANetBest(out_channels=128, in_channels=512, num_blocks=16,
                       upsampling_depth=5, enc_kernel_size=4, num_sources=2,
                       sample_rate=sr)
    params = model.init(jax.random.PRNGKey(0))
    T = int(sr * seconds)

    for B in batches:
        mix = jax.random.normal(jax.random.PRNGKey(1), (B, T), jnp.float32)
        outs = {}
        for gate, label in ((0, "conv"), (10**9, "fold")):
            basic.DW_S2_FOLD_MAX_BATCH = gate
            single = lambda p, w: model.apply(
                p, w[None], compute_dtype=jnp.bfloat16)[0]
            fwd = jax.jit(lambda p, x: jax.vmap(
                single, in_axes=(None, 0))(p, x))
            out = fwd(params, mix)
            float(jnp.sum(out[:, 0, :8].astype(jnp.float32)))
            iters = 20
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fwd(params, mix)
            float(jnp.sum(out[:, 0, :8].astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / iters * 1e3
            outs[label] = np.asarray(out[:, :, :512], np.float32)
            rtfx = B * seconds / dt * 1e3
            print(f"B={B:3d} {label}: {dt:.2f} ms/fwd = {rtfx:.0f}x realtime",
                  flush=True)
        err = np.abs(outs["fold"] - outs["conv"]).max()
        den = (outs["conv"] ** 2).mean()
        snr = 10 * np.log10(den / ((outs["fold"] - outs["conv"]) ** 2).mean()
                            + 1e-30)
        print(f"    fold vs conv: max abs {err:.2e}, SNR {snr:.1f} dB",
              flush=True)
    basic.DW_S2_FOLD_MAX_BATCH = 0  # module default: fold is opt-in


if __name__ == "__main__":
    main()
