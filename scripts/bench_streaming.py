"""Multi-stream online serving latency benchmark (real chip).

Measures p50/p90/p99 per-hop latency for N concurrent 16 kHz streams
through MultiStreamSeparator's single batched dispatch (flagship
TDANetBest, num_blocks=16, 1 s segments, 25% overlap -> 750 ms hops).

Context for the numbers (docs/PERF.md): through the axon tunnel every
device round trip costs ~30 ms RPC; the measured B=4 segment compute is
~17 ms (XLA picks a space-to-batch layout for the finest-scale
stride-2 depthwise convs at small batch, ~20x off its own large-batch
efficiency); so ~47 ms is this environment's floor. On locally
attached TPU the same step would be the ~17-20 ms compute.

Usage: python scripts/bench_streaming.py [n_streams] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from tdanet_tpu.models import TDANetBest
from tdanet_tpu.serving import MultiStreamSeparator


def main():
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    SR = 16000
    model = TDANetBest(out_channels=128, in_channels=512, num_blocks=16,
                       upsampling_depth=5, enc_kernel_size=4,
                       num_sources=2, sample_rate=SR)
    params = model.init(jax.random.PRNGKey(0))
    multi = MultiStreamSeparator(model, params, max_streams=n_streams,
                                 segment=1.0, overlap=0.25, sample_rate=SR,
                                 compute_dtype=jnp.bfloat16,
                                 emit_dtype="int16")
    rng = np.random.default_rng(0)
    for i in range(n_streams):
        multi.open(i)
        multi.push(i, (rng.standard_normal(SR) * 0.1).astype(np.float32))
    multi.step()  # warm
    hop = int(SR * 0.75)
    lat = []
    for _ in range(iters):
        for i in range(n_streams):
            multi.push(i, (rng.standard_normal(hop) * 0.1)
                       .astype(np.float32))
        t0 = time.perf_counter()
        out = multi.step()
        assert len(out) == n_streams
        lat.append((time.perf_counter() - t0) * 1000)
    lat = np.array(lat)
    print(f"{n_streams} concurrent 16 kHz streams, 1 s seg / 750 ms hop, "
          f"num_blocks=16, bf16, int16 emission:")
    print(f"  p50 {np.percentile(lat, 50):.1f} ms   "
          f"p90 {np.percentile(lat, 90):.1f} ms   "
          f"p99 {np.percentile(lat, 99):.1f} ms per hop "
          f"(one batched dispatch serves all {n_streams} streams)")


if __name__ == "__main__":
    main()
