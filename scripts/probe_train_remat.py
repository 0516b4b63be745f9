"""On-chip A/B of rematerialization strategies for the training step at
the configs/tdanet.yml recipe shape (B=8, 3 s @ 8 kHz, 16 blocks, bf16).

  full   — jax.checkpoint over each shared-weight iteration (round-1
           default; ~17 GB of activations without it)
  scales — save_only_these_names landmarks (pyramid scales, post-GA
           global, fused scales); backward recomputes only the short
           segments between landmarks. Extra memory ~(2x scales +
           fused) * 16 iters ~ 2.4 GB at this shape.

Usage: python scripts/probe_train_remat.py [mode ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tdanet_tpu.models import TDANetBest
from tdanet_tpu.losses import PITLossWrapper, pairwise_neg_snr
from tdanet_tpu.system.optimizers import make_optimizer
from tdanet_tpu.system.trainer import TrainState, make_train_step


def build(remat):
    model = TDANetBest(out_channels=128, in_channels=512, num_blocks=16,
                       upsampling_depth=5, enc_kernel_size=4, num_sources=2,
                       sample_rate=8000, remat=remat)
    loss = PITLossWrapper(pairwise_neg_snr, pit_from="pw_mtx",
                          threshold_byloss=True)
    opt = make_optimizer("adam", lr=2e-3, grad_clip=5.0)
    step = make_train_step(model, loss, opt, compute_dtype=jnp.bfloat16,
                           donate=False)
    params = model.init(jax.random.PRNGKey(0))
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    return step, state


def main():
    modes = sys.argv[1:] or ["full", "scales"]
    B, sr, seg = 8, 8000, 3.0
    T = int(sr * seg)
    mix = jax.random.normal(jax.random.PRNGKey(1), (B, T), jnp.float32)
    src = jax.random.normal(jax.random.PRNGKey(2), (B, 2, T), jnp.float32)
    rng = jax.random.PRNGKey(3)

    for mode in modes:
        remat = {"full": True, "scales": "scales", "none": False}[mode]
        step, state = build(remat)
        print(f"[{mode}] compiling...", flush=True)
        t0 = time.perf_counter()
        try:
            state2, loss = step(state, mix, src, rng)
            float(loss)
        except Exception as e:
            print(f"[{mode}] FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        print(f"[{mode}] compile+run {time.perf_counter()-t0:.1f}s "
              f"loss={float(loss):.3f}", flush=True)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            state2, loss = step(state, mix, src, rng)
        float(loss)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"[{mode}] {dt:.1f} ms/step  "
              f"({B * seg / dt * 1e3:.0f}x realtime)", flush=True)


if __name__ == "__main__":
    main()
