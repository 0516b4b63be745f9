"""Profile the recipe-shape training step on the chip and attribute
device time to source ops (via scripts/profile_hlo.py).

Usage: python scripts/profile_train.py [mode] [outdir]
  mode: full | scales (remat strategy; default full)
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


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/train_trace"
    remat = {"full": True, "scales": "scales", "none": False}[mode]

    model = TDANetBest(out_channels=128, in_channels=512, num_blocks=16,
                       upsampling_depth=5, enc_kernel_size=4, num_sources=2,
                       sample_rate=8000, remat=remat)
    loss = PITLossWrapper(pairwise_neg_snr, pit_from="pw_mtx",
                          threshold_byloss=True)
    opt = make_optimizer("adam", lr=2e-3, grad_clip=5.0)
    step = make_train_step(model, loss, opt, compute_dtype=jnp.bfloat16,
                           donate=False)

    B, sr, seg = 8, 8000, 3.0
    T = int(sr * seg)
    params = model.init(jax.random.PRNGKey(0))
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    mix = jax.random.normal(jax.random.PRNGKey(1), (B, T), jnp.float32)
    src = jax.random.normal(jax.random.PRNGKey(2), (B, 2, T), jnp.float32)
    rng = jax.random.PRNGKey(3)

    # NOTE: executing the AOT `lower().compile()` object HANGS on the
    # tunneled 'axon' platform — run through the jit call path and pay a
    # second compile for the HLO text (fusion names must come from the
    # compiled module so trace events can be attributed).
    print("compiling (jit call)...", flush=True)
    t0 = time.perf_counter()
    _, l = step(state, mix, src, rng)
    float(l)
    print(f"compiled in {time.perf_counter()-t0:.0f}s", flush=True)
    hlo = step.lower(state, mix, src, rng).compile().as_text()
    os.makedirs(outdir, exist_ok=True)
    hlo_path = os.path.join(outdir, "train_step_hlo.txt")
    with open(hlo_path, "w") as f:
        f.write(hlo)
    print(f"HLO -> {hlo_path} ({len(hlo.splitlines())} lines)", flush=True)

    iters = 5
    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        out = None
        for _ in range(iters):
            _, out = step(state, mix, src, rng)
        float(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"[{mode}] {dt:.1f} ms/step while tracing", flush=True)
    print(f"now: python scripts/profile_hlo.py {outdir} {hlo_path} 60 "
          f"{iters}", flush=True)


if __name__ == "__main__":
    main()
