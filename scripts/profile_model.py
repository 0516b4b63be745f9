"""Profile any zoo model's serving forward on the chip and attribute
device time to source ops (via scripts/profile_hlo.py).

Round-4 driver: the profile-guided pass on TDANetEMCADv1_6 (252x vs the
flagship's ~1414x in docs/PERF.md's zoo table — VERDICT r3 #3).

Usage: python scripts/profile_model.py [model] [outdir] [--blocks N]
       [--batch N] [--seconds S]
"""
import argparse
import inspect
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tdanet_tpu.utils.misc import honor_jax_platforms_env

honor_jax_platforms_env()


from tdanet_tpu.models.tdanet_emcad import feat_len_for  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", default="TDANetEMCADv1_6")
    ap.add_argument("outdir", nargs="?", default=None)
    ap.add_argument("--blocks", type=int, default=16)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    outdir = args.outdir or f"/tmp/{args.model}_trace"

    import tdanet_tpu.models as zoo
    cls = getattr(zoo, args.model)
    sr = 16000
    T = int(sr * args.seconds)
    kw = {}
    if any("feat_len" in inspect.signature(c.__init__).parameters
           for c in cls.__mro__ if "__init__" in vars(c)):
        # era models may forward feat_len via **kwargs to an era base
        # class (e.g. TDANetMSFFN) — hence the MRO walk
        kw["feat_len"] = feat_len_for(T, 4, sr)
    model = cls(out_channels=128, in_channels=512, num_blocks=args.blocks,
                upsampling_depth=5, enc_kernel_size=4, num_sources=2,
                sample_rate=sr, **kw)
    params = model.init(jax.random.PRNGKey(0))
    mix = jax.random.normal(jax.random.PRNGKey(1), (args.batch, T),
                            jnp.float32)
    single = lambda p, w: model.apply(  # noqa: E731
        p, w[None], compute_dtype=jnp.bfloat16)[0]
    fwd = jax.jit(lambda p, x: jnp.sum(
        jax.vmap(single, in_axes=(None, 0))(p, x)[:, 0, :8]))

    print("compiling (jit call)...", flush=True)
    t0 = time.perf_counter()
    float(fwd(params, mix))
    print(f"compiled in {time.perf_counter()-t0:.0f}s", flush=True)
    # AOT-compiled executables hang on the tunneled 'axon' platform;
    # pay a second compile to get the fusion-named HLO text.
    hlo = fwd.lower(params, mix).compile().as_text()
    os.makedirs(outdir, exist_ok=True)
    hlo_path = os.path.join(outdir, "fwd_hlo.txt")
    with open(hlo_path, "w") as f:
        f.write(hlo)
    print(f"HLO -> {hlo_path} ({len(hlo.splitlines())} lines)", flush=True)

    float(fwd(params, mix))  # warm
    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        out = None
        for _ in range(args.iters):
            out = fwd(params, mix)
        float(out)
    dt = (time.perf_counter() - t0) / args.iters * 1e3
    rtfx = args.batch * args.seconds / (dt / 1e3)
    print(f"[{args.model}] {dt:.1f} ms/batch while tracing ({rtfx:.0f}x)",
          flush=True)
    print(f"now: python scripts/profile_hlo.py {outdir} {hlo_path} 60 "
          f"{args.iters}", flush=True)


if __name__ == "__main__":
    main()
