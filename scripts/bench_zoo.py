"""Model-zoo serving breadth benchmark: RTFx of each major model family
at the recipe shape on one chip (random weights — throughput only).

Same methodology as bench.py: vmapped per-utterance semantics, queued
dispatches drained by one tiny scalar readback (block_until_ready does
not synchronize through the axon tunnel). One table row per model.

Usage: python scripts/bench_zoo.py [--models A,B,...] [--blocks N]
       [--batch N] [--seconds S]
CPU smoke: JAX_PLATFORMS=cpu python scripts/bench_zoo.py --blocks 1 \
           --batch 2 --seconds 0.5 --iters 2
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

# family -> (class name, extra ctor kwargs). Recipe config otherwise.
# The round-3 curated core; `--all` (default) appends every other
# registered separation model so no family can hide an XLA-lowering
# pathology the way TDANetEMCADv1_6's LGAG grouped convs did.
ZOO = [
    ("TDANetBest", {}),            # flagship (released ckpts)
    ("TDANetYang", {}),            # configs/tdanet.yml default
    ("TDANet", {}),                # conv-pool global branch
    ("TDANetOrigin", {}),          # ICLR-paper baseline
    ("TDANetGateVariant", {}),     # gated recurrence
    ("TDANetEMCADv1_6", {}),       # EMCAD-era research flagship
    ("TDANetGateOSRA", {}),        # OSRA attention GA
    ("TDANetDynamicDownsample", {}),  # input-dependent dyn-conv downsample
]
N_CORE = len(ZOO)
# non-core ctor quirks (reference's own __main__ config values):
ZOO += [
    ("TDANetMultRes", {"kernels": 4}),  # out_channels % kernels == 0
]


def all_zoo_names():
    """Curated order first, then the rest of the registry alphabetically."""
    from tdanet_tpu.models.base import _MODEL_REGISTRY
    core = [n for n, _ in ZOO]
    rest = sorted(c.__name__ for c in _MODEL_REGISTRY.values()
                  if c.__name__ not in core)
    return core + rest


from tdanet_tpu.models.tdanet_emcad import feat_len_for  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=None,
                    help="comma-separated subset of the zoo")
    ap.add_argument("--core", action="store_true",
                    help="only the curated round-3 core table rows")
    ap.add_argument("--blocks", type=int, default=16)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    args = ap.parse_args()

    import tdanet_tpu.models as zoo

    names = (args.models.split(",") if args.models
             else [n for n, _ in ZOO[:N_CORE]] if args.core
             else all_zoo_names())
    extra = dict(ZOO)
    dtype = {"bf16": jnp.bfloat16, "fp32": jnp.float32}[args.dtype]
    sr = 16000
    T = int(sr * args.seconds)
    mix = jax.random.normal(jax.random.PRNGKey(1), (args.batch, T),
                            jnp.float32)
    audio_seconds = args.batch * args.seconds

    print(f"# batch={args.batch} T={args.seconds}s blocks={args.blocks} "
          f"dtype={args.dtype} device={jax.devices()[0].platform}")
    print(f"{'model':28s} {'ms/batch':>9s} {'RTFx':>8s}")
    for name in names:
        cls = getattr(zoo, name)
        kw = dict(extra.get(name, {}))
        if any("feat_len" in inspect.signature(c.__init__).parameters
               for c in cls.__mro__ if "__init__" in vars(c)):
            # era models with RPE tables need static scale-0 lengths
            # (some, e.g. TDANetMSFFN, forward it via **kwargs to an
            # era base class — hence the MRO walk)
            kw.setdefault("feat_len", feat_len_for(T, 4, sr))
        model = cls(out_channels=128, in_channels=512,
                    num_blocks=args.blocks, upsampling_depth=5,
                    enc_kernel_size=4, num_sources=2, sample_rate=sr,
                    **kw)
        params = model.init(jax.random.PRNGKey(0))
        single = lambda p, w: model.apply(  # noqa: E731
            p, w[None], compute_dtype=dtype)[0]
        fwd = jax.jit(lambda p, x: jnp.sum(
            jax.vmap(single, in_axes=(None, 0))(p, x)[:, 0, :8]))
        try:
            float(fwd(params, mix))  # compile + warm
            float(fwd(params, mix))
        except Exception as e:  # keep the sweep alive per-model
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}"[:120])
            continue
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fwd(params, mix)
        float(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:28s} {dt * 1e3:9.1f} {audio_seconds / dt:8.0f}")


if __name__ == "__main__":
    sys.exit(main())
