"""A/B probe: XLA grouped-conv lowering vs shift-FMA for LGAG-shaped
grouped convs (O == groups, few inputs per group), at the shapes the
TDANetEMCADv1_6 profile flagged (scripts/profile_model.py round 4:
fusion.2295/2297 = 19.2 ms EACH per forward at (B=24, 512->256, g=256,
k=3, T=2010) + layout copies).

Usage: python scripts/probe_small_group_conv.py
CPU smoke: JAX_PLATFORMS=cpu python scripts/probe_small_group_conv.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tdanet_tpu.utils.misc import honor_jax_platforms_env

honor_jax_platforms_env()


def xla_conv(x, w, padding, groups):
    return lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups)


def shift_fma(x, w, padding, groups):
    # A/B the SHIPPED lowering, not a local copy that could drift from
    # what conv1d actually dispatches ('same' stride-1 shapes only,
    # which is all this probe sweeps)
    from tdanet_tpu.ops.basic import _small_group_conv1d
    assert padding == w.shape[-1] // 2
    return _small_group_conv1d(x, w)


def bench(fn, x, w, padding, groups, iters=30):
    f = jax.jit(lambda x, w: jnp.sum(fn(x, w, padding, groups)[:, 0, :8]))
    float(f(x, w)); float(f(x, w))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = f(x, w)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    B = 24
    print(f"{'shape':38s} {'xla ms':>8s} {'fma ms':>8s} {'ratio':>6s} "
          f"{'maxerr':>9s}")
    for (C, O, ig, K, T) in [
        (512, 256, 2, 3, 2010),   # LGAG gate, finest stage
        (512, 256, 2, 3, 1005),
        (512, 256, 2, 3, 503),
        (512, 256, 2, 3, 252),
        (512, 256, 2, 3, 126),
    ]:
        g = O
        x = jax.random.normal(key, (B, C, T), jnp.bfloat16)
        w = jax.random.normal(key, (O, ig, K), jnp.bfloat16) * 0.1
        pad = K // 2
        a = np.asarray(jax.jit(
            lambda x, w: xla_conv(x, w, pad, g))(x, w), np.float32)
        b = np.asarray(jax.jit(
            lambda x, w: shift_fma(x, w, pad, g))(x, w), np.float32)
        err = float(np.max(np.abs(a - b)))
        t_xla = bench(xla_conv, x, w, pad, g)
        t_fma = bench(shift_fma, x, w, pad, g)
        print(f"C={C} O={O} ig={ig} K={K} T={T:5d}      "
              f"{t_xla:8.3f} {t_fma:8.3f} {t_xla/t_fma:6.2f} {err:9.2e}",
              flush=True)


if __name__ == "__main__":
    main()
