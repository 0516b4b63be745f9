"""On-chip probe for the fused UConvBlock kernels: compile, numerics vs
the XLA path, and timing at the bench shape (queue-drain methodology).

Usage: python scripts/probe_uconv_kernel.py [batch] [what]
  what: pyramid | fuse | block (default block)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tdanet_tpu.models.components import UConvBlock
from tdanet_tpu.kernels import uconv_block as uk


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    what = sys.argv[2] if len(sys.argv) > 2 else "block"
    T, depth, Cout, C = 2010, 5, 128, 512
    dtype = jnp.bfloat16

    blk = UConvBlock(out_channels=Cout, in_channels=C, upsampling_depth=depth)
    params = blk.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, Cout, T), jnp.float32) \
        .astype(dtype)
    Ts = uk.scale_lengths(T, depth)

    def fused_block_raw(p, x_raw, ablate=None, no_ga=False):
        """x_raw (B, rows0, Cout) -> (B, rows0, Cout); no relayouts."""
        scales_raw, g_raw = uk.pyramid_fused(x_raw, p, depth=depth,
                                             raw=True, raw_in=True, T0=T)
        if not no_ga:
            g = jnp.swapaxes(g_raw[:, :Ts[-1]], 1, 2)
            g = blk.globalatt.apply(p["globalatt"], g)
            rows_g = g_raw.shape[1]
            g_raw = jnp.pad(jnp.swapaxes(g, 1, 2),
                            ((0, 0), (0, rows_g - Ts[-1]), (0, 0))) \
                .astype(scales_raw[0].dtype)
        else:
            g_raw = g_raw.astype(scales_raw[0].dtype)
        return uk.fuse_expand_fused(scales_raw, g_raw, x_raw, p, Ts=Ts,
                                    ablate=ablate)

    rows0 = uk._pads(T)

    def to_raw(x):
        return jnp.pad(jnp.swapaxes(x, 1, 2),
                       ((0, 0), (uk.PAD, rows0 - T - uk.PAD), (0, 0)))

    def fused_block(p, x):
        out_raw = fused_block_raw(p, to_raw(x))
        return jnp.swapaxes(out_raw[:, uk.PAD:uk.PAD + T], 1, 2)

    def pyramid_only_raw(p, x_raw):
        scales_raw, g_raw = uk.pyramid_fused(x_raw, p, depth=depth,
                                             raw=True, raw_in=True, T0=T)
        return scales_raw[0][:, :, :Cout] + jnp.pad(
            g_raw[:, :1, :Cout], ((0, 0), (0, rows0 - 1), (0, 0)))

    def xla_block(p, x):
        return blk.apply(p, x)

    CHAIN = 20  # chained applications inside ONE jit: clears the
    #             0.3-1 ms dispatch floor AND the async-compile curse

    def chain(block_fn):
        def f(p, x):
            def body(h, _):
                out = block_fn(p, h)
                return out.astype(x.dtype), None
            h, _ = jax.lax.scan(body, x, None, length=CHAIN)
            return h
        return jax.jit(f)

    print("compiling fused block (chained raw)...", flush=True)
    t0 = time.perf_counter()

    def fused_chain_raw(p, x):
        def body(h, _):
            return fused_block_raw(p, h).astype(x.dtype), None
        h, _ = jax.lax.scan(body, to_raw(x), None, length=CHAIN)
        return jnp.swapaxes(h[:, uk.PAD:uk.PAD + T], 1, 2)

    fk = jax.jit(fused_chain_raw)
    ok = fk(params, x)
    float(jnp.sum(ok[:, 0, :8].astype(jnp.float32)))
    print(f"fused compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    fx = chain(xla_block)
    ox = fx(params, x)
    a = np.asarray(ok, np.float32)
    b = np.asarray(ox, np.float32)
    err = np.abs(a - b).max()
    snr = 10 * np.log10((b ** 2).mean() / ((a - b) ** 2).mean() + 1e-30)
    print(f"chained x{CHAIN}: max abs err {err:.4e}, "
          f"SNR vs XLA-bf16 {snr:.1f} dB", flush=True)

    _time(fk, params, x, "fused block (raw chain)", chain=CHAIN)

    def pyr_chain(p, x):
        def body(h, _):
            return pyramid_only_raw(p, h).astype(x.dtype), None
        h, _ = jax.lax.scan(body, to_raw(x), None, length=CHAIN)
        return jnp.swapaxes(h[:, uk.PAD:uk.PAD + T], 1, 2)

    fp = jax.jit(pyr_chain)
    _time(fp, params, x, "pyramid kernel only", chain=CHAIN)
    _time(fx, params, x, "XLA block", chain=CHAIN)

    for label, kw in (("no GA (kernels only)", dict(no_ga=True)),
                      ("skip fusion", dict(ablate="skip_fusion")),
                      ("skip expand", dict(ablate="skip_expand"))):
        def ab_chain(p, x, kw=kw):
            def body(h, _):
                return fused_block_raw(p, h, **kw).astype(x.dtype), None
            h, _ = jax.lax.scan(body, to_raw(x), None, length=CHAIN)
            return jnp.swapaxes(h[:, uk.PAD:uk.PAD + T], 1, 2)
        _time(jax.jit(ab_chain), params, x, label, chain=CHAIN)


def _time(f, params, x, label, iters=10, chain=1):
    out = f(params, x)
    float(jnp.sum(out[:, 0, :8].astype(jnp.float32)))  # drain warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(params, x)
    float(jnp.sum(out[:, 0, :8].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / (iters * chain) * 1e3
    print(f"{label}: {dt:.3f} ms/block (B={x.shape[0]})", flush=True)


if __name__ == "__main__":
    main()
