"""On-chip decision probe for the UConvBlock hybrid executor.

Measures, at the bench shape, chained x20 inside one jit:
  1. XLA full block            (baseline, ~2.2 ms/block)
  2. XLA pyramid portion only  (proj + spp_dw + pooled-sum)
  3. hybrid: Pallas pyramid_fused + XLA GA + XLA LA fusion/expansion

If (2) < Pallas pyramid (1.67 ms measured), the mega-kernel loses on
every segment and the negative result is final.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tdanet_tpu import ops
from tdanet_tpu.models.components import UConvBlock
from tdanet_tpu.kernels import uconv_block as uk


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    T, depth, Cout, C = 2010, 5, 128, 512
    dtype = jnp.bfloat16

    blk = UConvBlock(out_channels=Cout, in_channels=C, upsampling_depth=depth)
    params = blk.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, Cout, T), jnp.float32) \
        .astype(dtype)

    def xla_pyramid(p, x):
        output1 = blk.proj_1x1.apply(p["proj_1x1"], x)
        output = [blk.spp_dw[0].apply(p["spp_dw"]["0"], output1)]
        for k in range(1, depth):
            output.append(blk.spp_dw[k].apply(p["spp_dw"][str(k)],
                                              output[-1]))
        coarsest = output[-1].shape[-1]
        global_f = output[-1]
        for fea in output[:-1]:
            global_f = global_f + ops.adaptive_avg_pool1d(fea, coarsest)
        return output, global_f

    def xla_tail(p, x, output, global_f):
        global_f = blk.globalatt.apply(p["globalatt"], global_f)
        x_fused = [blk.loc_glo_fus[i].apply(p["loc_glo_fus"][str(i)],
                                            output[i], global_f)
                   for i in range(depth)]
        expanded = None
        for i in range(depth - 2, -1, -1):
            g = x_fused[i - 1] if i == depth - 2 else expanded
            expanded = blk.last_layer[i].apply(p["last_layer"][str(i)],
                                               x_fused[i], g)
        return ops.conv1d(expanded, p["res_conv"]) + x

    def xla_block(p, x):
        output, global_f = xla_pyramid(p, x)
        return xla_tail(p, x, output, global_f)

    def xla_pyr_only(p, x):
        output, global_f = xla_pyramid(p, x)
        # chainable (B, Cout, T) summary touching every scale
        y = output[0][:, :Cout]
        return y + jnp.pad(global_f[:, :Cout],
                           ((0, 0), (0, 0), (0, T - global_f.shape[-1])))

    def hybrid_block(p, x):
        scales, pooled = uk.pyramid_fused(x, p, depth=depth)
        return xla_tail(p, x, scales, pooled)

    CHAIN = 20

    def chain(block_fn):
        def f(p, x):
            def body(h, _):
                return block_fn(p, h).astype(x.dtype), None
            h, _ = jax.lax.scan(body, x, None, length=CHAIN)
            return h
        return jax.jit(f)

    fx = chain(xla_block)
    ox = fx(params, x)
    fh = chain(hybrid_block)
    print("compiling hybrid...", flush=True)
    t0 = time.perf_counter()
    oh = fh(params, x)
    float(jnp.sum(oh[:, 0, :8].astype(jnp.float32)))
    print(f"hybrid compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    a = np.asarray(oh, np.float32)
    b = np.asarray(ox, np.float32)
    snr = 10 * np.log10((b ** 2).mean() / ((a - b) ** 2).mean() + 1e-30)
    print(f"hybrid vs XLA: max abs err {np.abs(a - b).max():.4e}, "
          f"SNR {snr:.1f} dB", flush=True)

    _time(fx, params, x, "XLA block", chain=CHAIN)
    _time(chain(xla_pyr_only), params, x, "XLA pyramid only", chain=CHAIN)
    _time(fh, params, x, "hybrid (pallas pyr + XLA tail)", chain=CHAIN)


def _time(f, params, x, label, iters=10, chain=1):
    out = f(params, x)
    float(jnp.sum(out[:, 0, :8].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(params, x)
    float(jnp.sum(out[:, 0, :8].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / (iters * chain) * 1e3
    print(f"{label}: {dt:.3f} ms/block (B={x.shape[0]})", flush=True)


if __name__ == "__main__":
    main()
