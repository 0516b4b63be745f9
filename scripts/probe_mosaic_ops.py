"""Micro-benchmarks of Mosaic ops used by the UConvBlock kernels.

Each variant runs as a grid=(24,) pallas kernel (one sample per program,
like the real kernels) and is timed with the queue-drain method.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, R, C = 24, 2032, 512
RD = 1008  # decimated rows


def timeit(f, *args, label="", iters=20):
    out = f(*args)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(out[..., :1, :8].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label}: {dt:.2f} ms ({dt / B * 1e3:.0f} us/sample)", flush=True)


def run(kernel, out_rows, out_dtype, inputs, label):
    specs = []
    for a in inputs:
        if a.ndim == 3:
            specs.append(pl.BlockSpec((1,) + a.shape[1:],
                                      lambda b: (b, 0, 0),
                                      memory_space=pltpu.VMEM))
        else:
            specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    f = jax.jit(lambda *xs: pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, out_rows, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out_rows, C), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*xs))
    timeit(f, *inputs, label=label)


def main():
    key = jax.random.PRNGKey(0)
    xb = jax.random.normal(key, (B, R, C), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(key, (8, C), jnp.float32)
    dec_f32 = jax.random.normal(key, (RD, R), jnp.float32)
    dec_bf16 = dec_f32.astype(jnp.bfloat16)

    # 1. copy (baseline)
    run(lambda x_ref, o_ref: o_ref.__setitem__(0, x_ref[0]),
        R, jnp.bfloat16, [xb], "copy bf16 (2032,512)")

    # 2. five-tap FMA, f32 accum
    def taps_f32(x_ref, w_ref, o_ref):
        h = x_ref[0]
        acc = None
        for k in range(5):
            t = lax.slice_in_dim(h, 6 + k, 6 + k + 2010, axis=0) \
                .astype(jnp.float32)
            term = t * w_ref[k][None, :]
            acc = term if acc is None else acc + term
        o_ref[0] = jnp.pad(acc, ((8, R - 2010 - 8), (0, 0))) \
            .astype(o_ref.dtype)
    run(taps_f32, R, jnp.bfloat16, [xb, w], "5-tap FMA f32 + pad")

    # 3. five-tap FMA, bf16 accum
    def taps_bf16(x_ref, w_ref, o_ref):
        h = x_ref[0]
        wb = w_ref[:].astype(jnp.bfloat16)
        acc = None
        for k in range(5):
            t = lax.slice_in_dim(h, 6 + k, 6 + k + 2010, axis=0)
            term = t * wb[k][None, :]
            acc = term if acc is None else acc + term
        o_ref[0] = jnp.pad(acc, ((8, R - 2010 - 8), (0, 0)))
    run(taps_bf16, R, jnp.bfloat16, [xb, w], "5-tap FMA bf16 + pad")

    # 4. decimation matmul f32xbf16->f32
    def dec_a(x_ref, d_ref, o_ref):
        y = jnp.dot(d_ref[:], x_ref[0].astype(jnp.float32),
                    preferred_element_type=jnp.float32)
        o_ref[0] = jnp.pad(y, ((0, R - RD), (0, 0))).astype(o_ref.dtype)
    run(dec_a, R, jnp.bfloat16, [xb, dec_f32], "decim matmul f32@f32")

    # 5. decimation matmul bf16
    def dec_b(x_ref, d_ref, o_ref):
        y = jnp.dot(d_ref[:], x_ref[0],
                    preferred_element_type=jnp.float32)
        o_ref[0] = jnp.pad(y, ((0, R - RD), (0, 0))).astype(o_ref.dtype)
    run(dec_b, R, jnp.bfloat16, [xb, dec_bf16], "decim matmul bf16@bf16")

    # 6. glob-ln style stats + affine f32
    def stats(x_ref, o_ref):
        y = x_ref[0].astype(jnp.float32)
        s = jnp.sum(y); ss = jnp.sum(y * y)
        mean = s / (R * C)
        rstd = lax.rsqrt(ss / (R * C) - mean * mean + 1e-8)
        o_ref[0] = ((y - mean) * rstd).astype(o_ref.dtype)
    run(stats, R, jnp.bfloat16, [xb], "stats+affine f32")

    # 7. proj-style matmul bf16 (2032,128)@(128,512)
    x128 = xb[:, :, :128]
    wp = jax.random.normal(key, (128, C), jnp.float32).astype(jnp.bfloat16)
    def proj(x_ref, w_ref, o_ref):
        o_ref[0] = jnp.dot(x_ref[0], w_ref[:],
                           preferred_element_type=jnp.float32) \
            .astype(o_ref.dtype)
    run(proj, R, jnp.bfloat16, [x128, wp], "proj matmul bf16 (128->512)")

    # 8. jnp.repeat x2 on sublanes
    def rep(x_ref, o_ref):
        t = lax.slice_in_dim(x_ref[0], 0, 1005, axis=0)
        r = jnp.repeat(t, 2, axis=0)
        o_ref[0] = jnp.pad(r, ((0, R - 2010), (0, 0)))
    run(rep, R, jnp.bfloat16, [xb], "repeat x2 (1005->2010)")


if __name__ == "__main__":
    main()
