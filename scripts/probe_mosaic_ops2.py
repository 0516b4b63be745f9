"""Round 2 micro-benchmarks: chunked (fori_loop over row windows) vs
monolithic Mosaic ops, to find the shape regime where Mosaic stops
spilling intermediates to VMEM."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, R, C = 24, 2032, 512


def timeit(f, *args, label="", iters=20):
    out = f(*args)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(out[..., :1, :8].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label}: {dt:.2f} ms ({dt / B * 1e3:.0f} us/sample)", flush=True)


def run(kernel, inputs, label, scratch=()):
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
        out_specs=pl.BlockSpec((1, R, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, C), jnp.bfloat16),
        scratch_shapes=list(scratch),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*xs))
    timeit(f, *inputs, label=label)


def main():
    key = jax.random.PRNGKey(0)
    xb = jax.random.normal(key, (B, R, C), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(key, (8, C), jnp.float32)
    wp = jax.random.normal(key, (128, C), jnp.float32).astype(jnp.bfloat16)

    # 0. copy rerun (was 4.8 s in probe 1 — wedge suspected)
    run(lambda x_ref, o_ref: o_ref.__setitem__(0, x_ref[0]), [xb],
        "copy bf16")

    # 1. monolithic 5-tap FMA, store via slice (no jnp.pad)
    def mono(x_ref, w_ref, o_ref):
        h = x_ref[0]
        acc = None
        for k in range(5):
            t = lax.slice_in_dim(h, 6 + k, 6 + k + 2016, axis=0) \
                .astype(jnp.float32)
            term = t * w_ref[k][None, :]
            acc = term if acc is None else acc + term
        o_ref[0, 8:2024] = acc.astype(o_ref.dtype)
    run(mono, [xb, w], "5-tap FMA f32 mono/sliced-store")

    # 2. chunked 5-tap FMA (CH-row windows)
    for CH in (512, 128):
        def chunked(x_ref, w_ref, o_ref, CH=CH):
            def body(ci, _):
                start = ci * CH
                win = x_ref[0, pl.ds(start, CH + 16), :]
                acc = None
                for k in range(5):
                    t = lax.slice_in_dim(win, 6 + k, 6 + k + CH, axis=0) \
                        .astype(jnp.float32)
                    term = t * w_ref[k][None, :]
                    acc = term if acc is None else acc + term
                o_ref[0, pl.ds(start + 8, CH), :] = acc.astype(o_ref.dtype)
                return 0
            lax.fori_loop(0, 2016 // CH, body, 0)
        run(chunked, [xb, w], f"5-tap FMA f32 chunked CH={CH}")

    # 3. chunked matmul (CH,128)@(128,512)
    for CH in (512, 128):
        def cmat(x_ref, w_ref, o_ref, CH=CH):
            def body(ci, _):
                start = ci * CH
                t = x_ref[0, pl.ds(start, CH), :128]
                y = jnp.dot(t, w_ref[:], preferred_element_type=jnp.float32)
                o_ref[0, pl.ds(start, CH), :] = y.astype(o_ref.dtype)
                return 0
            lax.fori_loop(0, R // CH, body, 0)
        run(cmat, [xb, wp], f"proj matmul chunked CH={CH}")

    # 4. monolithic proj matmul rerun
    def proj(x_ref, w_ref, o_ref):
        o_ref[0] = jnp.dot(x_ref[0, :, :128], w_ref[:],
                           preferred_element_type=jnp.float32) \
            .astype(o_ref.dtype)
    run(proj, [xb, wp], "proj matmul mono")

    # 5. chunked stats (pass A sums; pass B normalize)
    def cstats(x_ref, o_ref):
        CH = 512
        def pa(ci, carry):
            s, ss = carry
            y = x_ref[0, pl.ds(ci * CH, CH), :].astype(jnp.float32)
            return s + jnp.sum(y), ss + jnp.sum(y * y)
        s, ss = lax.fori_loop(0, R // CH, pa, (0.0, 0.0))
        mean = s / (R * C)
        rstd = lax.rsqrt(ss / (R * C) - mean * mean + 1e-8)
        def pb(ci, _):
            y = x_ref[0, pl.ds(ci * CH, CH), :].astype(jnp.float32)
            o_ref[0, pl.ds(ci * CH, CH), :] = ((y - mean) * rstd) \
                .astype(o_ref.dtype)
            return 0
        lax.fori_loop(0, R // CH, pb, 0)
    run(cstats, [xb], "stats 2-pass chunked CH=512")


if __name__ == "__main__":
    main()
