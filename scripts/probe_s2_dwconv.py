"""Small-batch stride-2 depthwise-conv formulations (the streaming-
latency hotspot: XLA space-to-batches the finest-scale stride-2 dw
convs at B<=8, ~23x off its traffic's SoL; docs/PERF.md).

Compares, at (B, 512, T) k=5 'same' stride-2 + GlobLN-style stats use:
  conv  — lax.conv_general_dilated feature_group_count=C (current)
  fold  — pad to even, reshape (B, C, T/2, 2) phases, 5 taps = slices+FMA
  s1dec — stride-1 conv then [:, :, ::2] decimation

Usage: python scripts/probe_s2_dwconv.py [B ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def conv_ref(x, w, b):
    out = lax.conv_general_dilated(
        x, w, window_strides=(2,), padding=[(2, 2)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=x.shape[1])
    return out + b[None, :, None]


def conv_fold(x, w, b):
    """y[t] = sum_k w[k] x[2t + k - 2]; phases E=x[2i], O=x[2i+1]:
    y[t] = w0 E[t-1] + w1 O[t-1] + w2 E[t] + w3 O[t] + w4 E[t+1]."""
    B, C, T = x.shape
    n_out = (T + 1) // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (2, 3 + (T % 2))))  # front pad 2 -> phase align
    # padded length Tp = T + 5 + (T%2) is odd+... make even:
    Tp = xp.shape[-1]
    if Tp % 2:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 1)))
        Tp += 1
    f = xp.reshape(B, C, Tp // 2, 2)
    e, o = f[..., 0], f[..., 1]
    # padded x index of true x[j] is j+2; E[i] = xp[2i], O[i] = xp[2i+1]
    # y[t] = sum_k w[k] xp[2t + k]  (since x[2t+k-2] = xp[2t+k])
    #      = w0 E[t] + w1 O[t] + w2 E[t+1] + w3 O[t+1] + w4 E[t+2]
    wk = [w[:, 0, k][None, :, None] for k in range(5)]
    t0 = lax.slice_in_dim(e, 0, n_out, axis=2) * wk[0]
    t1 = lax.slice_in_dim(o, 0, n_out, axis=2) * wk[1]
    t2 = lax.slice_in_dim(e, 1, 1 + n_out, axis=2) * wk[2]
    t3 = lax.slice_in_dim(o, 1, 1 + n_out, axis=2) * wk[3]
    t4 = lax.slice_in_dim(e, 2, 2 + n_out, axis=2) * wk[4]
    return (t0 + t1) + (t2 + t3) + (t4 + b[None, :, None])


def conv_s1dec(x, w, b):
    out = lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(2, 2)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=x.shape[1])
    return out[:, :, ::2] + b[None, :, None]


def glob_ln_use(y):
    """Consume like the model does (fused stats + affine)."""
    m = jnp.mean(y, axis=(1, 2), keepdims=True)
    v = jnp.mean((y - m) ** 2, axis=(1, 2), keepdims=True)
    return (y - m) * lax.rsqrt(v + 1e-8)


def main():
    batches = [int(a) for a in sys.argv[1:]] or [4, 24]
    C, T = 512, 2010
    k = jax.random.PRNGKey(0)
    w = jax.random.normal(k, (C, 1, 5), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (C,), jnp.float32)

    CHAIN = 40
    for B in batches:
        x = jax.random.normal(jax.random.PRNGKey(2), (B, C, T),
                              jnp.float32).astype(jnp.bfloat16)
        outs = {}
        for name, fn in (("conv", conv_ref), ("fold", conv_fold),
                         ("s1dec", conv_s1dec)):
            wf = w.astype(jnp.bfloat16)
            bf = b.astype(jnp.bfloat16)

            def chained(x, wf=wf, bf=bf, fn=fn):
                def body(h, _):
                    y = glob_ln_use(fn(h, wf, bf))
                    # back to T length so the chain re-feeds (pad x2)
                    h2 = jnp.concatenate([y, y], axis=2)[:, :, :T]
                    return h2.astype(h.dtype), None
                h, _ = lax.scan(body, x, None, length=CHAIN)
                return h
            f = jax.jit(chained)
            out = f(x)
            outs[name] = np.asarray(out[:, 0, :64], np.float32)
            t0 = time.perf_counter()
            for _ in range(10):
                out = f(x)
            float(jnp.sum(out[:, 0, :8].astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / (10 * CHAIN) * 1e3
            print(f"B={B:3d} {name:6s} {dt:.4f} ms/stage", flush=True)
        for name in ("fold", "s1dec"):
            err = np.abs(outs[name] - outs["conv"]).max()
            print(f"    {name} vs conv: max abs err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
