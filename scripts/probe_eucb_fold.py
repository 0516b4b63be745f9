"""A/B probe: EUCB nearest-upsample -> depthwise-conv fold (VERDICT r4 #8).

Current EUCB path (models/emcad.py EUCB.apply): interpolate_nearest
MATERIALIZES the upsampled tensor (conv operands can't fuse a gather),
then the k=3 depthwise conv reads it back — two extra HBM passes of the
largest decode-ladder tensors per EUCB. The fold expresses the conv
directly on the SOURCE resolution: out[:, :, j] = sum_k w[:, k] *
x[:, :, idx(j + k - 1)] with idx the torch-floored nearest map — three
STATIC gathers (index arrays are compile-time constants per stage
length) feeding a fused FMA chain, so XLA can loop-fuse the whole thing
into one output pass... IF the TPU backend fuses gathers into loop
fusions (it may instead materialize all three gather outputs = WORSE).
That question is empirical; this probe answers it at the exact
EMCADv1_6 ladder shapes (B=24, C=512, 126->252 ... 1005->2010).

Exactness: the fold must match interpolate_nearest + conv1d bitwise in
f32 (same FMA order per output: k ascending).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tdanet_tpu.utils.misc import honor_jax_platforms_env

honor_jax_platforms_env()

from tdanet_tpu import ops  # noqa: E402
from tdanet_tpu.ops.basic import nearest_idx  # noqa: E402


def eucb_fold(x, w, target_len):
    """Fused nearest-upsample + depthwise k-tap 'same' conv."""
    B, C, L = x.shape
    O, one, K = w.shape
    pad = K // 2
    idx = nearest_idx(L, target_len)            # static numpy (target,)
    # 'same' conv over the upsampled sequence: tap k reads xu[j + k - pad]
    # = x[idx(j + k - pad)]; out-of-range taps are zero (torch zero pad)
    out = None
    for k in range(K):
        shift = k - pad
        j = np.arange(target_len) + shift
        valid = (j >= 0) & (j < target_len)
        gather = jnp.take(x, jnp.asarray(idx[np.clip(j, 0, target_len - 1)]),
                          axis=2)
        term = gather * w[None, :, 0, k, None]
        if not valid.all():
            term = term * jnp.asarray(valid, x.dtype)[None, None, :]
        out = term if out is None else out + term
    return out


def main():
    dev = jax.devices()[0].platform
    B, C = 24, 512
    shapes = [(126, 252), (252, 503), (503, 1005), (1005, 2010)]
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (C, 1, 3), jnp.float32) * 0.1

    def cur(x, w, t):
        y = ops.interpolate_nearest(x, t)
        return ops.conv1d(y, {"weight": w}, stride=1, padding=1, groups=C)

    # exactness check (bit-exact on CPU; on TPU the lax.conv baseline
    # itself loses ~1e-2 abs with closure-captured weights — the known
    # jit-constant conv pathology, docs/PERF.md — so only require the
    # fold to be within that envelope there)
    tol = 1e-5 if dev != "tpu" else 2e-2
    for L, T in shapes:
        x = jax.random.normal(jax.random.fold_in(key, L), (2, C, L),
                              jnp.float32)
        a = cur(x, w, T)
        b = eucb_fold(x, w, T)
        d = float(jnp.max(jnp.abs(a - b)))
        print(f"exact {L}->{T}: max|d|={d:.2e}")
        assert d < tol, d

    if dev != "tpu":
        print("CPU mode: exactness only")
        return

    dtype = jnp.bfloat16
    wb = w.astype(dtype)
    for L, T in shapes:
        x = jax.random.normal(jax.random.fold_in(key, 100 + L),
                              (B, C, L), dtype)
        fa = jax.jit(lambda x: cur(x, wb, T))
        fb = jax.jit(lambda x: eucb_fold(x, wb, T))
        for f, name in ((fa, "interp+conv"), (fb, "fold")):
            o = f(x)
            float(jnp.sum(o[:, 0, :8].astype(jnp.float32)))  # warm+drain
            t0 = time.perf_counter()
            N = 50
            for _ in range(N):
                o = f(x)
            float(jnp.sum(o[:, 0, :8].astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / N * 1e3
            print(f"{name:12s} {L}->{T}: {dt:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
