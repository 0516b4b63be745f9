"""Early-exit / variable-depth inference study (run on the real chip).

The separator applies ONE shared-weight UConvBlock num_blocks=16 times
(reference: the fixed 16-iteration Recurrent, TDANet_best.py:383-399),
so any depth <= 16 is a valid program over the same weights. This probe
measures the latency/quality frontier with the round-2 converged
synthetic checkpoint (Experiments/checkpoint/convergence_demo,
SI-SNRi 30.07 dB at depth 16 on the synthetic tt split):

    per depth d in {16,12,8,6,4,2}: SI-SNRi on the tt split + RTFx.

Correctness of the override itself is pinned in tests/test_early_exit.py
(override == model constructed at that depth; per-depth construction is
torch-oracle fidelity-tested in test_tdanet_best_fidelity).

Usage: python scripts/probe_early_exit.py [--ckpt PATH] [--n 100]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import jax
import jax.numpy as jnp

from tdanet_tpu.models.base import BaseModel

SR = 8000
T = SR * 3


def _voice(rng, f_lo, f_hi):
    """Same synthesis as scripts/make_convergence_data.py (seeded)."""
    f0 = rng.uniform(f_lo, f_hi)
    t = np.arange(T) / SR
    sig = np.zeros(T, np.float32)
    for h in range(1, 4):
        if f0 * h < SR / 2 * 0.9:
            sig += rng.uniform(0.3, 1.0) / h * np.sin(
                2 * np.pi * f0 * h * t + rng.uniform(0, 2 * np.pi))
    env = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(0.5, 3.0) * t
                             + rng.uniform(0, 2 * np.pi))
    sig = (sig * env).astype(np.float32)
    return 0.2 * sig / (np.abs(sig).max() + 1e-8)


def make_tt(n):
    mixes, srcs = [], []
    for i in range(n):
        rng = np.random.default_rng(2 * 10 ** 6 + i)  # the tt seeds
        s1, s2 = _voice(rng, 100, 300), _voice(rng, 700, 1500)
        srcs.append(np.stack([s1, s2]))
        mixes.append(s1 + s2)
    return np.stack(mixes), np.stack(srcs)


def sisnr(est, tgt, eps=1e-8):
    est = est - est.mean(-1, keepdims=True)
    tgt = tgt - tgt.mean(-1, keepdims=True)
    proj = (np.sum(est * tgt, -1, keepdims=True)
            / (np.sum(tgt * tgt, -1, keepdims=True) + eps)) * tgt
    noise = est - proj
    return 10 * np.log10((proj ** 2).sum(-1)
                         / ((noise ** 2).sum(-1) + eps) + eps)


def sisnri(ests, srcs, mixes):
    """Mean PIT SI-SNR improvement over the set (n, 2, T)."""
    keep = sisnr(ests, srcs).mean(-1)
    swap = sisnr(ests[:, ::-1], srcs).mean(-1)
    best = np.maximum(keep, swap)
    base = sisnr(np.repeat(mixes[:, None], 2, 1), srcs).mean(-1)
    return float((best - base).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="Experiments/checkpoint/"
                    "convergence_demo/best_model.pth")
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--batch", type=int, default=25)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                    default=True)  # --no-bf16 = fp32 arm
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    model, params = BaseModel.from_pretrain(args.ckpt)
    mixes, srcs = make_tt(args.n)
    dtype = jnp.bfloat16 if args.bf16 else None

    for depth in (16, 12, 8, 6, 4, 2):
        single = lambda p, w: model.apply(p, w[None], compute_dtype=dtype,
                                          num_blocks=depth)[0]
        fwd = jax.jit(lambda p, x: jax.vmap(single, in_axes=(None, 0))(p, x))
        outs = []
        for s in range(0, args.n, args.batch):
            outs.append(np.asarray(fwd(params,
                                       jnp.asarray(mixes[s:s + args.batch]))))
        ests = np.concatenate(outs)
        q = sisnri(ests, srcs, mixes)

        timed = jax.jit(lambda p, x: jnp.sum(
            jax.vmap(single, in_axes=(None, 0))(p, x)[:, 0, :8]))
        xb = jnp.asarray(mixes[:args.batch])
        float(timed(params, xb))
        t0 = time.perf_counter()
        o = None
        for _ in range(args.iters):
            o = timed(params, xb)
        float(o)
        dt = (time.perf_counter() - t0) / args.iters
        rtfx = args.batch * (T / SR) / dt
        print(json.dumps({"depth": depth, "sisnri_db": round(q, 2),
                          "rtfx": round(rtfx, 1)}), flush=True)


if __name__ == "__main__":
    main()
