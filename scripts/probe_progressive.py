"""Progressive (adaptive-depth) separation study — run on the real chip.

Questions, answered with the round-2 converged synthetic checkpoint on
the synthetic tt split (same corpus as scripts/probe_early_exit.py):

1. Is the convergence proxy (the recurrence's last-iteration relative
   delta at depth d1) predictive of which utterances GAIN from running
   the remaining 16 - d1 iterations? (per-utterance correlation of
   delta vs [sisnr@16 - sisnr@d1])
2. The operating curve: for a threshold sweep, escalation fraction,
   SI-SNRi, and measured wall-clock RTFx of the full two-stage pipeline
   vs the fixed depth-16 and depth-d1 baselines.

Timing note: the pipeline REQUIRES per-batch delta readbacks (policy
decisions are host-side), so unlike the pure-compute probes the wall
clock here includes those syncs — it is an honest end-to-end number,
comparable to the fixed-depth arms timed the same way (full est
readback included for all arms).

Usage: python scripts/probe_progressive.py [--d1 8] [--n 100]
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
from tdanet_tpu.progressive import separate_progressive
from probe_early_exit import make_tt, sisnr, sisnri, SR, T


_FWD_CACHE = {}


def fixed_depth_ests(model, params, mixes, depth, batch, dtype):
    # cache the jitted program per depth: a fresh lambda per call would
    # RETRACE + RECOMPILE inside the timing loop (minutes each on the
    # tunneled TPU, and it hammers the remote compile helper)
    if depth not in _FWD_CACHE:
        single = lambda p, w: model.apply(p, w[None], compute_dtype=dtype,
                                          num_blocks=depth)[0]
        _FWD_CACHE[depth] = jax.jit(
            lambda p, x: jax.vmap(single, in_axes=(None, 0))(p, x))
    fwd = _FWD_CACHE[depth]
    outs = []
    for s in range(0, len(mixes), batch):
        outs.append(np.asarray(fwd(params,
                                   jnp.asarray(mixes[s:s + batch]))))
    return np.concatenate(outs)


def timed(fn, iters):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="Experiments/checkpoint/"
                    "convergence_demo/best_model.pth")
    ap.add_argument("--d1", type=int, default=8)
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--batch", type=int, default=25)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                    default=True)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    model, params = BaseModel.from_pretrain(args.ckpt)
    mixes, srcs = make_tt(args.n)
    dtype = jnp.bfloat16 if args.bf16 else None

    # -- proxy validity ---------------------------------------------------
    est16 = fixed_depth_ests(model, params, mixes, 16, args.batch, dtype)
    est_d1 = fixed_depth_ests(model, params, mixes, args.d1, args.batch,
                              dtype)

    def per_utt_pit_sisnr(ests):
        keep = sisnr(ests, srcs).mean(-1)
        swap = sisnr(ests[:, ::-1], srcs).mean(-1)
        return np.maximum(keep, swap)

    gain = per_utt_pit_sisnr(est16) - per_utt_pit_sisnr(est_d1)
    _, info = separate_progressive(model, params, mixes, depth1=args.d1,
                                   threshold=np.inf,
                                   batch_size=args.batch,
                                   compute_dtype=dtype)
    delta = info["delta"]
    r = float(np.corrcoef(delta, gain)[0, 1])
    # rank correlation without scipy dependence on spearman
    rr = float(np.corrcoef(np.argsort(np.argsort(delta)),
                           np.argsort(np.argsort(gain)))[0, 1])
    print(json.dumps({"proxy": {"d1": args.d1, "pearson_r": round(r, 3),
                                "spearman_r": round(rr, 3),
                                "gain_db_mean": round(float(gain.mean()), 3),
                                "delta_min": round(float(delta.min()), 4),
                                "delta_max": round(float(delta.max()), 4)}}),
          flush=True)

    # -- operating curve --------------------------------------------------
    base_q16 = sisnri(est16, srcs, mixes)
    base_qd1 = sisnri(est_d1, srcs, mixes)

    def run_fixed(depth):
        return lambda: fixed_depth_ests(model, params, mixes, depth,
                                        args.batch, dtype)
    dt16 = timed(run_fixed(16), args.iters)
    dtd1 = timed(run_fixed(args.d1), args.iters)
    clip_s = T / SR
    print(json.dumps({"fixed": {"depth": 16,
                                "sisnri_db": round(base_q16, 2),
                                "rtfx": round(args.n * clip_s / dt16, 1)}}),
          flush=True)
    print(json.dumps({"fixed": {"depth": args.d1,
                                "sisnri_db": round(base_qd1, 2),
                                "rtfx": round(args.n * clip_s / dtd1, 1)}}),
          flush=True)

    for q in (0.9, 0.75, 0.5, 0.25, 0.1):
        thr = float(np.quantile(delta, q))
        ests, info = separate_progressive(
            model, params, mixes, depth1=args.d1, threshold=thr,
            batch_size=args.batch, compute_dtype=dtype)
        quality = sisnri(ests, srcs, mixes)
        dt = timed(lambda: separate_progressive(
            model, params, mixes, depth1=args.d1, threshold=thr,
            batch_size=args.batch, compute_dtype=dtype), args.iters)
        print(json.dumps({
            "threshold_q": q, "threshold": round(thr, 4),
            "escalated_frac": round(info["n_escalated"] / args.n, 3),
            "sisnri_db": round(quality, 2),
            "rtfx": round(args.n * clip_s / dt, 1),
            "vs16_db": round(quality - base_q16, 2)}), flush=True)


if __name__ == "__main__":
    main()
