"""On-chip soak of RecyclingMultiStreamSeparator: RSS stays bounded
across worker generations under the axon client's ~250 KB/dispatch host
leak (environment, not repo code — docs/PERF.md soak section).

Feeds N live streams, auto-recycles every --steps_per_worker hops, and
logs per-generation worker RSS + hop latency. PASS = per-generation RSS
growth is flat-to-linear WITHIN a generation but resets at each recycle,
and hop latency stays stable across generations.

Usage: python scripts/soak_recycle.py [--minutes 20] [--streams 4]
       [--steps_per_worker 150] [--prewarm]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=20.0)
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--steps_per_worker", type=int, default=150)
    ap.add_argument("--segment", type=float, default=1.0)
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--prewarm", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp
    from tdanet_tpu.models import TDANetBest
    from tdanet_tpu.serving_worker import RecyclingMultiStreamSeparator

    kwargs = dict(out_channels=128, in_channels=512, num_blocks=16,
                  upsampling_depth=5, enc_kernel_size=4, num_sources=2,
                  sample_rate=args.sr)
    params = TDANetBest(**kwargs).init(__import__("jax").random.PRNGKey(0))

    hop = int(args.sr * args.segment * 0.75)  # overlap 0.25
    rng = np.random.default_rng(0)
    deadline = time.time() + args.minutes * 60.0

    eng = RecyclingMultiStreamSeparator(
        "TDANetBest", kwargs, params,
        max_steps_per_worker=args.steps_per_worker, prewarm=args.prewarm,
        segment=args.segment, overlap=0.25, sample_rate=args.sr,
        max_streams=args.streams, compute_dtype=jnp.bfloat16)
    try:
        for s in range(args.streams):
            eng.open(s)
        gen_stats = {}  # generation -> [rss_kb...], [lat...]
        hops = 0
        while time.time() < deadline:
            for s in range(args.streams):
                eng.push(s, (rng.standard_normal(hop) * 0.1)
                         .astype(np.float32))
            t0 = time.perf_counter()
            outs = eng.step()
            lat = time.perf_counter() - t0
            hops += 1
            g = eng.generation
            rss = eng.worker_rss_kb()
            st = gen_stats.setdefault(g, {"rss": [], "lat": []})
            st["rss"].append(rss)
            st["lat"].append(lat)
            if hops % 25 == 0:
                print(json.dumps({
                    "hops": hops, "generation": g, "rss_mb": rss // 1024,
                    "lat_p50_ms": round(float(np.median(
                        st["lat"][-25:])) * 1e3, 1),
                    "streams": len(outs)}), flush=True)
        print("== per-generation summary ==")
        for g, st in sorted(gen_stats.items()):
            rss = np.array(st["rss"], np.float64)
            lats = np.array(st["lat"], np.float64) * 1e3
            print(json.dumps({
                "generation": g, "hops": len(lats),
                "rss_start_mb": round(rss[0] / 1024, 1),
                "rss_end_mb": round(rss[-1] / 1024, 1),
                "lat_p50_ms": round(float(np.median(lats)), 1),
                "lat_p95_ms": round(float(np.percentile(lats, 95)), 1),
            }), flush=True)
        gens = sorted(gen_stats)
        if len(gens) >= 2:
            starts = [gen_stats[g]["rss"][0] for g in gens]
            print(f"RSS reset across recycles: starts (MB) = "
                  f"{[round(s / 1024, 1) for s in starts]}")
            print("SOAK_OK" if max(starts) < 2.0 * min(starts)
                  else "SOAK_RSS_DRIFT")
        else:
            print("SOAK_TOO_SHORT (no recycle happened)")
    finally:
        eng.shutdown()


if __name__ == "__main__":
    main()
