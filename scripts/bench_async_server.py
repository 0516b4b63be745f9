"""AsyncBatchServer throughput/latency benchmark (real chip).

Measures the continuous-batching serving frontier:
1. saturation (closed-loop): N client threads submit-and-wait — the
   server's aggregate capacity with a full pipeline;
2. offered-load sweep (open-loop): requests arrive at rate lambda
   (uniform spacing); reports aggregate realtime factor and hop latency
   p50/p95 at each load point.

Usage (on the TPU):
    python scripts/bench_async_server.py [--max_batch 8] [--bf16]
        [--clip_s 2.0] [--sr 16000] [--n_requests 400]

Round-2 baseline being beaten: 145x realtime aggregate at max_batch=8
(serialized coalesce->dispatch->resolve worker; docs/SERVING.md).
"""
import argparse
import json
import sys
import threading
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from tdanet_tpu.models import TDANetBest
from tdanet_tpu.serving import AsyncBatchServer


def build(args):
    model = TDANetBest(out_channels=128, in_channels=512, num_blocks=16,
                       upsampling_depth=5, enc_kernel_size=4,
                       num_sources=2, sample_rate=args.sr)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def make_clips(args, n):
    rng = np.random.default_rng(0)
    T = int(args.clip_s * args.sr)
    return [(rng.standard_normal(T) * 0.1).astype(np.float32)
            for _ in range(min(n, 32))]


def closed_loop(server, clips, n_clients, n_requests, clip_s):
    """Each client submits and waits — saturation capacity."""
    lat = []
    lock = threading.Lock()
    counter = [0]

    def client(cid):
        k = 0
        while True:
            with lock:
                if counter[0] >= n_requests:
                    return
                counter[0] += 1
            t0 = time.perf_counter()
            server.separate(clips[(cid + k) % len(clips)], timeout=300)
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)
            k += 1

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat = np.array(sorted(lat))
    return {
        "mode": "closed", "clients": n_clients, "requests": len(lat),
        "wall_s": round(wall, 3),
        "agg_rtfx": round(len(lat) * clip_s / wall, 1),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
        "p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 1),
    }


def open_loop(server, clips, rate_hz, n_requests, clip_s):
    """Uniform arrivals at rate_hz; measures latency under offered load.

    Latency is stamped by a done-callback at RESOLVE time (the resolver
    thread fires it inside set_result) — computing it when the client
    later observes the future would inflate early requests by the whole
    submission window."""
    lat, futs = [], []

    def submit(clip):
        ts = time.perf_counter()
        fut = server.submit(clip)
        fut.add_done_callback(
            lambda f, ts=ts: lat.append(time.perf_counter() - ts))
        return fut

    t0 = time.perf_counter()
    for i in range(n_requests):
        target = t0 + i / rate_hz
        now = time.perf_counter()
        if target > now:
            time.sleep(target - now)
        futs.append(submit(clips[i % len(clips)]))
    for f in futs:
        f.result(timeout=300)
    wall = time.perf_counter() - t0
    # set_result wakes result() waiters BEFORE running done-callbacks,
    # so the tail batch's latency appends may still be in flight on the
    # resolver thread — wait for them or the percentiles are computed
    # on a list short by up to max_batch samples
    deadline = time.perf_counter() + 5.0
    while len(lat) < len(futs) and time.perf_counter() < deadline:
        time.sleep(0.001)
    lat = np.array(sorted(lat))
    return {
        "mode": "open", "rate_hz": rate_hz, "requests": n_requests,
        "offered_rtfx": round(rate_hz * clip_s, 1),
        "agg_rtfx": round(n_requests * clip_s / wall, 1),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
        "p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--pipeline_depth", type=int, default=2)
    ap.add_argument("--clip_s", type=float, default=2.0)
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--n_requests", type=int, default=400)
    ap.add_argument("--closed_only", action="store_true")
    ap.add_argument("--rates", type=str, default="")
    ap.add_argument("--adaptive", action="store_true",
                    help="adaptive batch-size ladder (grow under "
                         "overload toward max_batch)")
    ap.add_argument("--min_batch", type=int, default=None)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    model, params = build(args)
    clips = make_clips(args, 32)
    server = AsyncBatchServer(
        model, params, max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms, pipeline_depth=args.pipeline_depth,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        adaptive=args.adaptive, min_batch=args.min_batch)
    try:
        # warm everything (bucket compile) before timing; the 16-block
        # remote compile can exceed 10 min on a contended host
        server.separate(clips[0], timeout=1800)
        if args.adaptive:
            # compile every ladder rung up front so the measurement sees
            # steady-state growth, not a compile stall (in production
            # the background compiler hides this; here it would skew
            # the fixed-duration timing windows)
            lattice = server.lattice
            target = -(-clips[0].shape[-1] // lattice) * lattice
            for B in server._ladder:
                print(f"prewarm rung B={B}...", file=sys.stderr)
                server._get_fwd(target, B)

        row = closed_loop(server, clips, n_clients=4 * args.max_batch,
                          n_requests=args.n_requests, clip_s=args.clip_s)
        print(json.dumps(row), flush=True)

        if not args.closed_only:
            cap = row["agg_rtfx"] / args.clip_s  # requests/s at saturation
            rates = [float(r) for r in args.rates.split(",") if r] or \
                [cap * f for f in (0.25, 0.5, 0.75, 0.9, 1.1)]
            for rate in rates:
                row = open_loop(server, clips, rate,
                                min(args.n_requests,
                                    max(60, int(rate * 15))),
                                args.clip_s)
                print(json.dumps(row), flush=True)
    finally:
        server.close()


if __name__ == "__main__":
    main()
