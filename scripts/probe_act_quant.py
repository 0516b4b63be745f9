"""Activation-storage quantization experiment (run on the real chip).

The separator is HBM-bandwidth-bound (683 GB/s = 83% of v5e peak at
B=24 bf16, BENCH_r02). 8-bit storage of the recurrence's landmark
tensors (pyramid scales, GA output, fused scales, scan carry — the
``ops.store_activation`` hooks) would halve their traffic IF XLA
materializes the quantized buffers at fusion boundaries. This probe
measures both sides of the bargain:

- RTFx at the bench config (B=24, 2 s, 16 kHz, bf16 compute) for
  storage in {off, int8, fp8_e4m3, fp8_e5m2};
- output SNR vs the fp32 no-quant forward on the golden mixture
  (audio_mix.wav) — the 0.1 dB SI-SNRi budget needs >= ~35 dB.

Usage: python scripts/probe_act_quant.py [--batch 24] [--iters 20]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import jax
import jax.numpy as jnp

from tdanet_tpu import ops
from tdanet_tpu.models import TDANetBest
from tdanet_tpu.utils import read_wav


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--blocks", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=2.0)
    args = ap.parse_args()
    sr = 16000

    print(f"devices: {jax.devices()}", file=sys.stderr)
    model = TDANetBest(out_channels=128, in_channels=512,
                       num_blocks=args.blocks, upsampling_depth=5,
                       enc_kernel_size=4, num_sources=2, sample_rate=sr)
    params = model.init(jax.random.PRNGKey(0))

    T = int(sr * args.seconds)
    mix = jax.random.normal(jax.random.PRNGKey(1), (args.batch, T),
                            jnp.float32)
    wav, wsr = read_wav("/root/reference/audio_mix.wav")
    assert wsr == sr
    gold = jnp.asarray(wav)[None]

    def build(storage, dtype):
        single = lambda p, w: model.apply(p, w[None],
                                          compute_dtype=dtype)[0]
        timed = jax.jit(lambda p, x: jnp.sum(
            jax.vmap(single, in_axes=(None, 0))(p, x)[:, 0, :8]))
        full = jax.jit(lambda p, x: model.apply(p, x,
                                                compute_dtype=dtype))
        ctx = ops.act_storage(storage) if storage else \
            ops.act_storage(None)
        with ctx:
            float(timed(params, mix))         # compile+warm (trace here)
            ref_out = np.asarray(full(params, gold))
        return timed, ref_out

    results = {}
    # fp32 no-quant golden output = quality reference
    _, fp32_ref = build(None, None)

    for storage in (None, "int8", "fp8_e4m3", "fp8_e5m2"):
        timed, out = build(storage, jnp.bfloat16)
        float(timed(params, mix))
        t0 = time.perf_counter()
        o = None
        for _ in range(args.iters):
            o = timed(params, mix)
        float(o)
        dt = (time.perf_counter() - t0) / args.iters
        rtfx = args.batch * args.seconds / dt
        err = out.astype(np.float64) - fp32_ref.astype(np.float64)
        snr = 10 * np.log10((fp32_ref ** 2).sum() / ((err ** 2).sum()
                                                     + 1e-30))
        key = storage or "off"
        results[key] = {"rtfx": round(rtfx, 1),
                        "snr_vs_fp32_db": round(float(snr), 1)}
        print(json.dumps({key: results[key]}), flush=True)

    base = results["off"]["rtfx"]
    for k, v in results.items():
        v["speedup"] = round(v["rtfx"] / base, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
