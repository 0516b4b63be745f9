"""Synthetic separable-by-construction corpus at the Libri2Mix recipe
shape (default 3 s @ 8 kHz): each mixture is n_src disjoint-band
harmonic voices with random f0, AM envelopes and phases. Used by the
on-chip convergence arms (docs/PERF.md) — no real corpora ship in this
container, so this stands in for Libri2Mix train-100 (clean 2-src) and,
with --n_src/--noise_snr/--var_len, for the WHAM-style regime the
reference's recipes actually run (whamdatamodule.py:56 `mix_both`:
noisy mixture, clean targets; libri2mixdatamodule.py:148-155
variable-length utterances random-cropped at train time).

Usage: python scripts/make_convergence_data.py <out_root> [n_train]
         [--n_src N] [--noise_snr DB] [--var_len LO,HI seconds]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdanet_tpu.utils import write_wav

SR = 8000
# disjoint f0 bands; ≤3 harmonics each, capped at 0.9·Nyquist — up to
# 4 voices stay spectrally separable by construction
BANDS = [(100, 280), (700, 1400), (320, 620), (1600, 2900)]


def voice(rng, f_lo, f_hi, n):
    f0 = rng.uniform(f_lo, f_hi)
    t = np.arange(n) / SR
    sig = np.zeros(n, np.float32)
    for h in range(1, 4):
        if f0 * h < SR / 2 * 0.9:
            sig += rng.uniform(0.3, 1.0) / h * np.sin(
                2 * np.pi * f0 * h * t + rng.uniform(0, 2 * np.pi))
    env = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(0.5, 3.0) * t
                             + rng.uniform(0, 2 * np.pi))
    sig = (sig * env).astype(np.float32)
    return 0.2 * sig / (np.abs(sig).max() + 1e-8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_root")
    ap.add_argument("n_train", nargs="?", type=int, default=800)
    ap.add_argument("--n_src", type=int, default=2)
    ap.add_argument("--noise_snr", type=float, default=None,
                    help="add white noise to the MIXTURE at this SNR "
                         "(dB); targets stay clean and the mix manifest "
                         "becomes mix_both (WHAM semantics)")
    ap.add_argument("--var_len", type=str, default="",
                    help="'lo,hi' seconds: per-utterance length uniform "
                         "in [lo, hi] (default: fixed 3 s)")
    args = ap.parse_args()
    n_src = args.n_src
    assert n_src <= len(BANDS), n_src
    mix_key = "mix_clean" if args.noise_snr is None else "mix_both"
    lo, hi = ((float(v) for v in args.var_len.split(","))
              if args.var_len else (3.0, 3.0))
    lo, hi = float(lo), float(hi)

    splits = {"tr": (args.n_train, 0), "dev": (100, 10**6),
              "tt": (100, 2 * 10**6)}
    for split, (n, seed0) in splits.items():
        keys = [mix_key] + [f"s{i + 1}" for i in range(n_src)]
        infos = {k: [] for k in keys}
        for i in range(n):
            rng = np.random.default_rng(seed0 + i)
            T = int(rng.uniform(lo, hi) * SR)
            srcs = [voice(rng, *BANDS[s], T) for s in range(n_src)]
            mix = np.sum(srcs, axis=0)
            if args.noise_snr is not None:
                noise = rng.standard_normal(T).astype(np.float32)
                sig_pow = float(np.mean(mix ** 2)) + 1e-12
                noise *= np.sqrt(
                    sig_pow / 10 ** (args.noise_snr / 10)
                    / (float(np.mean(noise ** 2)) + 1e-12))
                mix = mix + noise
            chans = [(mix_key, mix)] + [(f"s{j + 1}", srcs[j])
                                        for j in range(n_src)]
            for ch, d in chans:
                p = os.path.join(args.out_root, split, ch,
                                 f"utt{i:04d}.wav")
                write_wav(p, d.astype(np.float32), SR)
                infos[ch].append([p, T])
        for ch, lst in infos.items():
            with open(os.path.join(args.out_root, split,
                                   f"{ch}.json"), "w") as f:
                json.dump(lst, f)
        print(f"{split}: {n} utts (n_src={n_src}, mix={mix_key}, "
              f"len {lo}-{hi}s)", flush=True)


if __name__ == "__main__":
    main()
