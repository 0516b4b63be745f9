"""Synthetic separable-by-construction corpus at the Libri2Mix recipe
shape (3 s @ 8 kHz): each mixture is two disjoint-band harmonic voices
with random f0, AM envelopes and phases. Used by the round-2 on-chip
convergence demo (docs/PERF.md) — no real corpora ship in this
container, so this stands in for Libri2Mix train-100.

Usage: python scripts/make_convergence_data.py <out_root> [n_train]
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdanet_tpu.utils import write_wav

SR = 8000
T = SR * 3


def voice(rng, f_lo, f_hi):
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


def main():
    root = sys.argv[1]
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    splits = {"tr": (n_train, 0), "dev": (100, 10**6), "tt": (100, 2 * 10**6)}
    for split, (n, seed0) in splits.items():
        infos = {"mix_clean": [], "s1": [], "s2": []}
        for i in range(n):
            rng = np.random.default_rng(seed0 + i)
            s1 = voice(rng, 100, 300)    # low band
            s2 = voice(rng, 700, 1500)   # high band
            for ch, d in (("mix_clean", s1 + s2), ("s1", s1), ("s2", s2)):
                p = os.path.join(root, split, ch, f"utt{i:04d}.wav")
                write_wav(p, d, SR)
                infos[ch].append([p, T])
        for ch, lst in infos.items():
            with open(os.path.join(root, split, f"{ch}.json"), "w") as f:
                json.dump(lst, f)
        print(f"{split}: {n} utts", flush=True)


if __name__ == "__main__":
    main()
