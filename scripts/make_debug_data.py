"""Generate the synthetic debug dataset used by configs/tdanet_debug.yml
(capability parity with the reference's committed debug manifests,
DataPreProcess/Libri2Mix/debug). Wavs are synthesized (two independent
noise-shaped sources + their mixture) so no corpus is needed."""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tdanet_tpu.utils import write_wav  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="DataPreProcess/Libri2Mix/debug")
    p.add_argument("--n_utt", type=int, default=8)
    p.add_argument("--sample_rate", type=int, default=8000)
    p.add_argument("--seconds", type=float, default=1.5)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    sr = args.sample_rate
    T = int(sr * args.seconds)
    infos = {"mix_clean": [], "s1": [], "s2": []}
    for i in range(args.n_utt):
        # crude "speech-like" sources: amplitude-modulated filtered noise
        t = np.arange(T) / sr
        def synth():
            carrier = rng.standard_normal(T)
            env = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(1, 4) * t
                                     + rng.uniform(0, 6))
            return (np.convolve(carrier, np.ones(8) / 8, "same")
                    * env * 0.2).astype(np.float32)
        s1, s2 = synth(), synth()
        for ch, d in (("mix_clean", s1 + s2), ("s1", s1), ("s2", s2)):
            path = os.path.abspath(
                os.path.join(args.out_dir, ch, f"utt{i}.wav"))
            write_wav(path, d, sr)
            infos[ch].append([path, T])
    for ch, lst in infos.items():
        with open(os.path.join(args.out_dir, f"{ch}.json"), "w") as f:
            json.dump(lst, f, indent=2)
    print(f"wrote {args.n_utt} debug utterances to {args.out_dir}")


if __name__ == "__main__":
    main()
