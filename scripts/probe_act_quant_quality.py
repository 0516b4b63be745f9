"""SI-SNRi cost of activation-storage quantization on a CONVERGED model
(companion to probe_act_quant.py, which measures speed + SNR on
random-init weights). Uses the round-2 convergence checkpoint and the
synthetic tt split, depth 16, bf16 compute.

Usage: python scripts/probe_act_quant_quality.py [--n 100]
"""
import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import jax
import jax.numpy as jnp

from tdanet_tpu import ops
from tdanet_tpu.models.base import BaseModel

from probe_early_exit import make_tt, sisnri


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="Experiments/checkpoint/"
                    "convergence_demo/best_model.pth")
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--batch", type=int, default=25)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    model, params = BaseModel.from_pretrain(args.ckpt)
    mixes, srcs = make_tt(args.n)

    for storage in (None, "int8", "fp8_e4m3", "fp8_e5m2"):
        single = lambda p, w: model.apply(p, w[None],
                                          compute_dtype=jnp.bfloat16)[0]
        fwd = jax.jit(lambda p, x: jax.vmap(single, in_axes=(None, 0))(p, x))
        outs = []
        with ops.act_storage(storage):
            for s in range(0, args.n, args.batch):
                outs.append(np.asarray(
                    fwd(params, jnp.asarray(mixes[s:s + args.batch]))))
        ests = np.concatenate(outs)
        q = sisnri(ests, srcs, mixes)
        print(json.dumps({"storage": storage or "off",
                          "sisnri_db": round(q, 2)}), flush=True)


if __name__ == "__main__":
    main()
