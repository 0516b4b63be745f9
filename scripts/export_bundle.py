"""Export an AOT deployment bundle from a reference-format checkpoint.

    python scripts/export_bundle.py --ckpt Experiments/.../best_model.pth \
        --out bundle/ --lengths 1.0 2.0 3.0 [--model TDANetBest] \
        [--batch 8] [--dtype bfloat16] [--num_blocks 12] [--platforms cpu tpu]

The bundle (serialized StableHLO programs + weights + meta, see
tdanet_tpu/deploy.py) then serves via ``deploy.load_bundle`` with no
model code. The reference has no deployment-artifact story — it ships
.pth + the whole codebase (audio_test.py:80-88)."""

import argparse
import sys

sys.path.insert(0, ".")

from tdanet_tpu.utils.misc import honor_jax_platforms_env

honor_jax_platforms_env()  # the axon sitecustomize clobbers JAX_PLATFORMS


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True,
                    help="reference-format .pth/.bin checkpoint")
    ap.add_argument("--out", required=True, help="bundle output directory")
    ap.add_argument("--lengths", type=float, nargs="+", required=True,
                    help="utterance lengths (seconds); one program each")
    ap.add_argument("--model", default=None,
                    help="registry name (default: the checkpoint's)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default=None,
                    help="compute dtype, e.g. bfloat16 (default fp32)")
    ap.add_argument("--num_blocks", type=int, default=None,
                    help="early-exit depth override")
    ap.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    args = ap.parse_args()

    from tdanet_tpu import deploy
    from tdanet_tpu.models import BaseModel

    model, params = BaseModel.from_pretrain(args.model or args.ckpt,
                                            args.ckpt)
    meta = deploy.save_bundle(args.out, model, params,
                              lengths=args.lengths, batch_size=args.batch,
                              compute_dtype=args.dtype,
                              num_blocks=args.num_blocks,
                              platforms=args.platforms)
    print(f"exported {len(meta['targets'])} program(s) "
          f"{meta['targets']} (batch {meta['batch_size']}, "
          f"platforms {meta['platforms']}) -> {args.out}")


if __name__ == "__main__":
    main()
