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
    ap.add_argument("--lengths", type=float, nargs="+", default=[],
                    help="utterance lengths (seconds); one program per "
                         "lattice-distinct length")
    ap.add_argument("--lengths_from_manifest", nargs="+", default=[],
                    help="dataset manifest JSON(s) ([path, n_frames] "
                         "rows, e.g. tt/mix_clean.json): export every "
                         "length the split needs, so audio_test.py "
                         "--bundle covers it lattice-exactly")
    ap.add_argument("--model", default=None,
                    help="registry name (default: the checkpoint's)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default=None,
                    help="compute dtype, e.g. bfloat16 (default fp32)")
    ap.add_argument("--num_blocks", type=int, default=None,
                    help="early-exit depth override")
    ap.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    ap.add_argument("--streaming_segment", type=float, default=None,
                    help="also export a live-streaming program at this "
                         "segment length (seconds); served by "
                         "deploy.load_streaming")
    ap.add_argument("--streaming_max_streams", type=int, default=4)
    ap.add_argument("--streaming_overlap", type=float, default=0.25)
    ap.add_argument("--early_exit", type=int, nargs="+", default=[],
                    help="also export each bucket at these depths; "
                         "served by deploy.load_bundle(num_blocks=d)")
    ap.add_argument("--progressive_depth", type=int, default=None,
                    help="also export the adaptive-depth stage pair "
                         "(stage 1 at this depth); served by "
                         "deploy.load_progressive")
    ap.add_argument("--progressive_threshold", type=float, default=0.05)
    args = ap.parse_args()

    from tdanet_tpu import deploy
    from tdanet_tpu.models import BaseModel

    model, params = BaseModel.from_pretrain(args.model or args.ckpt,
                                            args.ckpt)
    lengths = list(args.lengths)
    if args.lengths_from_manifest:
        import json
        sr = model.sample_rate()
        for mpath in args.lengths_from_manifest:
            with open(mpath) as f:
                lengths += [n / sr for _path, n in json.load(f)]
    streaming = None
    if args.streaming_segment is not None:
        streaming = dict(segment=args.streaming_segment,
                         max_streams=args.streaming_max_streams,
                         overlap=args.streaming_overlap)
    if not lengths and streaming is None:
        ap.error("pass --lengths, --lengths_from_manifest and/or "
                 "--streaming_segment")
    progressive = None
    if args.progressive_depth is not None:
        progressive = dict(depth1=args.progressive_depth,
                           threshold=args.progressive_threshold)
    meta = deploy.save_bundle(args.out, model, params,
                              lengths=lengths, batch_size=args.batch,
                              compute_dtype=args.dtype,
                              num_blocks=args.num_blocks,
                              platforms=args.platforms,
                              streaming=streaming,
                              early_exit=args.early_exit,
                              progressive=progressive)
    extra = (f" + streaming S{meta['streaming']['seg_len']}"
             f"x{meta['streaming']['max_streams']}"
             if "streaming" in meta else "")
    if "early_exit" in meta:
        extra += f" + early-exit depths {meta['early_exit']}"
    if "progressive" in meta:
        extra += (f" + progressive d1={meta['progressive']['depth1']}"
                  f"/{meta['progressive']['depth_full']}")
    print(f"exported {len(meta['targets'])} program(s) "
          f"{meta['targets']} (batch {meta['batch_size']}, "
          f"platforms {meta['platforms']}){extra} -> {args.out}")


if __name__ == "__main__":
    main()
