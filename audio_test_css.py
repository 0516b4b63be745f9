"""Long-form continuous-speech-separation CLI (reference:
audio_test_css.py:62-141): per-segment forward, cosine-similarity
permutation-aligned overlap-add stitching, zero-pad trim, per-channel wav
dump. The stitching math lives in tdanet_tpu.utils.css (jit-friendly).

Usage:
    python audio_test_css.py --conf_dir <conf.yml> [--ckpt_path p]
        [--save_path dir]
"""

import argparse
import os
import sys
import time

import numpy as np

from tdanet_tpu import datas as data_zoo
from tdanet_tpu import models as model_zoo
from tdanet_tpu.utils import load_yaml, write_wav
from tdanet_tpu.utils.misc import honor_jax_platforms_env

honor_jax_platforms_env()  # the axon sitecustomize clobbers JAX_PLATFORMS
from tdanet_tpu.utils.css import stitch_segments


def main(argv=None):
    p = argparse.ArgumentParser(allow_abbrev=False)
    p.add_argument("--conf_dir", required=True)
    p.add_argument("--ckpt_path", default=None)
    p.add_argument("--save_path", default="./separated_css")
    p.add_argument("--test_dir", default=None,
                   help="dir of long-form wavs (overrides config)")
    p.add_argument("--segment", type=float, default=None)
    p.add_argument("--overlap", type=float, default=None)
    p.add_argument("--mode", choices=["stitch", "sp"], default="stitch",
                   help="stitch: reference chunk+overlap-add semantics; "
                   "sp: ONE sequence-parallel full-utterance forward, "
                   "time sharded over all local devices (no stitching "
                   "seams; beyond-reference capability)")
    p.add_argument("--progressive_depth", type=int, default=None,
                   help="adaptive-depth segment separation (stitch mode): "
                        "stage 1 at this depth, exact continuation of "
                        "unconverged segments to full depth "
                        "(tdanet_tpu/progressive.py)")
    p.add_argument("--progressive_threshold", type=float, default=0.05)
    args = p.parse_args(argv)  # reject typo'd flags loudly
    if args.progressive_depth is not None and args.mode != "stitch":
        p.error("--progressive_depth only applies to --mode stitch")

    conf = load_yaml(args.conf_dir)
    exp_dir = os.path.join("Experiments", "checkpoint",
                           conf["exp"]["exp_name"])
    ckpt = args.ckpt_path or os.path.join(exp_dir, "best_model.pth")

    dc = conf["datamodule"]["data_config"]
    sr = dc["sample_rate"]
    model, params = model_zoo.BaseModel.from_pretrain(
        conf["audionet"]["audionet_name"], ckpt, sample_rate=sr,
        **conf["audionet"]["audionet_config"])

    segment = args.segment or dc.get("segment", 4.0)
    overlap = args.overlap if args.overlap is not None \
        else dc.get("overlap", 0.25)
    if conf["datamodule"]["data_name"] == "LibriCSSDataModule" \
            and args.test_dir is None:
        # CLI --segment/--overlap must reach the dataset's slicer too —
        # the stitcher's overlap_len below is computed from the resolved
        # values, and a config/CLI disagreement would silently misalign
        # the overlap-add
        dc_eff = dict(dc, segment=segment, overlap=overlap)
        dm = data_zoo.LibriCSSDataModule(**dc_eff)
    else:
        # any config + --test_dir of long wavs works
        if args.test_dir is None:
            p.error("--test_dir is required unless the config uses "
                    "LibriCSSDataModule")
        dm = data_zoo.LibriCSSDataModule(
            test_dir=args.test_dir, n_src=dc.get("n_src", 2),
            sample_rate=sr, segment=segment, overlap=overlap)

    if args.mode == "sp":
        from tdanet_tpu.utils import read_wav
        from tdanet_tpu.parallel import make_sp_mesh, separate_sp
        mesh = make_sp_mesh()
        test_dir = args.test_dir or dm.dirs["test"]
        t0 = time.time()
        names = [n for n in sorted(os.listdir(test_dir))
                 if n.endswith(".wav")]
        for f_name in names:
            wav, _ = read_wav(os.path.join(test_dir, f_name))
            if wav.ndim > 1:
                wav = wav[:, 0]
            streams = separate_sp(model, params, wav, mesh)
            for s in range(streams.shape[0]):
                write_wav(os.path.join(args.save_path, f"s{s + 1}", f_name),
                          streams[s], sr)
        print(f"Deal time: [{time.time() - t0:.2f}] seconds for "
              f"[{len(names)}] items (sp={mesh.shape['sp']}).")
        return

    # setup() decodes and slices every test wav — only the stitch path
    # consumes the segments (sp re-reads whole files itself)
    dm.setup()
    _, _, test_set = dm.make_sets
    overlap_len = int(sr * segment * overlap)
    t0 = time.time()
    for idx in range(len(test_set)):
        f_name, segments, pad_len = test_set[idx]
        streams = stitch_segments(
            model, params, segments, overlap_len,
            progressive_depth=args.progressive_depth,
            progressive_threshold=args.progressive_threshold)
        if pad_len:
            streams = streams[:, :-pad_len]
        for s in range(streams.shape[0]):
            write_wav(os.path.join(args.save_path, f"s{s + 1}", f_name),
                      streams[s], sr)
    print(f"Deal time: [{time.time() - t0:.2f}] seconds for "
          f"[{len(test_set)}] items.")


if __name__ == "__main__":
    sys.exit(main())
