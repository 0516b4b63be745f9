"""Eval CLI (reference: audio_test.py:58-135): per-utterance test-set
SI-SNR(i)/SDR(i) streamed to results/metrics.csv; optional separated-wav
dump. Batches utterances through lattice-bucketed jit programs instead of
the reference's batch=1 dynamic-shape loop.

Usage:
    python audio_test.py --conf_dir Experiments/checkpoint/<exp>/conf.yml \
        [--ckpt_path path.pth] [--save_output true] [--save_path dir] \
        [--progressive_depth 8 [--progressive_threshold 0.05]]
"""

import argparse
import os
import sys

import numpy as np

from tdanet_tpu import datas as data_zoo
from tdanet_tpu import models as model_zoo
from tdanet_tpu.metrics import MetricsTracker
from tdanet_tpu.utils import load_yaml, separate, write_wav
from tdanet_tpu.utils.misc import honor_jax_platforms_env

honor_jax_platforms_env()  # the axon sitecustomize clobbers JAX_PLATFORMS


def main(argv=None):
    p = argparse.ArgumentParser(allow_abbrev=False)
    p.add_argument("--conf_dir", required=True)
    p.add_argument("--ckpt_path", default=None)
    p.add_argument("--save_output", default="False")
    p.add_argument("--save_path", default="./separated")
    p.add_argument("--batch_size", type=int, default=8,
                   help="bucketed batched eval; 1 = reference behavior")
    p.add_argument("--num_blocks", type=int, default=None,
                   help="early-exit depth override on the shared-weight "
                        "recurrence (e.g. 12 = -0.26 dB for +30%% RTFx, "
                        "docs/PERF.md)")
    p.add_argument("--progressive_depth", type=int, default=None,
                   help="adaptive-depth eval: run every utterance at this "
                        "depth, then continue utterances whose recurrence "
                        "hasn't converged to full depth (exact "
                        "continuation; tdanet_tpu/progressive.py)")
    p.add_argument("--progressive_threshold", type=float, default=0.05,
                   help="escalate utterances with last-iteration relative "
                        "delta above this (with --progressive_depth)")
    p.add_argument("--dp", type=int, default=None,
                   help="shard each eval batch over the first N devices "
                        "(data-parallel scale-out; batch_size must be a "
                        "multiple of N)")
    p.add_argument("--bundle", default=None,
                   help="evaluate through an AOT deployment bundle "
                        "(scripts/export_bundle.py) instead of the model "
                        "code — proves the shipped artifact's metrics; "
                        "the bundle must export every test-set length "
                        "(use --lengths_from_manifest at export)")
    args = p.parse_args(argv)  # reject typo'd flags loudly
    if args.bundle is not None and (
            args.num_blocks is not None
            or args.progressive_depth is not None
            or (args.dp or 0) > 1):
        p.error("--bundle serves fixed pre-exported programs; "
                "--num_blocks/--progressive_depth/--dp do not apply "
                "(bake depth/dtype at export time)")
    if args.dp is not None and args.dp > 1 and args.batch_size <= 1:
        p.error("--dp requires the batched eval path: set --batch_size "
                "to a multiple of --dp (batch_size=1 is the reference "
                "single-utterance loop)")
    if args.progressive_depth is not None and args.num_blocks is not None:
        p.error("--progressive_depth is exclusive with --num_blocks "
                "(adaptive depth subsumes the fixed override)")

    conf = load_yaml(args.conf_dir)
    exp_dir = os.path.join("Experiments", "checkpoint",
                           conf["exp"]["exp_name"])
    ckpt = args.ckpt_path or os.path.join(exp_dir, "best_model.pth")

    sr = conf["datamodule"]["data_config"]["sample_rate"]
    if args.bundle is not None:
        # the whole point: no model code, no checkpoint load — the
        # artifact carries programs + weights (tdanet_tpu/deploy.py)
        from tdanet_tpu import deploy
        dep = deploy.load_bundle(args.bundle)
        if dep.sample_rate != sr:
            raise SystemExit(
                f"bundle was exported at {dep.sample_rate} Hz but the "
                f"config's test set is {sr} Hz")
        model = params = None
    else:
        model, params = model_zoo.BaseModel.from_pretrain(
            conf["audionet"]["audionet_name"], ckpt, sample_rate=sr,
            **conf["audionet"]["audionet_config"])

    dm = getattr(data_zoo, conf["datamodule"]["data_name"])(
        **{**conf["datamodule"]["data_config"], "segment": None})
    dm.setup()
    _, _, test_set = dm.make_sets

    results_dir = os.path.join(exp_dir, "results")
    os.makedirs(results_dir, exist_ok=True)
    metrics = MetricsTracker(os.path.join(results_dir, "metrics.csv"))

    save = args.save_output.lower() == "true"
    mesh = None
    if args.dp is not None and args.dp > 1:
        import jax
        from tdanet_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(dp=args.dp, tp=1,
                         devices=jax.devices()[:args.dp])
    from tdanet_tpu.utils.progress import eval_progress
    from tdanet_tpu.utils.separator import separate_batched_stream
    progress, metrics_col = eval_progress("Testing")

    def emit(done, mix, sources, key, est):
        metrics(mix=mix, clean=sources, estimate=est, key=key)
        if save:
            for s in range(est.shape[0]):
                write_wav(os.path.join(args.save_path, f"s{s + 1}",
                                       key), np.asarray(est[s]), sr)
        if done % 50 == 0:
            metrics_col.update(metrics.update())

    with progress:
        if args.bundle is not None:
            B = dep.batch_size
            done = 0
            for s0 in progress.track(range(0, len(test_set), B)):
                items = [test_set[i]
                         for i in range(s0, min(len(test_set), s0 + B))]
                ests = dep.separate_batched([it[0] for it in items])
                for item, est in zip(items, ests):
                    mix, sources, key = item
                    emit(done, mix, sources, key, est)
                    done += 1
        elif args.progressive_depth is not None:
            from tdanet_tpu.progressive import separate_progressive_stream
            lengths = [test_set.mix[i][1] for i in range(len(test_set))]
            pstats = {}
            stream = separate_progressive_stream(
                model, params, lengths, lambda i: test_set[i],
                depth1=args.progressive_depth,
                threshold=args.progressive_threshold,
                batch_size=max(args.batch_size, 1), stats=pstats,
                mesh=mesh)
            for done, (_, item, est) in enumerate(
                    progress.track(stream, total=len(test_set))):
                mix, sources, key = item
                emit(done, mix, sources, key, est)
            print(f"progressive: depth {pstats['depth1']}->"
                  f"{pstats['depth_full']}, escalated "
                  f"{pstats['n_escalated']}/{pstats['n']} "
                  f"(mean delta {pstats['delta_mean']:.4f})")
        elif args.batch_size > 1:
            # streaming pipeline: wav IO prefetches on a thread and
            # metrics/wav-dump host work overlaps the next batch's
            # device compute (one-deep dispatch pipeline)
            lengths = [test_set.mix[i][1] for i in range(len(test_set))]
            stream = separate_batched_stream(
                model, params, lengths, lambda i: test_set[i],
                batch_size=args.batch_size, num_blocks=args.num_blocks,
                mesh=mesh)
            for done, (_, item, est) in enumerate(
                    progress.track(stream, total=len(test_set))):
                mix, sources, key = item
                emit(done, mix, sources, key, est)
        else:
            for idx in progress.track(range(len(test_set))):
                mix, sources, key = test_set[idx]
                est = np.asarray(separate(model, params, mix,
                                          num_blocks=args.num_blocks))
                emit(idx, mix, sources, key, est)
    final = metrics.final()
    print("final:", final)
    return final


if __name__ == "__main__":
    # empty/NaN-metric runs must be visible to CI gates
    sys.exit(0 if main() else 1)
