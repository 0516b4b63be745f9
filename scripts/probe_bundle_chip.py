"""On-chip proof for deployment bundles (docs/SERVING.md):

1. export a bundle from the converged demo checkpoint
   (Experiments/checkpoint/convergence_demo, 16 blocks, 3 s @ 8 kHz);
2. separate the synthetic tt split through the bundle AND through the
   in-framework bucketed eval — SI-SNRi must match;
3. time the deserialized program vs the directly-jitted forward with
   the scalar-drain pattern (block_until_ready does not sync on the
   tunneled TPU — docs/PERF.md methodology).

Usage: python scripts/probe_bundle_chip.py [ckpt] [data_tt_dir]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdanet_tpu.utils.misc import honor_jax_platforms_env

honor_jax_platforms_env()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def sisnr(est, ref):
    est = est - est.mean(-1, keepdims=True)
    ref = ref - ref.mean(-1, keepdims=True)
    proj = (est * ref).sum(-1, keepdims=True) * ref / \
        (ref * ref).sum(-1, keepdims=True)
    noise = est - proj
    return 10 * np.log10((proj * proj).sum(-1) / (noise * noise).sum(-1))


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else \
        "Experiments/checkpoint/convergence_demo/best_model.pth"
    tt = sys.argv[2] if len(sys.argv) > 2 else "/tmp/conv_data/tt"
    from tdanet_tpu import deploy
    from tdanet_tpu.models import BaseModel
    from tdanet_tpu.utils import read_wav
    from tdanet_tpu.utils.separator import separate_batched

    model, params = BaseModel.from_pretrain(ckpt)
    sr = model.sample_rate()
    mixes, refs = [], []
    with open(os.path.join(tt, "mix_clean.json")) as f:
        rows = json.load(f)
    for path, _n in rows:
        mixes.append(read_wav(path)[0])
        refs.append(np.stack([
            read_wav(path.replace("mix_clean", "s1"))[0],
            read_wav(path.replace("mix_clean", "s2"))[0]]))
    T = mixes[0].shape[-1]
    B = 8
    print(f"{len(mixes)} utterances of {T / sr:.1f}s @ {sr} Hz, batch {B}")

    bdir = tempfile.mkdtemp(prefix="bundle_")
    t0 = time.time()
    deploy.save_bundle(bdir, model, params, lengths=[T / sr],
                       batch_size=B, compute_dtype=jnp.bfloat16)
    print(f"export: {time.time() - t0:.1f}s -> {bdir}")
    dep = deploy.load_bundle(bdir)

    def pit_sisnri(ests):
        vals = []
        for est, ref, mix in zip(ests, refs, mixes):
            perms = [sisnr(est, ref).mean(),
                     sisnr(est[::-1], ref).mean()]
            base = sisnr(np.stack([mix, mix]), ref).mean()
            vals.append(max(perms) - base)
        return float(np.mean(vals))

    t0 = time.time()
    got = dep.separate_batched(mixes)
    t_bundle_first = time.time() - t0
    want = separate_batched(model, params, mixes, batch_size=B,
                            compute_dtype=jnp.bfloat16)
    si_b, si_d = pit_sisnri(got), pit_sisnri([np.asarray(w) for w in want])
    maxdiff = max(float(np.abs(g - np.asarray(w)).max())
                  for g, w in zip(got, want))
    print(f"SI-SNRi bundle {si_b:.2f} dB vs direct {si_d:.2f} dB; "
          f"max |diff| {maxdiff:.2e}; bundle first pass {t_bundle_first:.1f}s"
          f" (incl. compile)")

    # compute-only RTFx A/B: queue N dispatches, drain with one scalar
    target = dep.targets[0]
    xb = np.zeros((B, target), np.float32)
    for r, m in enumerate(mixes[:B]):
        xb[r, :m.shape[-1]] = m
    xj = jnp.asarray(xb)
    fn_bundle = dep._fn(target)
    fn_direct = jax.jit(jax.vmap(
        lambda p, w: model.apply(p, w[None],
                                 compute_dtype=jnp.bfloat16)[0],
        in_axes=(None, 0)))
    for name, fn, p in (("direct", fn_direct, params),
                        ("bundle", fn_bundle, dep.params)):
        out = fn(p, xj)
        float(jnp.sum(out[:, 0, :8]))  # warm + sync
        N = 20
        t0 = time.time()
        outs = [fn(p, xj) for _ in range(N)]
        drain = sum(float(jnp.sum(o[:, 0, :8])) for o in outs[-1:])
        dt = (time.time() - t0) / N
        rtfx = B * (target / sr) / dt
        print(f"{name}: {dt * 1e3:.1f} ms/dispatch = {rtfx:.0f}x realtime "
              f"(drain {drain:.3f})")


if __name__ == "__main__":
    main()
