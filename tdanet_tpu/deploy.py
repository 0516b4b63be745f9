"""AOT deployment bundles: serialized StableHLO serving programs.

Beyond the reference — which deploys ``best_model.pth`` plus the full
model codebase and re-traces at import (audio_test.py:80-88) — a bundle
packs ``jax.export``-serialized forward programs (one per padded-length
bucket, multi-platform cpu+tpu lowering), the weights, and metadata:

    bundle/
      meta.json       model name/args, sample rate, lattice, buckets...
      params.npz      flat torch-named weights (fp32 numpy)
      programs/T<target>_B<batch>.shlo

A serving host loads and runs it with :func:`load_bundle` WITHOUT the
model code — no registry, no tracing, no Python model definitions; the
program is version-pinned StableHLO, so the artifact survives model-code
refactors and runs in minimal images. The exported program is the SAME
vmapped per-utterance forward the in-framework engines use (each row
sees batch=1 semantics — the reference checkpoints' batch-axis MHA quirk
makes plain batching leak across utterances, see utils/separator.py), so
bundle outputs are bit-identical to ``utils.separator.separate_batched``.

Weights are runtime ARGUMENTS of the exported program, not baked
constants: XLA's TPU conv path loses precision (~1e-2) on
closure-captured conv weights but is ~1e-6-accurate on argument weights
(measured, docs/PERF.md), and argument weights let one bundle be
re-weighted (``load_bundle(path, params_npz=...)``) without re-export.

Length routing is LATTICE-EXACT by default: an utterance runs in the
program whose padded length equals its own stride-lattice round-up, and
anything else raises. The model's GlobLN statistics run over the padded
tensor, so padding an utterance further than its lattice round-up
perturbs the output (weight- and pad-dependent; percent-scale on random
weights) — exact parity with the reference's batch=1 eval requires
exact targets. Export
the segment lengths the deployment actually serves (streaming hops, CSS
segments, and recipe eval are all fixed-length). ``coarse=True`` opts
into next-bucket-up routing as a documented approximation. Symbolic-
shape export (one program, any length) is blocked by design: the
adaptive-pool/interpolation stages lower to host-built one-hot matmul
matrices so they ride the MXU (docs/PERF.md round-2 interp rewrite) —
their shapes must be concrete at trace time.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from tdanet_tpu.utils.separator import depth_kw, trim_renorm

_FORMAT_VERSION = 1


def _flatten(params) -> Dict[str, np.ndarray]:
    """Nested param pytree -> flat 'a.b.c' dict. Unlike
    models.base.flat_torch_to_pytree this round-trips EVERY leaf (no
    derived-buffer skip list): the exported program's input tree must be
    reproduced exactly."""
    flat: Dict[str, np.ndarray] = {}

    def rec(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{prefix}.{k}" if prefix else k)
        else:
            flat[prefix] = np.asarray(node)
    rec(params, "")
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree


def export_forward(model, params, target_len: int, batch_size: int = 8,
                   compute_dtype=None, num_blocks=None,
                   platforms: Sequence[str] = ("cpu", "tpu")):
    """Export one serving program: (params, wav[batch, target_len]) ->
    (batch, n_src, target_len), vmapped per-utterance, lowered for every
    platform in ``platforms``. Returns a ``jax.export.Exported``."""
    kw = depth_kw(num_blocks)
    fwd = jax.jit(jax.vmap(
        lambda p, w: model.apply(p, w[None], compute_dtype=compute_dtype,
                                 **kw)[0],
        in_axes=(None, 0)))
    x_spec = jax.ShapeDtypeStruct((batch_size, target_len), jnp.float32)
    return jax_export.export(fwd, platforms=tuple(platforms))(params, x_spec)


def export_progressive(model, params, target_len: int, batch_size: int,
                       depth1: int, depth_full=None, compute_dtype=None,
                       platforms: Sequence[str] = ("cpu", "tpu")):
    """Export the progressive (adaptive-depth) stage pair for one padded
    length: stage 1 ``(params, wav[batch, T]) -> (est, state-tree)`` at
    ``depth1`` and stage 2 ``(params, state) -> est`` continuing to
    ``depth_full`` — the same compiled programs
    ``tdanet_tpu.progressive`` builds, as serializable StableHLO. The
    stage-2 input spec is derived from stage 1's output avals, so the
    pair always agrees on the state tree."""
    from tdanet_tpu.progressive import _compiled_stages
    if not hasattr(model, "apply_stage1"):
        raise TypeError(
            f"progressive export needs a model with the staged apply "
            f"surface (apply_stage1/apply_stage2/pad_rest); "
            f"{type(model).__name__} has none")
    depth_full = depth_full if depth_full is not None else model.num_blocks
    if depth_full > model.num_blocks:
        # same loud failure as progressive.separate_progressive: a
        # bundle must not silently ship a stage-2 program that
        # extrapolates the shared-weight recurrence past the trained
        # iteration count (components.py n_iter bound)
        raise ValueError(
            f"depth_full ({depth_full}) exceeds the trained depth "
            f"({model.num_blocks})")
    if depth_full <= depth1:
        raise ValueError(f"depth_full ({depth_full}) must exceed "
                         f"depth1 ({depth1})")
    rest = model.pad_rest(target_len)
    stage1, stage2 = _compiled_stages(model, depth1, depth_full - depth1,
                                      rest, compute_dtype)
    x_spec = jax.ShapeDtypeStruct((batch_size, target_len), jnp.float32)
    e1 = jax_export.export(stage1, platforms=tuple(platforms))(params,
                                                               x_spec)
    st_spec = jax.eval_shape(stage1, params, x_spec)[1]
    e2 = jax_export.export(stage2, platforms=tuple(platforms))(params,
                                                               st_spec)
    return e1, e2


def save_bundle(path: str, model, params, lengths: Sequence[float] = (),
                batch_size: int = 8, compute_dtype=None, num_blocks=None,
                platforms: Sequence[str] = ("cpu", "tpu"),
                streaming: dict | None = None,
                early_exit: Sequence[int] = (),
                progressive: dict | None = None):
    """Export a deployment bundle to directory ``path``.

    ``lengths``: utterance lengths in SECONDS; each is padded up to the
    model's stride lattice and becomes one exported program (duplicates
    collapse). At serve time an utterance routes to the smallest bucket
    that fits.

    ``streaming``: optionally also export a live-streaming program —
    ``dict(segment=sec, max_streams=N, overlap=0.25,
    emit_dtype="float32")``. The program is exported at EXACTLY
    ``segment * sr`` samples with ``max_streams`` rows (no lattice
    round-up: the streaming engines feed exact segment windows and the
    model pads internally), so :func:`load_streaming` reproduces
    ``serving.MultiStreamSeparator`` bit-for-bit. overlap/emit_dtype are
    recorded as serve-time defaults.

    ``early_exit``: additional DEPTHS to export each length bucket at
    (the latency/quality knob measured in docs/PERF.md: depth 12 =
    −0.26 dB for +30% throughput on the flagship) — one extra program
    per (depth, bucket), file ``E<depth>_T<target>_B<batch>.shlo``;
    ``load_bundle(path, num_blocks=d)`` serves it.

    ``progressive``: export the adaptive-depth stage pair per bucket —
    ``dict(depth1=8, depth_full=None, threshold=0.05)`` — files
    ``P<target>_B<batch>_s1.shlo`` / ``_s2.shlo``; serve with
    :func:`load_progressive`, which runs the SAME host orchestration as
    ``tdanet_tpu.progressive`` (outputs bit-identical, no model code).
    """
    sr = model.sample_rate()
    lattice = getattr(model, "lcm", 1)
    targets = sorted({-(-int(round(s * sr)) // lattice) * lattice
                      for s in lengths})
    if not targets and streaming is None:
        raise ValueError("save_bundle needs lengths and/or streaming")
    os.makedirs(os.path.join(path, "programs"), exist_ok=True)

    flat = _flatten(params)
    np.savez(os.path.join(path, "params.npz"),
             **{k: np.asarray(v) for k, v in flat.items()})

    full_depth = getattr(model, "num_blocks", None)
    for d in early_exit:
        if full_depth is not None and not 0 < d < full_depth:
            raise ValueError(f"early_exit depth {d} must lie in "
                             f"(0, {full_depth}) for this model")
    if early_exit and not targets:
        # programs are per (depth, length bucket): with no buckets,
        # meta would advertise depths that have zero programs and every
        # load_bundle(num_blocks=d).separate() would fail with a
        # misleading lattice-routing error
        raise ValueError("early_exit export needs lengths")
    if progressive is not None and not targets:
        raise ValueError("progressive export needs lengths")

    for target in targets:
        exp = export_forward(model, params, target, batch_size,
                             compute_dtype=compute_dtype,
                             num_blocks=num_blocks, platforms=platforms)
        fname = os.path.join(path, "programs", f"T{target}_B{batch_size}.shlo")
        with open(fname, "wb") as f:
            f.write(bytes(exp.serialize()))
        for d in early_exit:
            exp_d = export_forward(model, params, target, batch_size,
                                   compute_dtype=compute_dtype,
                                   num_blocks=d, platforms=platforms)
            fname = os.path.join(path, "programs",
                                 f"E{d}_T{target}_B{batch_size}.shlo")
            with open(fname, "wb") as f:
                f.write(bytes(exp_d.serialize()))
        if progressive is not None:
            e1, e2 = export_progressive(
                model, params, target, batch_size,
                depth1=int(progressive["depth1"]),
                depth_full=progressive.get("depth_full"),
                compute_dtype=compute_dtype, platforms=platforms)
            for tag, exp_p in (("s1", e1), ("s2", e2)):
                fname = os.path.join(
                    path, "programs",
                    f"P{target}_B{batch_size}_{tag}.shlo")
                with open(fname, "wb") as f:
                    f.write(bytes(exp_p.serialize()))

    meta = {
        "format_version": _FORMAT_VERSION,
        "model_name": type(model).__name__,
        "model_args": model.get_model_args(),
        "sample_rate": sr,
        "lattice": lattice,
        "batch_size": batch_size,
        "targets": targets,
        "compute_dtype": (None if compute_dtype is None
                          else jnp.dtype(compute_dtype).name),
        "num_blocks": num_blocks,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
    }
    if early_exit:
        meta["early_exit"] = sorted(int(d) for d in early_exit)
    if progressive is not None:
        depth_full = progressive.get("depth_full") or full_depth
        meta["progressive"] = {
            "depth1": int(progressive["depth1"]),
            "depth_full": int(depth_full),
            "threshold": float(progressive.get("threshold", 0.05)),
        }
    if streaming is not None:
        seg_len = int(round(float(streaming["segment"]) * sr))
        n_streams = int(streaming.get("max_streams", 4))
        exp = export_forward(model, params, seg_len, n_streams,
                             compute_dtype=compute_dtype,
                             num_blocks=num_blocks, platforms=platforms)
        fname = os.path.join(path, "programs",
                             f"S{seg_len}_B{n_streams}.shlo")
        with open(fname, "wb") as f:
            f.write(bytes(exp.serialize()))
        meta["streaming"] = {
            "segment": float(streaming["segment"]),
            "seg_len": seg_len,
            "max_streams": n_streams,
            "overlap": float(streaming.get("overlap", 0.25)),
            "emit_dtype": streaming.get("emit_dtype", "float32"),
            "n_src": int(exp.out_avals[0].shape[1]),
        }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


class DeployedSeparator:
    """Runs a deployment bundle. Holds NO model code — only deserialized
    StableHLO programs + the weight pytree; mirrors the
    ``utils.separator.separate_batched`` trim/renorm semantics
    (reference: utils/separator.py:63, batch=1 eval audio_test.py:111-134).
    """

    def __init__(self, meta: Dict[str, Any], params,
                 programs: Dict[int, "jax_export.Exported"],
                 coarse: bool = False):
        self.meta = meta
        self.params = params
        self._programs = programs
        self._fn_cache: Dict[int, Any] = {}
        self.sample_rate = meta["sample_rate"]
        self.batch_size = meta["batch_size"]
        self.lattice = meta["lattice"]
        self.coarse = coarse
        self.targets = sorted(programs)

    def _fn(self, target: int):
        # Exported.call re-traces per invocation; jit it once per bucket
        # so steady-state serving pays only compiled-dispatch cost.
        if target not in self._fn_cache:
            self._fn_cache[target] = jax.jit(self._programs[target].call)
        return self._fn_cache[target]

    def _bucket(self, T: int) -> int:
        exact = -(-T // self.lattice) * self.lattice
        if exact in self._programs:
            return exact
        if self.coarse:
            for target in self.targets:
                if target >= T:
                    return target
            raise ValueError(
                f"utterance of {T} samples exceeds every exported bucket "
                f"{self.targets}; re-export the bundle with a longer length")
        raise ValueError(
            f"utterance of {T} samples needs the lattice-exact program "
            f"T={exact} but the bundle exports {self.targets}; re-export "
            "with this length, or load_bundle(..., coarse=True) to accept "
            "next-bucket-up padding (approximate: the extra pad shifts "
            "the GlobLN statistics)")

    def separate(self, wav: np.ndarray) -> np.ndarray:
        """(T,) -> (n_src, T), trimmed + energy-renormalized."""
        return self.separate_batched([np.asarray(wav)])[0]

    def separate_batched(self, wavs) -> list:
        """Variable-length utterances -> per-utterance (n_src, T_i)
        estimates (input order), bucketed over the exported programs."""
        buckets: Dict[int, list] = {}
        for i, w in enumerate(wavs):
            buckets.setdefault(self._bucket(int(np.asarray(w).shape[-1])),
                               []).append(i)
        outputs = [None] * len(wavs)
        B = self.batch_size
        for target, idxs in sorted(buckets.items()):
            fn = self._fn(target)
            for s in range(0, len(idxs), B):
                chunk = idxs[s:s + B]
                batch = np.zeros((B, target), np.float32)
                for row, i in enumerate(chunk):
                    w = np.asarray(wavs[i], np.float32)
                    batch[row, :w.shape[-1]] = w
                est = np.asarray(fn(self.params, jnp.asarray(batch)))
                for row, i in enumerate(chunk):
                    mix = np.asarray(wavs[i], np.float32)
                    outputs[i] = trim_renorm(mix, est[row])
        return outputs


def _load_meta_params(path: str, params_npz: str | None):
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("format_version", 0) > _FORMAT_VERSION:
        raise ValueError(
            f"bundle format {meta['format_version']} is newer than this "
            f"loader ({_FORMAT_VERSION})")
    with np.load(params_npz or os.path.join(path, "params.npz")) as z:
        params = _unflatten({k: z[k] for k in z.files})
    return meta, params


def _load_programs(path: str, prefix: str, suffix: str = ""):
    """``{target: Exported}`` for program files named
    ``<prefix><target>_B<batch><suffix>.shlo``."""
    programs = {}
    pdir = os.path.join(path, "programs")
    for fname in sorted(os.listdir(pdir)):
        if not (fname.endswith(suffix + ".shlo")
                and fname.startswith(prefix)):
            continue
        stem = fname[len(prefix):]
        target = int(stem.split("_")[0])
        with open(os.path.join(pdir, fname), "rb") as f:
            programs[target] = jax_export.deserialize(bytearray(f.read()))
    return programs


def load_bundle(path: str, params_npz: str | None = None,
                coarse: bool = False,
                num_blocks: int | None = None) -> DeployedSeparator:
    """Load a bundle saved by :func:`save_bundle`. ``params_npz``
    optionally swaps in different weights (same tree) without re-export
    — e.g. a newer checkpoint of the same architecture. ``coarse``
    allows routing an utterance to the next-larger bucket when its
    lattice-exact program wasn't exported (approximate — see module
    docstring). ``num_blocks`` selects an early-exit operating point
    exported via ``save_bundle(..., early_exit=[...])`` instead of the
    full-depth programs."""
    meta, params = _load_meta_params(path, params_npz)
    if num_blocks is None:
        # T*.shlo = full-depth bucket programs; S*/E*/P*.shlo are the
        # streaming / early-exit / progressive programs
        programs = _load_programs(path, "T")
        if not programs:
            raise ValueError(
                f"no batched programs/T*.shlo found under {path}"
                " (a streaming-only bundle serves via load_streaming)")
    else:
        if num_blocks not in meta.get("early_exit", []):
            raise ValueError(
                f"bundle at {path} exports early-exit depths "
                f"{meta.get('early_exit', [])}, not {num_blocks}; "
                "re-export with save_bundle(..., early_exit=[...])")
        programs = _load_programs(path, f"E{num_blocks}_T")
        if not programs:
            # save_bundle now rejects early_exit without lengths, but a
            # bundle written before that guard could advertise depths
            # with zero programs — fail here, not at separate() time
            raise ValueError(
                f"no early-exit programs/E{num_blocks}_T*.shlo found "
                f"under {path}")
    return DeployedSeparator(meta, params, programs, coarse=coarse)


class DeployedProgressiveSeparator:
    """Serves the adaptive-depth path from a bundle — stage-1 sweep at
    depth1, threshold census, exact stage-2 continuation of flagged
    utterances — through ``tdanet_tpu.progressive.progressive_loop``,
    the SAME host orchestration the in-framework engine uses, with the
    bundle's deserialized stage programs. No model code; outputs
    bit-identical to ``separate_progressive`` (tests/test_deploy.py)."""

    def __init__(self, meta: Dict[str, Any], params,
                 stages: Dict[int, tuple], coarse: bool = False):
        self.meta = meta
        self.params = params
        self.sample_rate = meta["sample_rate"]
        self.batch_size = meta["batch_size"]
        self.lattice = meta["lattice"]
        self.coarse = coarse
        self.depth1 = meta["progressive"]["depth1"]
        self.depth_full = meta["progressive"]["depth_full"]
        self.threshold = meta["progressive"]["threshold"]
        self.targets = sorted(stages)
        # (est, state) avals: est is (B, n_src, T)
        self.n_src = int(stages[self.targets[0]][0].out_avals[0].shape[1])
        self._stages = stages
        self._fn_cache: Dict[int, tuple] = {}
        # reuse DeployedSeparator's lattice-exact/coarse length routing
        self._router = DeployedSeparator(meta, None,
                                         dict.fromkeys(stages),
                                         coarse=coarse)

    def _fns(self, target: int):
        if target not in self._fn_cache:
            e1, e2 = self._stages[target]
            self._fn_cache[target] = (jax.jit(e1.call), jax.jit(e2.call))
        return self._fn_cache[target]

    def separate(self, wav: np.ndarray, threshold=None):
        return self.separate_batched([np.asarray(wav)],
                                     threshold=threshold)[0]

    def separate_batched(self, wavs, threshold=None, stats=None) -> list:
        """Variable-length utterances -> per-utterance (n_src, T_i)
        estimates, adaptive depth per utterance. ``stats`` (optional
        dict) accumulates the escalation census across buckets."""
        from tdanet_tpu.progressive import progressive_loop
        threshold = self.threshold if threshold is None else threshold
        buckets: Dict[int, list] = {}
        for i, w in enumerate(wavs):
            buckets.setdefault(
                self._router._bucket(int(np.asarray(w).shape[-1])),
                []).append(i)
        outputs = [None] * len(wavs)
        if stats is not None:
            stats.setdefault("n", 0)
            stats.setdefault("n_escalated", 0)
        for target, idxs in sorted(buckets.items()):
            fn1, fn2 = self._fns(target)
            mixes = np.zeros((len(idxs), target), np.float32)
            for row, i in enumerate(idxs):
                w = np.asarray(wavs[i], np.float32)
                mixes[row, :w.shape[-1]] = w
            ests, info = progressive_loop(
                fn1, fn2, self.params, mixes, self.n_src,
                threshold, self.batch_size,
                depth1=self.depth1, depth_full=self.depth_full)
            if stats is not None:
                stats["n"] += len(idxs)
                stats["n_escalated"] += info["n_escalated"]
            for row, i in enumerate(idxs):
                mix = np.asarray(wavs[i], np.float32)
                outputs[i] = trim_renorm(mix, ests[row])
        return outputs


def load_progressive(path: str, params_npz: str | None = None,
                     coarse: bool = False) -> DeployedProgressiveSeparator:
    """Build the adaptive-depth separator from a bundle exported with
    ``progressive=dict(depth1=...)``."""
    meta, params = _load_meta_params(path, params_npz)
    if "progressive" not in meta:
        raise ValueError(
            f"bundle at {path} has no progressive programs; re-export "
            "with save_bundle(..., progressive=dict(depth1=...))")
    s1 = _load_programs(path, "P", suffix="_s1")
    s2 = _load_programs(path, "P", suffix="_s2")
    if sorted(s1) != sorted(s2) or not s1:
        raise ValueError(f"incomplete progressive stage pairs under "
                         f"{path}: s1={sorted(s1)} s2={sorted(s2)}")
    stages = {t: (s1[t], s2[t]) for t in s1}
    return DeployedProgressiveSeparator(meta, params, stages,
                                        coarse=coarse)


def load_streaming(path: str, params_npz: str | None = None,
                   overlap: float | None = None,
                   emit_dtype: str | None = None, dw_fold=None):
    """Build a live-streaming engine from a bundle exported with
    ``streaming=...`` — a ``serving.MultiStreamSeparator`` whose forward
    is the bundle's deserialized program: same stitching semantics, no
    model code. ``overlap``/``emit_dtype`` default to the values
    recorded at export. ``dw_fold`` is ignored (the program is already
    lowered); accepted so call sites can be swapped 1:1."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    sm = meta.get("streaming")
    if sm is None:
        raise ValueError(
            f"bundle at {path} has no streaming program; re-export with "
            "save_bundle(..., streaming=dict(segment=..., max_streams=...))")
    with np.load(params_npz or os.path.join(path, "params.npz")) as z:
        params = _unflatten({k: z[k] for k in z.files})
    fname = os.path.join(path, "programs",
                         f"S{sm['seg_len']}_B{sm['max_streams']}.shlo")
    with open(fname, "rb") as f:
        exp = jax_export.deserialize(bytearray(f.read()))
    from tdanet_tpu.serving import MultiStreamSeparator
    return MultiStreamSeparator(
        model=None, params=params,
        max_streams=sm["max_streams"], segment=sm["segment"],
        overlap=overlap if overlap is not None else sm["overlap"],
        sample_rate=meta["sample_rate"],
        emit_dtype=emit_dtype if emit_dtype is not None
        else sm["emit_dtype"],
        forward_fn=exp.call, n_src=sm["n_src"])
