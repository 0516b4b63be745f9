"""Device-mesh + sharding layout for data/tensor parallel training.

The reference's only parallelism is Lightning DDP over NCCL/gloo
(SURVEY.md §2.8; audio_train.py:30,185-195). The TPU-native replacement is
a ``jax.sharding.Mesh`` with named axes:

- ``dp``: batch (data) parallelism — gradients are reduced by XLA psum
  over ICI, replacing DDP all-reduce;
- ``tp``: tensor parallelism over the separator's 512-wide channel
  dimension (proj/FFN/MHA weights), useful for latency-bound serving.

Shardings are GSPMD annotations: correctness is preserved for any layout,
XLA inserts the collectives (scaling-book recipe: pick mesh, annotate,
let XLA do the rest). A third axis family, sequence parallelism over
TIME, lives in ``parallel.sequence`` (long-form inference).

Pipeline and expert parallelism are deliberately ABSENT: the flagship
is a 2.3M-parameter model whose weights replicate onto any chip for
free, so pipelining its 16 SHARED-WEIGHT iterations across stages
would add bubble latency and inter-stage transfers while saving
nothing (there is no per-stage weight memory to distribute), and there
are no mixture-of-experts layers anywhere in the reference family to
shard expert-wise. dp scales throughput, tp bounds per-chip latency,
sp bounds per-chip memory for long inputs — that covers this model
family's scaling space.
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host orchestration (the reference's torch.distributed/
    Lightning-DDP process setup, SURVEY.md §2.8): a thin wrapper over
    jax.distributed.initialize. Safe no-op on a single host."""
    if num_processes in (None, 1):
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


# Param-path regex -> PartitionSpec for the TDANet family. Paths are
# torch-style dotted names. The 512-channel separator weights shard over
# 'tp'; everything else is replicated.
TDANET_TP_RULES = [
    # UConvBlock projection 128 -> 512: shard output channels
    (r"sm\.unet\.proj_1x1\.conv\.weight$", P("tp", None, None)),
    (r"sm\.unet\.proj_1x1\.conv\.bias$", P("tp")),
    (r"sm\.unet\.proj_1x1\.norm\.(gamma|beta|weight|bias)$", P("tp")),
    # depthwise pyramid: purely channel-parallel
    (r"sm\.unet\.spp_dw\.\d+\.conv\.weight$", P("tp", None, None)),
    (r"sm\.unet\.spp_dw\.\d+\.conv\.bias$", P("tp")),
    (r"sm\.unet\.spp_dw\.\d+\.norm\.(gamma|beta|weight|bias)$", P("tp")),
    # LA fusions: depthwise over 512 channels
    (r"sm\.unet\.(loc_glo_fus|last_layer)\.\d+\..*conv\.weight$",
     P("tp", None, None)),
    (r"sm\.unet\.(loc_glo_fus|last_layer)\.\d+\..*norm\.(gamma|beta)$",
     P("tp")),
    # FFN: megatron-style — fc1 row-parallel, fc2 column-parallel
    (r"sm\.unet\.globalatt\.mlp\.fc1\.conv\.weight$", P("tp", None, None)),
    (r"sm\.unet\.globalatt\.mlp\.fc1\.norm\.(gamma|beta)$", P("tp")),
    (r"sm\.unet\.globalatt\.mlp\.dwconv\.weight$", P("tp", None, None)),
    (r"sm\.unet\.globalatt\.mlp\.dwconv\.bias$", P("tp")),
    (r"sm\.unet\.globalatt\.mlp\.fc2\.conv\.weight$", P(None, "tp", None)),
    # MHA: shard the head/embed dim of the projections
    (r"sm\.unet\.globalatt\.attn\.attn\.in_proj_weight$", P(None, "tp")),
    (r"sm\.unet\.globalatt\.attn\.attn\.out_proj\.weight$", P("tp", None)),
    (r"sm\.unet\.res_conv\.weight$", P(None, "tp", None)),
]


def _spec_for_path(path: str, rules) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path):
            return spec
    return P()  # replicated


def param_shardings(params, mesh: Mesh, rules=None, verbose=True):
    """Pytree of NamedShardings matching ``params``' structure.

    A rule whose sharded axis does not divide the mesh axis is DROPPED
    (the weight is replicated instead) — correct but weaker than asked;
    every such drop is reported via warnings so a tp=4 request cannot
    silently degrade to tp=1 behavior.
    """
    rules = TDANET_TP_RULES if rules is None else rules
    dropped = []

    def rec(node, prefix):
        if isinstance(node, dict):
            return {k: rec(v, f"{prefix}.{k}" if prefix else k)
                    for k, v in node.items()}
        spec = _spec_for_path(prefix, rules)
        # drop sharded axes that don't divide evenly -> replicate instead
        specs = list(spec)
        for i, s in enumerate(specs):
            if s is not None:
                axis_size = mesh.shape[s]
                if i >= node.ndim or node.shape[i] % axis_size != 0:
                    dropped.append((prefix, tuple(node.shape), str(spec)))
                    specs = [None] * max(node.ndim, 1)
                    break
        return NamedSharding(mesh, P(*specs))

    out = rec(params, "")
    if dropped and verbose:
        import warnings
        head = ", ".join(f"{p} {sh}" for p, sh, _ in dropped[:5])
        warnings.warn(
            f"param_shardings: {len(dropped)} matched sharding rule(s) "
            f"dropped to replication (axis does not divide the mesh): "
            f"{head}{' ...' if len(dropped) > 5 else ''}")
    return out


def batch_sharding(mesh: Mesh):
    """Leading batch axis over dp, everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def dp_batch_setup(mesh: Mesh, batch_size: int, params, what="batch_size"):
    """Shared setup for dp-sharded batch serving/eval: validate that the
    static batch divides the mesh's dp axis, place the params replicated
    on the mesh. Returns ``(x_sharding, placed_params)``. One helper so
    AsyncBatchServer / separate_batched / separate_batched_stream cannot
    drift on the sharding contract."""
    dp = mesh.shape["dp"]
    if batch_size % dp:
        raise ValueError(
            f"{what} ({batch_size}) must be a multiple of the mesh dp "
            f"axis ({dp}) for sharded serving")
    return batch_sharding(mesh), jax.device_put(params, replicated(mesh))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh, rules=None):
    shardings = param_shardings(params, mesh, rules)
    return jax.device_put(params, shardings), shardings
