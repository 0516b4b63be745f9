"""Model base class, registry, and PyTorch-checkpoint interchange.

Re-creates the public surface of the reference's BaseModel + registry
(/root/reference/look2hear/models/base_model.py:110-181,
 /root/reference/look2hear/models/__init__.py:82-114) in a functional-JAX
style: a model object holds only static config; parameters live in an
explicit pytree whose nesting mirrors the torch ``state_dict`` naming, so
released ``best_model.pth`` / ``pytorch_model.bin`` checkpoints
({model_name, state_dict, model_args, infos}) load losslessly.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

_MODEL_REGISTRY: Dict[str, type] = {}


def register_model(cls=None, *, name: str | None = None):
    """Register a model class under its (case-insensitive) name —
    capability parity with look2hear.models.register_model."""
    def wrap(c):
        _MODEL_REGISTRY[(name or c.__name__).lower()] = c
        return c
    return wrap(cls) if cls is not None else wrap


def get(identifier):
    """Resolve a model class from a string name (base_model.py:99-114)."""
    if isinstance(identifier, type):
        return identifier
    if isinstance(identifier, str):
        cls = _MODEL_REGISTRY.get(identifier.lower())
        if cls is None:
            raise ValueError(
                f"Could not resolve model name {identifier!r}. Registered: "
                f"{sorted(_MODEL_REGISTRY)}")
        return cls
    raise ValueError(f"Invalid model identifier {identifier!r}")


def available_models():
    return sorted(_MODEL_REGISTRY)


def warn_unused_kwargs(cls_name: str, unused: Dict[str, Any]):
    """Model ctors accept **unused for checkpoint/config compatibility,
    but a silently swallowed kwarg is how a typo'd config key (e.g.
    num_spks instead of num_sources) trains the wrong model — the
    reference's torch modules would raise TypeError. Warn loudly.

    ``n_src`` is exempt: every reference model serializes
    ``model_args = {"n_src": 2}`` (TDANet_best.py:524) and its ctors
    don't take it either — from_pretrain on a reference checkpoint
    legitimately routes it here."""
    unused = {k: v for k, v in unused.items() if k != "n_src"}
    if unused:
        import warnings
        warnings.warn(
            f"{cls_name} ignoring unknown kwargs {sorted(unused)} — "
            "check the audionet_config key names", stacklevel=3)


# ---------------------------------------------------------------------------
# torch state-dict <-> pytree bridge
# ---------------------------------------------------------------------------

# deterministic buffers regenerated on our side rather than loaded
_SKIP_SUFFIXES = (".pe", "relative_position_index", "attn_mask")


def flat_torch_to_pytree(state: Dict[str, np.ndarray],
                         skip=_SKIP_SUFFIXES) -> Dict[str, Any]:
    """'a.b.c' flat keys -> nested dict pytree (torch tensor layouts kept).

    ``skip`` drops deterministic buffers we regenerate; the fp64
    exactness suite narrows it to keep the oracle's `.pe` table (numpy
    and torch f32 transcendentals differ by ~1e-5)."""
    tree: Dict[str, Any] = {}
    for key, val in state.items():
        if skip and key.endswith(tuple(skip)):
            continue
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.asarray(val))
    return tree


def pytree_to_flat_torch(params) -> Dict[str, np.ndarray]:
    flat = {}

    def rec(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{prefix}.{k}" if prefix else k)
        else:
            flat[prefix] = np.asarray(node)
    rec(params, "")
    return flat


def strip_prefix(state: Dict[str, Any], prefix="audio_model."):
    """The Lightning checkpoints prefix model weights with 'audio_model.'
    (base_model.py:146)."""
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v
        for k, v in state.items()
    }


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Read a reference-format .pth/.bin: {model_name, state_dict,
    model_args, infos} or a raw Lightning ckpt with 'state_dict'."""
    import torch  # lazy: only needed for interchange

    conf = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" not in conf:
        # raw state dict
        conf = {"model_name": None, "state_dict": conf, "model_args": {}}
    conf["state_dict"] = {
        k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        for k, v in strip_prefix(dict(conf["state_dict"])).items()
    }
    return conf


class BaseModel:
    """Functional model: static config on the object, params as a pytree.

    Subclasses implement ``init(key) -> params`` and
    ``apply(params, wav, training=False, rng=None) -> estimates``.
    """

    def __init__(self, sample_rate, in_chan=1):
        self._sample_rate = sample_rate
        self._in_chan = in_chan

    def sample_rate(self):
        return self._sample_rate

    def init(self, key):
        raise NotImplementedError

    def apply(self, params, wav, *, training=False, rng=None,
              compute_dtype=jnp.float32):
        raise NotImplementedError

    def __call__(self, params, wav, **kw):
        return self.apply(params, wav, **kw)

    def get_model_args(self) -> Dict[str, Any]:
        raise NotImplementedError

    # -- interchange -------------------------------------------------------

    def load_torch_state(self, state: Dict[str, np.ndarray]):
        """Map a torch state_dict (numpy values) into this model's pytree.
        Default: structural mapping (names match torch module paths)."""
        return flat_torch_to_pytree(state)

    def serialize(self, params) -> Dict[str, Any]:
        """Portable export matching the reference schema
        (base_model.py:159-173)."""
        import tdanet_tpu
        return {
            "model_name": type(self).__name__,
            "state_dict": pytree_to_flat_torch(params),
            "model_args": self.get_model_args(),
            "infos": {"software_versions": {
                "tdanet_tpu_version": tdanet_tpu.__version__,
                "jax_version": jax.__version__,
            }},
        }

    @staticmethod
    def from_pretrain(model_name_or_path, pretrained_model_conf_or_path=None,
                      **kwargs):
        """Build (model, params) from a reference-format checkpoint.

        Mirrors base_model.py:134-156: if given a local path, load it and
        instantiate ``model_name_or_path`` (or the embedded model_name) with
        ``kwargs``; HF-hub ids resolve through huggingface_hub when network
        access exists.
        """
        path = pretrained_model_conf_or_path or model_name_or_path
        if not os.path.exists(path):
            path = _hub_download(path)
        conf = load_torch_checkpoint(path)
        name = (model_name_or_path
                if isinstance(model_name_or_path, str)
                and model_name_or_path.lower() in _MODEL_REGISTRY
                else conf.get("model_name"))
        cls = get(name)
        model = cls(**{**conf.get("model_args", {}), **kwargs})
        params = model.load_torch_state(conf["state_dict"])
        return model, params


def model_list(name_only=False):
    """Public models with the 'asteroid' tag on the HF hub
    (base_model.py:73-84). Network-gated: raises a clear error in
    zero-egress environments."""
    import requests  # lazy
    r = requests.get("https://huggingface.co/api/models?full=true"
                     "&filter=asteroid", timeout=30)
    r.raise_for_status()
    all_models = r.json()
    if name_only:
        return [x["modelId"] for x in all_models]
    return all_models


def _hub_download(model_id: str) -> str:
    """HF-hub fetch (base_model.py:21-57). Gated: raises a clear error in
    zero-egress environments."""
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "huggingface_hub is unavailable; pass a local checkpoint path"
        ) from e
    cache = os.path.expanduser("~/.cache/tdanet_tpu")
    os.makedirs(cache, exist_ok=True)
    if "@" in model_id:
        model_id, revision = model_id.split("@", 1)
    else:
        revision = None
    return hf_hub_download(repo_id=model_id, filename="pytorch_model.bin",
                           cache_dir=cache, revision=revision)
