"""Load reference PyTorch model files standalone as numeric oracles.

The reference package (/root/reference/look2hear) has heavy transitive
imports (lightning, timm, hub downloads), so we load individual model files
with a stubbed ``look2hear.models.base_model`` and use them (read-only) as
golden-output generators for fidelity tests. No reference code is copied.
"""
import importlib.util
import sys
import types

REFERENCE_MODELS = "/root/reference/look2hear/models"


def _install_timm_stub():
    """timm isn't in the image; the reference only uses DropPath,
    to_2tuple, trunc_normal_ from timm.models.layers."""
    if "timm" in sys.modules:
        return
    import itertools

    import torch
    import torch.nn as nn

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob in (None, 0.0) or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            rand = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x / keep * rand.floor_()

    def to_2tuple(x):
        if isinstance(x, (list, tuple)):
            return tuple(x)
        return tuple(itertools.repeat(x, 2))

    def trunc_normal_(tensor, mean=0., std=1., a=-2., b=2.):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    def named_apply(fn, module, name="", depth_first=True,
                    include_root=False):
        if not depth_first and include_root:
            fn(module=module, name=name)
        for child_name, child in module.named_children():
            child_full = f"{name}.{child_name}" if name else child_name
            named_apply(fn, child, child_full, depth_first, True)
        if depth_first and include_root:
            fn(module=module, name=name)
        return module

    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = trunc_normal_
    timm_layers.trunc_normal_tf_ = trunc_normal_
    timm_helpers = types.ModuleType("timm.models.helpers")
    timm_helpers.named_apply = named_apply
    sys.modules["timm.models.helpers"] = timm_helpers
    timm_registry = types.ModuleType("timm.models.registry")
    timm_registry.register_model = lambda fn=None, **kw: (
        fn if fn is not None else (lambda f: f))
    timm_data = types.ModuleType("timm.data")
    timm_data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    timm_data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    timm_models.layers = timm_layers
    timm_models.registry = timm_registry
    timm_models.helpers = sys.modules["timm.models.helpers"]
    timm.models = timm_models
    timm.data = timm_data
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers
    sys.modules["timm.models.registry"] = timm_registry
    sys.modules["timm.data"] = timm_data


def _install_stubs():
    _install_timm_stub()
    if "look2hear" in sys.modules:
        return
    import torch.nn as nn

    class BaseModel(nn.Module):
        def __init__(self, sample_rate, in_chan=1):
            super().__init__()
            self._sample_rate = sample_rate
            self._in_chan = in_chan

        def get_model_args(self):
            return {}

    pkg = types.ModuleType("look2hear")
    pkg.__path__ = ["/root/reference/look2hear"]
    models = types.ModuleType("look2hear.models")
    models.__path__ = [REFERENCE_MODELS]
    bm = types.ModuleType("look2hear.models.base_model")
    bm.BaseModel = BaseModel
    models.base_model = bm
    pkg.models = models
    sys.modules["look2hear"] = pkg
    sys.modules["look2hear.models"] = models
    sys.modules["look2hear.models.base_model"] = bm


_LOADED = {}


def load_reference_module(filename: str):
    """Import e.g. 'TDANet_best.py' from the reference tree, stubbed.

    Reference submodules imported as look2hear.models.<name> are loaded
    on demand and registered so intra-package imports resolve.
    """
    if filename in _LOADED:
        return _LOADED[filename]
    _install_stubs()
    # register as a real submodule of the stubbed package so relative
    # imports (TDANetOld.py:5) resolve
    stem = filename.replace(".py", "").replace("-", "_")
    name = f"look2hear.models.{stem}"
    spec = importlib.util.spec_from_file_location(
        name, f"{REFERENCE_MODELS}/{filename}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    try:
        spec.loader.exec_module(mod)
    except ModuleNotFoundError as e:
        missing = e.name
        prefix = "look2hear.models."
        if missing and missing.startswith(prefix):
            sub = missing[len(prefix):]
            submod = load_reference_module(f"{sub}.py")
            sys.modules[missing] = submod
            setattr(sys.modules["look2hear.models"], sub, submod)
            spec.loader.exec_module(mod)
        else:
            raise
    _LOADED[filename] = mod
    return mod


def torch_state_dict_to_numpy(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
