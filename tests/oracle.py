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


def _install_stubs():
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
    models = types.ModuleType("look2hear.models")
    bm = types.ModuleType("look2hear.models.base_model")
    bm.BaseModel = BaseModel
    models.base_model = bm
    pkg.models = models
    sys.modules["look2hear"] = pkg
    sys.modules["look2hear.models"] = models
    sys.modules["look2hear.models.base_model"] = bm


_LOADED = {}


def load_reference_module(filename: str):
    """Import e.g. 'TDANet_best.py' from the reference tree, stubbed."""
    if filename in _LOADED:
        return _LOADED[filename]
    _install_stubs()
    name = "ref_" + filename.replace(".py", "").replace("-", "_")
    spec = importlib.util.spec_from_file_location(
        name, f"{REFERENCE_MODELS}/{filename}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    _LOADED[filename] = mod
    return mod


def torch_state_dict_to_numpy(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
