"""Registry-wide smoke: every registered model constructs from its name
with a small config, initializes, and produces a correctly-shaped
forward (the plumbing path the YAML configs use)."""
import numpy as np
import pytest

import jax

from tdanet_tpu import models as zoo

SR = 8000
T = 2000
FEAT_LEN = 258  # frames at scale 0 for T=2000, 4ms @ 8kHz

BASE = dict(out_channels=64, in_channels=128, num_blocks=1,
            upsampling_depth=5, enc_kernel_size=4, num_sources=2,
            sample_rate=SR, feat_len=FEAT_LEN)

SPECIAL = {
    "tdanetchunk": dict(out_channels=64, in_channels=128, num_blocks=1,
                        upsampling_depth=4, n_chunk=20, num_sources=2,
                        sample_rate=SR),
    "tdanetemcadv1_4": dict(BASE, in_channels=256),
    "tdanetmultres": dict(BASE, kernels=4),
    # depth-4-compatible models (no EMCAD constraint)
    "tdanetbest": dict(BASE, upsampling_depth=4),
    "tdanetyang": dict(BASE, upsampling_depth=4),
    "tdanetorigin": dict(BASE, upsampling_depth=4),
    "tdanetold": dict(BASE, upsampling_depth=4),
    "tdanet": dict(BASE, upsampling_depth=4),
    "tdanetnodrop": dict(BASE, upsampling_depth=4),
    "tdanetv2": dict(BASE, upsampling_depth=4),
    "tdanetgatevariant": dict(BASE, upsampling_depth=4),
    "tdanetattn": dict(BASE, upsampling_depth=4),
    "tdanetulayernum": dict(BASE, upsampling_depth=2),
}


@pytest.mark.parametrize("name", zoo.available_models())
def test_registry_model_forward(name):
    cfg = SPECIAL.get(name, BASE)
    model = zoo.get(name)(**cfg)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, T)) * 0.1
    est = model.apply(params, x)
    if name == "tdanetchunk":
        assert est.shape == (2, 2, T)
    else:
        assert est.shape == (2, 2, T)
    assert np.isfinite(np.asarray(est)).all()
