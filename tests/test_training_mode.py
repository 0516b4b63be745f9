"""Training-mode stochastic ops (dropout/droppath rng plumbing) and the
optimizer factory's full name surface."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdanet_tpu.models import TDANetBest
from tdanet_tpu.system.optimizers import _FACTORIES, make_optimizer


def test_training_mode_is_stochastic_and_seeded():
    model = TDANetBest(out_channels=32, in_channels=64, num_blocks=2,
                       upsampling_depth=4, enc_kernel_size=4,
                       num_sources=2, sample_rate=8000)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4000)) * 0.1

    e1 = model.apply(params, x, training=True, rng=jax.random.PRNGKey(7))
    e2 = model.apply(params, x, training=True, rng=jax.random.PRNGKey(7))
    e3 = model.apply(params, x, training=True, rng=jax.random.PRNGKey(8))
    eval_out = model.apply(params, x, training=False)

    # same rng -> deterministic; different rng -> different (dropout fired)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=0)
    assert np.abs(np.asarray(e1) - np.asarray(e3)).max() > 1e-6
    # training output differs from eval output (stochastic ops active)
    assert np.abs(np.asarray(e1) - np.asarray(eval_out)).max() > 1e-6
    assert np.isfinite(np.asarray(e1)).all()


@pytest.mark.parametrize("name", sorted(_FACTORIES))
def test_optimizer_factory_all_names(name):
    tx = make_optimizer(name, lr=1e-3, grad_clip=5.0)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    for u in jax.tree_util.tree_leaves(updates):
        assert np.isfinite(np.asarray(u)).all()
