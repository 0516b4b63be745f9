"""Jitted train/eval steps over a device mesh.

Replaces the reference's AudioLightningModule hot loop
(audio_litmodule.py:83-163): one fused XLA program computes
forward + PIT loss + grads + clip + optimizer update, sharded over the
mesh (batch on 'dp', separator channels optionally on 'tp'); gradient
reduction is the psum XLA inserts — no DDP machinery.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from tdanet_tpu.parallel import (
    batch_sharding,
    param_shardings,
    replicated,
)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model, optimizer, key_or_params, mesh=None,
                       rules=None):
    """Init params (or take given ones), shard over the mesh, init opt."""
    if isinstance(key_or_params, jax.Array) and key_or_params.ndim <= 1:
        params = model.init(key_or_params)
    else:
        params = key_or_params
    if mesh is not None:
        shardings = param_shardings(params, mesh, rules)
        params = jax.device_put(params, shardings)
    opt_state = optimizer.init(params)
    step = jnp.zeros((), jnp.int32)
    if mesh is not None:
        # moment buffers inherit param shardings via zeros_like; scalars
        # (adam count, injected lr, step) land on one device — replicate
        # them onto the mesh so every leaf is consistently committed.
        from jax.sharding import NamedSharding
        rep = replicated(mesh)

        def fix(x):
            if hasattr(x, "sharding") and not isinstance(
                    x.sharding, NamedSharding):
                return jax.device_put(x, rep)
            return x
        opt_state = jax.tree_util.tree_map(fix, opt_state)
        step = jax.device_put(step, rep)
    return TrainState(params, opt_state, step)


def make_train_step(model, loss_fn, optimizer, mesh=None, rules=None,
                    compute_dtype=None, donate=True):
    """Returns jitted ``step(state, mixtures, targets, rng) -> (state, loss)``.

    mixtures: (B, T); targets: (B, n_src, T); batch axes sharded on 'dp'.
    """

    def step(state: TrainState, mixtures, targets, rng):
        def loss_of(params):
            est = model.apply(params, mixtures, training=True, rng=rng,
                              compute_dtype=compute_dtype)
            return loss_fn(est, targets)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: (p + u.astype(p.dtype)), state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    # state shardings resolved lazily on first call via jit's propagation;
    # inputs pinned: batch over dp, rng replicated.
    return jax.jit(
        step,
        in_shardings=(None, bsh, bsh, rep),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, loss_fn, mesh=None, compute_dtype=None):
    def step(params, mixtures, targets):
        est = model.apply(params, mixtures, training=False,
                          compute_dtype=compute_dtype)
        return loss_fn(est, targets)

    if mesh is None:
        return jax.jit(step)
    bsh = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(None, bsh, bsh))


def make_forward(model, mesh=None, compute_dtype=None):
    def fwd(params, mixtures):
        return model.apply(params, mixtures, training=False,
                           compute_dtype=compute_dtype)
    if mesh is None:
        return jax.jit(fwd)
    return jax.jit(fwd, in_shardings=(None, batch_sharding(mesh)))
