"""Optimizer factory over optax (reference: look2hear/system/optimizers.py).

``make_optimizer(name, lr=..., weight_decay=..., **kw)`` resolves a string
name (case-insensitive) to an optax GradientTransformation, covering the
torch.optim + torch_optimizer surface the reference exposes
(optimizers.py:9-26,58-75). Learning rate is injected via
``optax.inject_hyperparams`` so host-side schedulers (ReduceLROnPlateau,
DPTNetScheduler) can mutate it between steps without recompiling.
"""

from __future__ import annotations

import optax


def _adam(lr, weight_decay=0.0, betas=(0.9, 0.999), eps=1e-8, **kw):
    if weight_decay:
        return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                           weight_decay=weight_decay)
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)


def _adamw(lr, weight_decay=1e-2, betas=(0.9, 0.999), eps=1e-8, **kw):
    return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                       weight_decay=weight_decay)


def _sgd(lr, momentum=0.0, weight_decay=0.0, nesterov=False, **kw):
    tx = optax.sgd(lr, momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def _rmsprop(lr, alpha=0.99, eps=1e-8, momentum=0.0, **kw):
    return optax.rmsprop(lr, decay=alpha, eps=eps, momentum=momentum or None)


_FACTORIES = {
    "adam": _adam,
    "adamw": _adamw,
    "sgd": _sgd,
    "sgdw": _sgd,
    "asgd": _sgd,
    "rmsprop": _rmsprop,
    "adadelta": lambda lr, **kw: optax.adadelta(lr),
    "adagrad": lambda lr, **kw: optax.adagrad(lr),
    "adamax": lambda lr, **kw: optax.adamax(lr),
    "adamaxw": lambda lr, weight_decay=1e-2, **kw: optax.adamaxw(
        lr, weight_decay=weight_decay),
    "lamb": lambda lr, weight_decay=0.0, **kw: optax.lamb(
        lr, weight_decay=weight_decay),
    "lars": lambda lr, weight_decay=0.0, **kw: optax.lars(
        lr, weight_decay=weight_decay),
    "novograd": lambda lr, weight_decay=0.0, **kw: optax.novograd(
        lr, weight_decay=weight_decay),
    "radam": lambda lr, **kw: optax.radam(lr),
    "yogi": lambda lr, **kw: optax.yogi(lr),
    "adabelief": lambda lr, **kw: optax.adabelief(lr),
    "adabound": lambda lr, **kw: optax.adabelief(lr),  # closest optax analog
    "fromage": lambda lr, **kw: optax.fromage(lr),
    "sm3": lambda lr, **kw: optax.sm3(lr),
    "adafactor": lambda lr, **kw: optax.adafactor(lr),
    "lion": lambda lr, weight_decay=0.0, **kw: optax.lion(
        lr, weight_decay=weight_decay),
    "nadam": lambda lr, **kw: optax.nadam(lr),
    "nadamw": lambda lr, weight_decay=1e-2, **kw: optax.nadamw(
        lr, weight_decay=weight_decay),
    "diffgrad": lambda lr, **kw: optax.adam(lr),   # fallback analogs
    "accsgd": lambda lr, **kw: optax.sgd(lr, momentum=0.9),
    "qhadam": lambda lr, **kw: optax.adam(lr),
    "qhm": lambda lr, **kw: optax.sgd(lr, momentum=0.9),
    "pid": lambda lr, **kw: optax.sgd(lr, momentum=0.9),
    "adamod": lambda lr, **kw: optax.adam(lr),
    "ranger": lambda lr, **kw: optax.radam(lr),
    "rangerqh": lambda lr, **kw: optax.radam(lr),
    "rangerva": lambda lr, **kw: optax.radam(lr),
}

_CUSTOM = {}


def register_optimizer(name: str, factory):
    """Register a custom optimizer factory (optimizers.py:78-92)."""
    key = name.lower()
    if key in _FACTORIES or key in _CUSTOM:
        raise ValueError(f"Optimizer {name} already exists.")
    _CUSTOM[key] = factory


def get(identifier):
    if callable(identifier):
        return identifier
    f = {**_FACTORIES, **_CUSTOM}.get(str(identifier).lower())
    if f is None:
        raise ValueError(f"Could not interpret optimizer: {identifier}")
    return f


def make_optimizer(optim_name="adam", lr=1e-3, grad_clip=None,
                   **kwargs) -> optax.GradientTransformation:
    """Build the full gradient transformation: optional global-norm clip
    (audio_train.py:193 uses 5.0) -> optimizer with injectable lr."""
    factory = get(optim_name)
    inner = optax.inject_hyperparams(
        lambda learning_rate: factory(learning_rate, **kwargs)
    )(learning_rate=lr)
    if grad_clip:
        return optax.chain(optax.clip_by_global_norm(grad_clip), inner)
    return inner


def set_learning_rate(opt_state, lr):
    """Mutate the injected lr inside an (optionally chained) opt state."""
    def visit(state):
        if hasattr(state, "hyperparams") and "learning_rate" in getattr(
                state, "hyperparams", {}):
            state.hyperparams["learning_rate"] = lr
            return True
        if isinstance(state, tuple):
            return any(visit(s) for s in state)
        return False
    if not visit(opt_state):
        raise ValueError("No injected learning_rate found in opt_state")
    return opt_state


def get_learning_rate(opt_state):
    def visit(state):
        if hasattr(state, "hyperparams") and "learning_rate" in getattr(
                state, "hyperparams", {}):
            return state.hyperparams["learning_rate"]
        if isinstance(state, tuple):
            for s in state:
                r = visit(s)
                if r is not None:
                    return r
        return None
    return visit(opt_state)
