"""fp64 GRADIENT-exactness sweep across the full model registry.

Closes the round-4 gap "gradient parity covers 4 of 34 models": every
registered model's backward pass is pinned against torch autograd in
double precision — same weights (via the bridge), same input, loss =
sum(est * w) with a fixed random w so every output element contributes
a generic cotangent. Agreement is ~1e-14 relative (vs the 2e-2 rtol
the fp32 grad test needed), so any formula difference in ANY model's
backward — custom VJPs included — fails loudly.

Tolerances: rtol 1e-9 per element, plus an absolute floor of 1e-11 x
the global gradient scale — some parameters have mathematically-zero
gradients (e.g. a conv bias feeding GroupNorm: the normalization is
invariant to it), where both sides are rounding noise and a pure
relative comparison is meaningless.

TDANetV2 is excluded (no runnable oracle — see test_fp64_exactness).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import tdanet_tpu.models as zoo
from oracle import torch_state_dict_to_numpy
from test_fp64_exactness import CASES, KEEP, _double_oracle
from tdanet_tpu.models import flat_torch_to_pytree

RTOL = 1e-9
ATOL_GLOBAL = 1e-11  # x global max-|grad|


def _flatten(tree):
    flat = {}

    def rec(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{prefix}.{k}" if prefix else k)
        else:
            flat[prefix] = np.asarray(node)
    rec(tree, "")
    return flat


def _assert_grads_match(tmodel, jmodel, T):
    state = torch_state_dict_to_numpy(tmodel)
    torch.manual_seed(1)
    x = torch.randn(2, T, dtype=torch.float64)
    torch.manual_seed(2)
    with torch.no_grad():
        w = torch.randn_like(tmodel(x))
    loss_t = (tmodel(x) * w).sum()
    loss_t.backward()
    tgrads = {k: p.grad.detach().numpy()
              for k, p in tmodel.named_parameters() if p.grad is not None}
    assert tgrads, "oracle produced no gradients"

    with jax.enable_x64():
        params = flat_torch_to_pytree(state, skip=KEEP)
        xw, ww = jnp.asarray(x.numpy()), jnp.asarray(w.numpy())

        def loss_fn(p):
            est = jmodel.apply(p, xw, compute_dtype=jnp.float64)
            return jnp.sum(est * ww)

        loss_j, grads = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-12)
    jflat = _flatten(grads)
    gscale = max(np.abs(tg).max() for tg in tgrads.values())
    n = 0
    for name, tg in tgrads.items():
        jg = jflat.get(name)
        assert jg is not None, f"missing grad for {name}"
        np.testing.assert_allclose(
            jg, tg, rtol=RTOL, atol=ATOL_GLOBAL * gscale,
            err_msg=f"fp64 grad mismatch at {name}")
        n += 1
    assert n == len(tgrads)


@pytest.mark.parametrize("ref_file,cls,cfg,T",
                         CASES, ids=[c[1] for c in CASES])
def test_fp64_grad_exactness(ref_file, cls, cfg, T):
    tmodel = _double_oracle(ref_file, cls, cfg)
    # oracles stay in eval mode (deterministic: no dropout/droppath),
    # matching training=False on the JAX side; the stochastic wrappers
    # have their own parity tests
    jmodel = getattr(zoo, cls)(**cfg)
    _assert_grads_match(tmodel, jmodel, T)


def test_fp64_grad_exactness_chunk():
    cfg = dict(out_channels=64, in_channels=128, num_blocks=2,
               upsampling_depth=4, num_sources=2, sample_rate=8000,
               n_chunk=32)
    tmodel = _double_oracle("TDANet_chunk.py", "TDANetChunk", cfg)
    jmodel = zoo.TDANetChunk(**cfg)
    # unused reference encoder/decoder params receive no torch grads and
    # aren't in our tree; _assert_grads_match only walks torch grads that
    # exist, but the bridge would still carry the dead weights — filter
    # at the state level like the forward test does.
    state = torch_state_dict_to_numpy(tmodel)
    state = {k: v for k, v in state.items()
             if not k.startswith(("encoder", "decoder"))}
    torch.manual_seed(1)
    x = torch.randn(2, 32 * 125, dtype=torch.float64)
    torch.manual_seed(2)
    with torch.no_grad():
        w = torch.randn_like(tmodel(x))
    (tmodel(x) * w).sum().backward()
    tgrads = {k: p.grad.detach().numpy()
              for k, p in tmodel.named_parameters()
              if p.grad is not None
              and not k.startswith(("encoder", "decoder"))}
    with jax.enable_x64():
        params = flat_torch_to_pytree(state, skip=KEEP)

        def loss_fn(p):
            est = jmodel.apply(p, jnp.asarray(x.numpy()),
                               compute_dtype=jnp.float64)
            return jnp.sum(est * jnp.asarray(w.numpy()))

        _, grads = jax.value_and_grad(loss_fn)(params)
    jflat = _flatten(grads)
    gscale = max(np.abs(tg).max() for tg in tgrads.values())
    for name, tg in tgrads.items():
        np.testing.assert_allclose(
            jflat[name], tg, rtol=RTOL, atol=ATOL_GLOBAL * gscale,
            err_msg=f"fp64 grad mismatch at {name}")
