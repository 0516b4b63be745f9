"""Window-process kernel: equivalence vs oracle, gradients, both ops.

Mirrors the reference's unit_test.py pattern (equivalence + grad for the
only native kernel); the torch roll+view oracle is replicated by the
XLA reference implementations, which the Pallas kernels must match.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tdanet_tpu.kernels import (
    roll_and_window_partition,
    roll_and_window_partition_xla,
    window_merge_and_roll,
    window_merge_and_roll_xla,
)

B, H, W, C = 2, 16, 16, 32
WS = 4


def torch_oracle_forward(x, shift, ws):
    t = torch.from_numpy(np.asarray(x))
    if shift > 0:
        t = torch.roll(t, shifts=(-shift, -shift), dims=(1, 2))
    Bs, Hs, Ws_, Cs = t.shape
    t = t.view(Bs, Hs // ws, ws, Ws_ // ws, ws, Cs)
    return t.permute(0, 1, 3, 2, 4, 5).contiguous() \
        .view(-1, ws, ws, Cs).numpy()


@pytest.mark.parametrize("shift", [0, 2])
def test_forward_matches_torch_oracle(shift):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    want = torch_oracle_forward(x, shift, WS)
    got_pallas = np.asarray(roll_and_window_partition(x, shift, WS))
    got_xla = np.asarray(roll_and_window_partition_xla(x, shift, WS))
    np.testing.assert_allclose(got_xla, want, atol=0)
    np.testing.assert_allclose(got_pallas, want, atol=0)


@pytest.mark.parametrize("shift", [0, 2])
def test_roundtrip(shift):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    wins = roll_and_window_partition(x, shift, WS)
    back = window_merge_and_roll(wins, shift, WS, H, W)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)
    back_xla = window_merge_and_roll_xla(
        roll_and_window_partition_xla(x, shift, WS), shift, WS, H, W)
    np.testing.assert_allclose(np.asarray(back_xla), np.asarray(x), atol=0)


def test_gradients_are_inverse_permutation():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))

    def f(x):
        return jnp.sum(roll_and_window_partition(x, 2, WS) ** 2)

    def f_ref(x):
        return jnp.sum(roll_and_window_partition_xla(x, 2, WS) ** 2)

    g = jax.grad(f)(x)
    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=0)

    wins = roll_and_window_partition(x, 2, WS)

    def h(w):
        return jnp.sum(window_merge_and_roll(w, 2, WS, H, W) ** 3)

    def h_ref(w):
        return jnp.sum(window_merge_and_roll_xla(w, 2, WS, H, W) ** 3)

    gh = jax.grad(h)(wins)
    gh_ref = jax.grad(h_ref)(wins)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_ref),
                               rtol=1e-6, atol=1e-6)


def test_jittable():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    out = jax.jit(lambda v: roll_and_window_partition(v, 2, WS))(x)
    assert out.shape == (B * (H // WS) * (W // WS), WS, WS, C)
