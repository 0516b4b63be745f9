"""Lockstep training-trajectory parity vs the reference torch recipe.

test_grad_fidelity proves per-parameter gradients match at one point;
this file proves N optimizer steps TRACK: from identical bridged weights
and identical batches, a minimal torch loop replicating the reference's
training semantics —

- PIT neg-SNR train loss (pw_mtx, threshold_byloss=true,
  /root/reference/configs/tdanet.yml:15-20),
- clip_grad_norm_(5.0) before the step (audio_train.py:193, applied by
  Lightning between backward and optimizer.step),
- torch.optim.Adam via make_optimizer
  (/root/reference/look2hear/system/optimizers.py:58-75),
- ReduceLROnPlateau stepped once per epoch on the val metric
  (audio_train.py:75-89, audio_litmodule.py:193-218)

— is run against the SAME jitted train step AudioTrainer uses
(system/trainer.py make_train_step: value_and_grad -> clip -> adam ->
param update, system/optimizers.py make_optimizer), in fp32, asserting
per-step losses stay in lockstep and the parameter trees stay within a
drift bound. Optimizer-semantics mismatches (Adam eps placement /
bias-correction, clip ordering, plateau cadence) are exactly the class
of bug only this test can see.

Stochastic layers (dropout/droppath) are disabled on BOTH sides — torch
and JAX cannot share an RNG stream, and those layers' gradients are
already pinned by test_grad_fidelity; what's under test here is the
optimizer/clip/scheduler chain.
"""
import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from oracle import load_reference_module, torch_state_dict_to_numpy  # noqa: E402
from tdanet_tpu.losses import PITLossWrapper, pairwise_neg_snr  # noqa: E402
from tdanet_tpu.models import TDANetBest, flat_torch_to_pytree  # noqa: E402
from tdanet_tpu.system.optimizers import (  # noqa: E402
    get_learning_rate,
    make_optimizer,
    set_learning_rate,
)
from tdanet_tpu.system.schedulers import ReduceLROnPlateau  # noqa: E402
from tdanet_tpu.system.trainer import (  # noqa: E402
    TrainState,
    create_train_state,
    make_train_step,
)

CFG = dict(out_channels=64, in_channels=128, num_blocks=2,
           upsampling_depth=4, enc_kernel_size=4, num_sources=2,
           sample_rate=8000)
B, T, LR, N_STEPS = 2, 4000, 1e-3, 50
STEPS_PER_EPOCH = 10


def _load_ref_loss():
    def load(fname, name):
        if name in sys.modules:
            return sys.modules[name]
        spec = importlib.util.spec_from_file_location(
            name, f"/root/reference/look2hear/losses/{fname}")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod
    matrix = load("matrix.py", "ref_matrix")
    pit = load("pit_wrapper.py", "ref_pit")
    return pit.PITLossWrapper(matrix.PairwiseNegSDR("snr"),
                              pit_from="pw_mtx", threshold_byloss=True)


class _EvalModeModel:
    """AudioTrainer's model with stochastic layers forced off, so the
    REAL make_train_step program (grads -> clip -> adam -> update) runs
    deterministically against the torch loop."""

    def __init__(self, model):
        self._m = model

    def apply(self, params, x, training=True, rng=None, compute_dtype=None):
        return self._m.apply(params, x, training=False,
                             compute_dtype=compute_dtype)

    def init(self, key):
        return self._m.init(key)


def _make_batches(seed=7):
    """Deterministic structured mixtures (tones + noise) so the SNR loss
    has real gradients; cycled over the run."""
    rng = np.random.default_rng(seed)
    t = np.arange(T) / CFG["sample_rate"]
    batches = []
    for k in range(10):
        srcs = []
        for b in range(B):
            f1, f2 = rng.uniform(80, 400, 2)
            s1 = 0.3 * np.sin(2 * np.pi * f1 * t + rng.uniform(0, 6)) \
                + 0.02 * rng.standard_normal(T)
            s2 = 0.3 * np.sin(2 * np.pi * f2 * t + rng.uniform(0, 6)) \
                + 0.02 * rng.standard_normal(T)
            srcs.append(np.stack([s1, s2]))
        src = np.stack(srcs).astype(np.float32)   # (B, 2, T)
        batches.append((src.sum(1), src))
    return batches


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


def test_fifty_step_lockstep_with_torch_recipe():
    ref = load_reference_module("TDANet_best.py")
    torch.manual_seed(0)
    tmodel = ref.TDANetBest(**CFG)
    tmodel.eval()  # same rationale as the module docstring
    tloss = _load_ref_loss()
    topt = torch.optim.Adam(tmodel.parameters(), lr=LR)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        topt, mode="min", factor=0.5, patience=1)

    jmodel = TDANetBest(**CFG)
    # deep-copy: torch_state_dict_to_numpy returns VIEWS of torch
    # storage, and torch's in-place optimizer updates would otherwise
    # leak into the first jit dispatch (mesh=None -> no device_put copy)
    params = jax.tree_util.tree_map(
        np.array, flat_torch_to_pytree(torch_state_dict_to_numpy(tmodel)))
    jloss = PITLossWrapper(pairwise_neg_snr, pit_from="pw_mtx",
                           threshold_byloss=True)
    joptimizer = make_optimizer("adam", lr=LR, grad_clip=5.0)
    state = create_train_state(_EvalModeModel(jmodel), joptimizer, params)
    step = make_train_step(_EvalModeModel(jmodel), jloss, joptimizer,
                           donate=False)
    jsched = ReduceLROnPlateau(LR, mode="min", factor=0.5, patience=1)

    # val metric sequence with a plateau so BOTH schedulers must fire a
    # reduction mid-run (epoch = STEPS_PER_EPOCH steps -> 5 epochs)
    val_metrics = [1.0, 0.9, 0.9, 0.9, 0.9]

    batches = _make_batches()
    t_losses, j_losses = [], []
    rng_key = jax.random.PRNGKey(0)
    for s in range(N_STEPS):
        mix_np, tgt_np = batches[s % len(batches)]

        # torch: Lightning step semantics (backward -> clip(5.0) -> Adam)
        mix_t = torch.from_numpy(mix_np)
        tgt_t = torch.from_numpy(tgt_np)
        topt.zero_grad()
        loss_t = tloss(tmodel(mix_t), tgt_t)
        loss_t.backward()
        torch.nn.utils.clip_grad_norm_(tmodel.parameters(), 5.0)
        topt.step()
        t_losses.append(float(loss_t))

        # ours: the AudioTrainer jitted step (clip+adam inside)
        state, loss_j = step(state, jnp.asarray(mix_np),
                             jnp.asarray(tgt_np), rng_key)
        j_losses.append(float(loss_j))

        if (s + 1) % STEPS_PER_EPOCH == 0:
            epoch = (s + 1) // STEPS_PER_EPOCH - 1
            m = val_metrics[epoch]
            tsched.step(m)
            lr_t = topt.param_groups[0]["lr"]
            lr_j = jsched.step(m)
            set_learning_rate(state.opt_state, lr_j)
            assert abs(lr_t - lr_j) < 1e-12, (epoch, lr_t, lr_j)

    # the plateau actually fired (patience 1 over [1.0, .9, .9, .9, .9])
    assert topt.param_groups[0]["lr"] == pytest.approx(LR * 0.5)
    assert float(get_learning_rate(state.opt_state)) == \
        pytest.approx(LR * 0.5)

    # per-step loss lockstep (measured: max rel 4.1e-5 over 50 steps,
    # fp32 CPU — see PROGRESS r3)
    t_arr, j_arr = np.array(t_losses), np.array(j_losses)
    denom = np.maximum(np.abs(t_arr), 1e-3)
    rel = np.abs(t_arr - j_arr) / denom
    assert rel[0] < 1e-5, (t_arr[0], j_arr[0])
    assert rel[:10].max() < 1e-4, rel[:10].max()
    assert rel.max() < 1e-3, (rel.argmax(), rel.max())
    # both trajectories actually descended (training, not a no-op)
    assert t_arr[-5:].mean() < t_arr[:5].mean() - 1.0
    assert j_arr[-5:].mean() < j_arr[:5].mean() - 1.0

    # parameter-tree drift bound after 50 Adam steps (trainable params;
    # torch buffers like pos_enc.pe are derived, not optimizer state)
    j_flat = _flatten(jax.device_get(state.params))
    worst = (None, 0.0)
    n_checked = 0
    for name, tp in tmodel.named_parameters():
        tv = tp.detach().numpy()
        jv = j_flat.get(name)
        assert jv is not None, f"missing param {name}"
        drift = float(np.linalg.norm(jv - tv) /
                      (np.linalg.norm(tv) + 1e-12))
        if drift > worst[1]:
            worst = (name, drift)
        n_checked += 1
    assert n_checked > 50
    assert worst[1] < 1e-2, f"param drift {worst[1]:.4f} at {worst[0]}"
