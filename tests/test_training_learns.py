"""Training actually learns: on a trivially separable synthetic task the
PIT SI-SNR improves by a clear margin within a few hundred steps; and
data-parallel gradients equal single-device gradients."""
import numpy as np

import jax
import jax.numpy as jnp

from tdanet_tpu.losses import PITLossWrapper, pairwise_neg_sisdr, \
    pairwise_neg_snr
from tdanet_tpu.models import TDANetBest
from tdanet_tpu.parallel import make_mesh
from tdanet_tpu.system import (
    create_train_state,
    make_optimizer,
    make_train_step,
)


def make_batch(key, B=8, T=2000):
    """Separable-by-construction mixtures: disjoint frequency bands."""
    t = jnp.arange(T) / 8000.0
    k1, k2, k3 = jax.random.split(key, 3)
    f1 = jax.random.uniform(k1, (B, 1), minval=100, maxval=300)
    f2 = jax.random.uniform(k2, (B, 1), minval=800, maxval=1200)
    ph = jax.random.uniform(k3, (B, 2), maxval=6.28)
    s1 = 0.3 * jnp.sin(2 * jnp.pi * f1 * t[None] + ph[:, :1])
    s2 = 0.3 * jnp.sin(2 * jnp.pi * f2 * t[None] + ph[:, 1:])
    src = jnp.stack([s1, s2], 1)
    return s1 + s2, src


def test_loss_decreases_on_synthetic_task():
    model = TDANetBest(out_channels=32, in_channels=64, num_blocks=1,
                       upsampling_depth=4, enc_kernel_size=4,
                       num_sources=2, sample_rate=8000)
    opt = make_optimizer("adam", lr=1e-3, grad_clip=5.0)
    loss_fn = PITLossWrapper(pairwise_neg_snr, threshold_byloss=True)
    state = create_train_state(model, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, loss_fn, opt)

    val_fn = jax.jit(lambda p, m, s: PITLossWrapper(
        pairwise_neg_sisdr, threshold_byloss=False)(model.apply(p, m), s))
    mix_v, src_v = make_batch(jax.random.PRNGKey(999))
    loss0 = float(val_fn(state.params, mix_v, src_v))

    for i in range(150):
        mix, src = make_batch(jax.random.PRNGKey(i))
        state, tr_loss = step(state, mix, src, jax.random.PRNGKey(1000 + i))
    loss1 = float(val_fn(state.params, mix_v, src_v))
    # neg SI-SDR should drop by several dB on this trivial task
    assert loss1 < loss0 - 3.0, (loss0, loss1)


def test_hungarian_pit_under_dp_mesh():
    """n_src=4 routes PIT through the Hungarian jax.pure_callback
    (losses/pit.py); run it inside a dp-sharded jitted TRAIN step on the
    8-device mesh to prove host callbacks survive GSPMD partitioning
    (reference: look2hear/losses/pit_wrapper.py:133-142 under DDP)."""
    model = TDANetBest(out_channels=32, in_channels=64, num_blocks=1,
                       upsampling_depth=4, enc_kernel_size=4,
                       num_sources=4, sample_rate=8000)
    opt = make_optimizer("adam", lr=1e-3, grad_clip=5.0)
    loss_fn = PITLossWrapper(pairwise_neg_snr, pit_from="pw_mtx",
                             threshold_byloss=True)
    mesh = make_mesh(dp=8, tp=1, devices=jax.devices()[:8])
    with mesh:
        state = create_train_state(model, opt, jax.random.PRNGKey(0),
                                   mesh=mesh)
        step = make_train_step(model, loss_fn, opt, mesh=mesh)
        mix, src2 = make_batch(jax.random.PRNGKey(7), B=8, T=2000)
        src = jnp.concatenate([src2, 0.5 * src2], axis=1)  # (B, 4, T)
        mix = src.sum(1)
        state, loss = step(state, mix, src, jax.random.PRNGKey(8))
        assert np.isfinite(float(loss))


def test_dp_gradients_match_single_device():
    model = TDANetBest(out_channels=32, in_channels=64, num_blocks=1,
                       upsampling_depth=4, enc_kernel_size=4,
                       num_sources=2, sample_rate=8000)
    loss_fn = PITLossWrapper(pairwise_neg_snr, threshold_byloss=True)
    params = model.init(jax.random.PRNGKey(0))
    mix, src = make_batch(jax.random.PRNGKey(1), B=8)

    def loss_of(p, m, s):
        return loss_fn(model.apply(p, m), s)

    g_single = jax.grad(loss_of)(params, mix, src)

    mesh = make_mesh(dp=8, tp=1, devices=jax.devices()[:8])
    from tdanet_tpu.parallel import batch_sharding, shard_params
    with mesh:
        sp, _ = shard_params(params, mesh)
        mix_s = jax.device_put(mix, batch_sharding(mesh))
        src_s = jax.device_put(src, batch_sharding(mesh))
        g_dp = jax.jit(jax.grad(loss_of))(sp, mix_s, src_s)
    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


def test_scales_remat_gradients_match_full_remat():
    """remat="scales" (selective checkpoint_name landmarks) must be a pure
    memory/speed tradeoff: gradients identical to full remat."""
    mix, src = make_batch(jax.random.PRNGKey(0), B=2, T=800)
    loss = PITLossWrapper(pairwise_neg_snr, pit_from="pw_mtx")

    def grads_for(remat):
        model = TDANetBest(out_channels=16, in_channels=32, num_blocks=2,
                           upsampling_depth=4, enc_kernel_size=4,
                           num_sources=2, sample_rate=8000, remat=remat)
        params = model.init(jax.random.PRNGKey(1))
        g = jax.grad(lambda p: loss(model.apply(p, mix), src))(params)
        return params, g

    p_full, g_full = grads_for(True)
    p_sel, g_sel = grads_for("scales")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        p_full, p_sel)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        g_full, g_sel)
