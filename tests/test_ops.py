"""Op-level numerics parity vs PyTorch (CPU float32)."""
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tdanet_tpu import ops

RTOL, ATOL = 1e-5, 1e-5


def to_np(t):
    return t.detach().cpu().numpy()


def test_conv1d_matches_torch():
    torch.manual_seed(0)
    m = nn.Conv1d(16, 32, 5, stride=2, padding=2, bias=True)
    x = torch.randn(2, 16, 37)
    want = to_np(m(x))
    params = {"weight": jnp.asarray(to_np(m.weight)),
              "bias": jnp.asarray(to_np(m.bias))}
    got = ops.conv1d(jnp.asarray(to_np(x)), params, stride=2, padding=2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


def test_depthwise_conv1d_matches_torch():
    torch.manual_seed(1)
    m = nn.Conv1d(24, 24, 5, stride=2, padding=2, groups=24)
    x = torch.randn(3, 24, 50)
    want = to_np(m(x))
    params = {"weight": jnp.asarray(to_np(m.weight)),
              "bias": jnp.asarray(to_np(m.bias))}
    got = ops.conv1d(jnp.asarray(to_np(x)), params, stride=2, padding=2,
                     groups=24)
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


def test_conv_transpose1d_matches_torch():
    torch.manual_seed(2)
    m = nn.ConvTranspose1d(10, 2, 64, stride=16, padding=32, bias=False)
    x = torch.randn(2, 10, 33)
    want = to_np(m(x))
    params = {"weight": jnp.asarray(to_np(m.weight))}
    got = ops.conv_transpose1d(jnp.asarray(to_np(x)), params, stride=16,
                               padding=32)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


def test_prelu_matches_torch():
    torch.manual_seed(3)
    m = nn.PReLU()
    with torch.no_grad():
        m.weight.fill_(0.17)
    x = torch.randn(2, 8, 11)
    want = to_np(m(x))
    got = ops.prelu(jnp.asarray(to_np(x)),
                    {"weight": jnp.asarray(to_np(m.weight))})
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


def test_glob_ln_matches_reference():
    from oracle import load_reference_module
    ref = load_reference_module("TDANet_best.py")
    torch.manual_seed(4)
    m = ref.GlobLN(12)
    with torch.no_grad():
        m.gamma.normal_()
        m.beta.normal_()
    x = torch.randn(2, 12, 31)
    want = to_np(m(x))
    got = ops.glob_ln(jnp.asarray(to_np(x)),
                      {"gamma": jnp.asarray(to_np(m.gamma)),
                       "beta": jnp.asarray(to_np(m.beta))})
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_group_norm1_matches_torch():
    torch.manual_seed(5)
    m = nn.GroupNorm(1, 12, eps=1e-8)
    with torch.no_grad():
        m.weight.normal_()
        m.bias.normal_()
    x = torch.randn(2, 12, 31)
    want = to_np(m(x))
    got = ops.group_norm1(jnp.asarray(to_np(x)),
                          {"weight": jnp.asarray(to_np(m.weight)),
                           "bias": jnp.asarray(to_np(m.bias))})
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_layer_norm_matches_torch():
    torch.manual_seed(6)
    m = nn.LayerNorm(20)
    with torch.no_grad():
        m.weight.normal_()
        m.bias.normal_()
    x = torch.randn(2, 7, 20)
    want = to_np(m(x))
    got = ops.layer_norm(jnp.asarray(to_np(x)),
                         {"weight": jnp.asarray(to_np(m.weight)),
                          "bias": jnp.asarray(to_np(m.bias))})
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("L,out", [(37, 10), (100, 33), (16, 16), (7, 20)])
def test_adaptive_avg_pool1d_matches_torch(L, out):
    torch.manual_seed(7)
    x = torch.randn(2, 6, L)
    want = to_np(F.adaptive_avg_pool1d(x, out))
    got = ops.adaptive_avg_pool1d(jnp.asarray(to_np(x)), out)
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("L,out", [(10, 37), (33, 100), (16, 16), (20, 7)])
def test_interpolate_nearest_matches_torch(L, out):
    torch.manual_seed(8)
    x = torch.randn(2, 6, L)
    want = to_np(F.interpolate(x, size=out, mode="nearest"))
    got = ops.interpolate_nearest(jnp.asarray(to_np(x)), out)
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("T", [8000, 8013, 31999])
def test_pad_signal_matches_reference(T):
    from oracle import load_reference_module
    ref = load_reference_module("TDANet_best.py")
    model = ref.TDANetBest.__new__(ref.TDANetBest)  # only need pad_input
    x = torch.randn(2, T)
    want, want_rest = ref.TDANetBest.pad_input(model, x, 64, 16)
    got, rest = ops.pad_signal(jnp.asarray(to_np(x)), 64, 16)
    assert rest == want_rest
    np.testing.assert_allclose(np.asarray(got), to_np(want), atol=0)


def test_sinusoidal_pe_matches_reference():
    from oracle import load_reference_module
    ref = load_reference_module("TDANet_best.py")
    pe_mod = ref.PositionalEncoding(32, 500)
    want = to_np(pe_mod.pe)[0]
    got = ops.sinusoidal_pe(500, 32)
    # float32 trig evaluation differs in the last ulps between libm and torch
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=2e-5)


def test_mha_matches_torch():
    torch.manual_seed(9)
    E, H = 64, 8
    m = nn.MultiheadAttention(E, H, dropout=0.0)
    m.eval()
    L, N = 5, 3
    x = torch.randn(L, N, E)
    want, _ = m(x, x, x)
    params = {
        "in_proj_weight": jnp.asarray(to_np(m.in_proj_weight)),
        "in_proj_bias": jnp.asarray(to_np(m.in_proj_bias)),
        "out_proj": {"weight": jnp.asarray(to_np(m.out_proj.weight)),
                     "bias": jnp.asarray(to_np(m.out_proj.bias))},
    }
    got = ops.multi_head_attention(
        jnp.asarray(to_np(x)), jnp.asarray(to_np(x)), jnp.asarray(to_np(x)),
        params, H)
    np.testing.assert_allclose(np.asarray(got), to_np(want), rtol=1e-4,
                               atol=1e-5)


def test_dw_conv_s2_fold_matches_conv_primitive():
    """The opt-in phase-split stride-2 depthwise path (ops.dw_s2_fold,
    used by the streaming engines) must equal the XLA conv primitive for
    even/odd lengths, torch semantics, and under vmap (the serving
    engines map per-utterance batch=1). docs/PERF.md fold experiment."""
    torch.manual_seed(7)
    for T in (50, 51, 9):
        for K in (3, 5):
            m = nn.Conv1d(12, 12, K, stride=2, padding=K // 2, groups=12,
                          bias=False)
            x = torch.randn(2, 12, T)
            want = to_np(m(x))
            params = {"weight": jnp.asarray(to_np(m.weight))}
            with ops.dw_s2_fold():
                got = ops.conv1d(jnp.asarray(to_np(x)), params, stride=2,
                                 padding=K // 2, groups=12)
                xv = jnp.asarray(to_np(x))[:, None]
                gotv = jax.vmap(lambda s: ops.conv1d(s, params, stride=2,
                                                     padding=K // 2,
                                                     groups=12))(xv)
            assert got.shape == want.shape
            np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL,
                                       atol=ATOL)
            # default (conv-primitive) branch must agree with fold
            got2 = ops.conv1d(jnp.asarray(to_np(x)), params, stride=2,
                              padding=K // 2, groups=12)
            np.testing.assert_allclose(np.asarray(got), np.asarray(got2),
                                       rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(np.asarray(gotv[:, 0]), want,
                                       rtol=RTOL, atol=ATOL)


def test_interpolate_nearest_f32_index_semantics():
    """torch floors the nearest-neighbor source index in FLOAT32
    (floorf(dst * (float)(L/out))); at L=14,out=110 the f32 scale
    rounds up and index 55 maps to source 7 where exact rational math
    gives 6. Round-4 regression: the float64 index formula silently
    diverged on every depth-4 ladder (EMCAD config fuzz B cases)."""
    import torch.nn.functional as F
    rng = np.random.default_rng(0)
    for L, out in [(14, 110), (14, 55), (28, 110), (110, 14), (7, 30),
                   (126, 2010), (503, 1005), (55, 377)]:
        x = rng.standard_normal((2, 3, L)).astype(np.float32)
        want = F.interpolate(torch.from_numpy(x), size=out,
                             mode="nearest").numpy()
        got = np.asarray(ops.interpolate_nearest(jnp.asarray(x), out))
        np.testing.assert_array_equal(got, want, err_msg=f"{L}->{out}")


def test_small_group_conv1d_matches_torch():
    """The shift-FMA lowering for stride-1 'same' grouped convs with one
    output per group (ops._small_group_conv1d — the LGAG-gate treatment,
    round-4 profile: XLA's grouped-conv lowering was 38% of
    TDANetEMCADv1_6's device time) must match torch Conv1d exactly,
    forward and gradient, across group widths and kernel sizes."""
    for seed, (C, O, ig, K, T) in enumerate([
            (512, 256, 2, 3, 101),   # the LGAG shape (EMCAD.py:251-286)
            (12, 4, 3, 5, 37),
            (16, 4, 4, 7, 64)]):
        torch.manual_seed(seed)
        m = nn.Conv1d(C, O, K, padding=K // 2, groups=O, bias=True)
        x = torch.randn(3, C, T)
        want = to_np(m(x))
        params = {"weight": jnp.asarray(to_np(m.weight)),
                  "bias": jnp.asarray(to_np(m.bias))}
        got = ops.conv1d(jnp.asarray(to_np(x)), params, padding=K // 2,
                         groups=O)
        np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL,
                                   atol=ATOL)
        # gradient parity vs torch autograd
        xt = x.clone().requires_grad_(True)
        m(xt).square().sum().backward()
        gx = jax.grad(lambda a: jnp.sum(ops.conv1d(
            a, params, padding=K // 2, groups=O) ** 2))(
                jnp.asarray(to_np(x)))
        np.testing.assert_allclose(np.asarray(gx), to_np(xt.grad),
                                   rtol=1e-4, atol=1e-4)


def test_small_group_conv1d_multi_output_matches_torch():
    """Round-5 generalization: the shift-FMA lowering also handles
    out/group in 2..4 (LGAG3's gates, Conv1d(512,512,3,groups=256) —
    TDANet_intergral_v1_4.py:370; XLA's lowering cost 3 x 31 ms per
    B=24 forward, TDANetEMCADv1_4 at 106x). Forward + input/weight
    grads vs torch."""
    for seed, (C, O, g, K, T) in enumerate([
            (512, 512, 256, 3, 101),  # LGAG3 (EMCAD_test.py:291-330)
            (12, 8, 4, 5, 37),        # ig=3, og=2
            (16, 16, 4, 7, 64)]):     # ig=4, og=4
        torch.manual_seed(seed + 10)
        m = nn.Conv1d(C, O, K, padding=K // 2, groups=g, bias=True)
        x = torch.randn(3, C, T)
        want = to_np(m(x))
        params = {"weight": jnp.asarray(to_np(m.weight)),
                  "bias": jnp.asarray(to_np(m.bias))}
        got = ops.conv1d(jnp.asarray(to_np(x)), params, padding=K // 2,
                         groups=g)
        np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL,
                                   atol=ATOL)
        xt = x.clone().requires_grad_(True)
        m(xt).square().sum().backward()
        loss = lambda a, p: jnp.sum(ops.conv1d(  # noqa: E731
            a, p, padding=K // 2, groups=g) ** 2)
        gx = jax.grad(loss, argnums=0)(jnp.asarray(to_np(x)), params)
        gw = jax.grad(loss, argnums=1)(jnp.asarray(to_np(x)), params)
        np.testing.assert_allclose(np.asarray(gx), to_np(xt.grad),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw["weight"]),
                                   to_np(m.weight.grad),
                                   rtol=1e-4, atol=1e-3)


def test_grouped_pointwise_conv1d_matches_torch():
    """k=1 grouped convs with few channels per group lower to a
    block-diagonal einsum (ops._grouped_pointwise_conv1d) — the
    EMCADTest 'lite-v2' pconv shapes (EMCAD_test.py:160,175). Forward +
    input/weight grads vs torch."""
    for seed, (C, O, g, T) in enumerate([
            (512, 256, 128, 101),  # pconv1: ig=4, og=2
            (256, 512, 64, 101),   # pconv2: ig=4, og=8
            (24, 48, 12, 37)]):    # ig=2, og=4
        torch.manual_seed(seed + 20)
        m = nn.Conv1d(C, O, 1, groups=g, bias=True)
        x = torch.randn(3, C, T)
        params = {"weight": jnp.asarray(to_np(m.weight)),
                  "bias": jnp.asarray(to_np(m.bias))}
        got = ops.conv1d(jnp.asarray(to_np(x)), params, groups=g)
        np.testing.assert_allclose(np.asarray(got), to_np(m(x)),
                                   rtol=RTOL, atol=ATOL)
        xt = x.clone().requires_grad_(True)
        m(xt).square().sum().backward()
        loss = lambda a, p: jnp.sum(ops.conv1d(a, p, groups=g) ** 2)  # noqa: E731
        gx = jax.grad(loss, argnums=0)(jnp.asarray(to_np(x)), params)
        gw = jax.grad(loss, argnums=1)(jnp.asarray(to_np(x)), params)
        np.testing.assert_allclose(np.asarray(gx), to_np(xt.grad),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw["weight"]),
                                   to_np(m.weight.grad),
                                   rtol=1e-4, atol=1e-3)
