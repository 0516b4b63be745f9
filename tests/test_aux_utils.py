"""Aux surface: progress UI, profiling, get_layer, AV dataset branch,
tensor-parallel forward correctness."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdanet_tpu.utils.get_layer import InversibleInterface, get_layer
from tdanet_tpu.utils.profiling import count_flops, count_params


def test_get_layer():
    relu = get_layer("ReLU")
    assert float(relu(jnp.asarray(-1.0))) == 0.0
    with pytest.raises(NotImplementedError):
        get_layer("NoSuchLayer")
    with pytest.raises(NotImplementedError):
        InversibleInterface().inverse(None)


def test_profiling_counts():
    params = {"w": jnp.ones((4, 4))}
    assert count_params(params) == 16
    flops = count_flops(lambda p, x: x @ p["w"], params, jnp.ones((8, 4)))
    assert flops >= 2 * 8 * 4 * 4 * 0.5  # cost model may count MACs*2


def test_progress_ui():
    from tdanet_tpu.utils.progress import eval_progress
    progress, col = eval_progress("T")
    with progress:
        for _ in progress.track(range(3)):
            col.update({"si-snr_i": 1.234})


def test_utils_name_parity_with_reference():
    """Every name in look2hear.utils.__all__ (utils/__init__.py:24-47)
    resolves from tdanet_tpu.utils, so `from look2hear.utils import X`
    migrates by module rename alone. MyRichProgressBar is the one
    deliberate absence (a Lightning training-UI subclass; training
    progress here is JSON rows — noted in progress.py)."""
    import tdanet_tpu.utils as u

    ref_all = [
        "STFT", "pad_x_to_y", "shape_reconstructed", "tensors_to_device",
        "prepare_parser_from_dict", "parse_args_as_dict", "str_int_float",
        "str2bool", "str2bool_arg", "isfloat", "isint", "print_only",
        "RichProgressBarTheme", "BatchesProcessedColumn",
        "MyMetricsTextColumn", "is_complex", "is_torch_complex_tensor",
        "new_complex_like", "get_layer", "InversibleInterface",
        "make_pad_mask",
    ]
    missing = [n for n in ref_all if not hasattr(u, n)]
    assert not missing, missing
    # theme attributes used like RichProgressBarTheme.metrics
    assert u.RichProgressBarTheme.metrics.startswith("#")


def test_package_name_parity_with_reference():
    """Every name in the reference packages' __all__ lists resolves from
    the corresponding tdanet_tpu package — the reflection-driven config
    (getattr by YAML string) and user imports migrate by module rename
    alone. Includes AudioLightningModule -> AudioTrainer and the
    class-style loss factories (PairwiseNegSDR etc.)."""
    import importlib
    import re

    for pkg in ("models", "losses", "datas", "system", "metrics"):
        src = open(f"/root/reference/look2hear/{pkg}/__init__.py").read()
        m = re.search(r"__all__\s*=\s*\[(.*?)\]", src, re.S)
        assert m, pkg
        names = re.findall(r'"([^"]+)"', m.group(1))
        mod = importlib.import_module(f"tdanet_tpu.{pkg}")
        missing = [n for n in names if not hasattr(mod, n)]
        assert not missing, (pkg, missing)


def test_av_dataset_branch(tmp_path):
    from tdanet_tpu.datas import SeparationDataset
    from tdanet_tpu.utils import write_wav
    sr, T = 8000, 8000
    rng = np.random.default_rng(0)
    infos = {"mix": [], "s1": [], "s2": []}
    for i in range(2):
        s1 = rng.standard_normal(T).astype(np.float32) * 0.1
        s2 = rng.standard_normal(T).astype(np.float32) * 0.1
        for ch, d in (("mix", s1 + s2), ("s1", s1), ("s2", s2)):
            p = str(tmp_path / ch / f"u{i}.wav")
            write_wav(p, d, sr)
            if ch == "mix":
                infos[ch].append([p, T])
            else:
                mouth = str(tmp_path / ch / f"u{i}.npz")
                np.savez(mouth, data=rng.standard_normal(
                    (30, 4, 4)).astype(np.float32))
                infos[ch].append([p, mouth, T])
    for ch, lst in infos.items():
        with open(tmp_path / f"{ch}.json", "w") as f:
            json.dump(lst, f)
    ds = SeparationDataset(str(tmp_path), mix_key="mix", segment=0.5,
                           sample_rate=sr, audio_only=False, fps=25)
    mix, src, mouths, name = ds[0]
    assert mix.shape == (4000,)
    assert src.shape == (2, 4000)
    assert mouths.shape == (2, 12, 4, 4)  # fps_len = 0.5 * 25


def test_tp_sharded_forward_matches_single_device():
    from tdanet_tpu.models import TDANetBest
    from tdanet_tpu.parallel import make_mesh, shard_params

    model = TDANetBest(out_channels=64, in_channels=256, num_blocks=2,
                       upsampling_depth=4, enc_kernel_size=4,
                       num_sources=2, sample_rate=8000)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4000)) * 0.1
    want = np.asarray(model.apply(params, x))

    mesh = make_mesh(dp=2, tp=4, devices=jax.devices()[:8])
    with mesh:
        sharded, _ = shard_params(params, mesh)
        fwd = jax.jit(lambda p, v: model.apply(p, v))
        got = np.asarray(fwd(sharded, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sequence_sharded_input_matches():
    """Activations sharded along TIME (sequence parallelism via GSPMD):
    forward with the input sharded P('dp', 'tp') equals unsharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tdanet_tpu.models import TDANetBest
    from tdanet_tpu.parallel import make_mesh

    model = TDANetBest(out_channels=32, in_channels=64, num_blocks=1,
                       upsampling_depth=4, enc_kernel_size=4,
                       num_sources=2, sample_rate=8000)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4096)) * 0.1
    want = np.asarray(model.apply(params, x))
    mesh = make_mesh(dp=2, tp=4, devices=jax.devices()[:8])
    with mesh:
        xs = jax.device_put(x, NamedSharding(mesh, P("dp", "tp")))
        got = np.asarray(jax.jit(model.apply)(params, xs))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pit_hungarian_4src_jit_and_grad():
    from tdanet_tpu.losses import PITLossWrapper, pairwise_neg_sisdr
    wrap = PITLossWrapper(pairwise_neg_sisdr, threshold_byloss=False)
    key = jax.random.PRNGKey(0)
    tgt = jax.random.normal(key, (3, 4, 800))
    perm = jnp.asarray([2, 0, 3, 1])
    est = tgt[:, perm] + 0.01 * jax.random.normal(
        jax.random.fold_in(key, 1), (3, 4, 800))

    @jax.jit
    def loss_fn(e, t):
        return wrap(e, t)

    loss = float(loss_fn(est, tgt))
    # best permutation recovers near-perfect alignment -> strongly negative
    assert loss < -25.0
    g = jax.grad(loss_fn)(est, tgt)
    assert np.isfinite(np.asarray(g)).all()
