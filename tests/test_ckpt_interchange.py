"""Checkpoint interchange: load a checkpoint written by the REFERENCE's
own serialize() schema (base_model.py:159-173), and remat training path."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from oracle import load_reference_module
from tdanet_tpu.models import BaseModel, TDANetBest


def test_from_pretrain_reads_reference_serialized_ckpt(tmp_path):
    ref = load_reference_module("TDANet_best.py")
    torch.manual_seed(0)
    cfg = dict(out_channels=64, in_channels=128, num_blocks=1,
               upsampling_depth=4, enc_kernel_size=4, num_sources=2,
               sample_rate=8000)
    tmodel = ref.TDANetBest(**cfg)
    tmodel.eval()
    # write exactly the reference's serialize() payload, incl. the
    # 'audio_model.' Lightning prefix variant
    conf = {
        "model_name": "TDANetBest",
        "state_dict": {f"audio_model.{k}": v
                       for k, v in tmodel.state_dict().items()},
        "model_args": {"n_src": 2},
        "infos": {"software_versions": {"torch_version": torch.__version__}},
    }
    path = str(tmp_path / "best_model.pth")
    torch.save(conf, path)

    model, params = BaseModel.from_pretrain("TDANetBest", path, **cfg)
    torch.manual_seed(1)
    x = torch.randn(2, 4000)
    with torch.no_grad():
        want = tmodel(x).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x.numpy())))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4 * scale)


def test_remat_training_grads_match():
    cfg = dict(out_channels=64, in_channels=128, num_blocks=3,
               upsampling_depth=4, enc_kernel_size=4, num_sources=2,
               sample_rate=8000)
    m_plain = TDANetBest(**cfg, remat=False)
    m_remat = TDANetBest(**cfg, remat=True)
    params = m_plain.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4000)) * 0.1

    def loss(model, p):
        return jnp.sum(model.apply(p, x) ** 2)

    g1 = jax.grad(lambda p: loss(m_plain, p))(params)
    g2 = jax.grad(lambda p: loss(m_remat, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_reference_loads_our_export(tmp_path):
    """Reverse interchange: a checkpoint exported by THIS framework loads
    into the PyTorch reference model and produces the same outputs."""
    from oracle import load_reference_module
    from tdanet_tpu.system.checkpoint import export_torch_pth

    cfg = dict(out_channels=64, in_channels=128, num_blocks=1,
               upsampling_depth=4, enc_kernel_size=4, num_sources=2,
               sample_rate=8000)
    jmodel = TDANetBest(**cfg)
    params = jmodel.init(jax.random.PRNGKey(42))
    path = export_torch_pth(jmodel, params, str(tmp_path / "ours.pth"))

    ref = load_reference_module("TDANet_best.py")
    tmodel = ref.TDANetBest(**cfg)
    conf = torch.load(path, map_location="cpu", weights_only=False)
    missing, unexpected = tmodel.load_state_dict(conf["state_dict"],
                                                 strict=False)
    # only regenerated buffers (positional encodings) may be missing
    assert not unexpected
    assert all(k.endswith(".pe") for k in missing)
    tmodel.eval()
    torch.manual_seed(0)
    x = torch.randn(2, 4000) * 0.1
    with torch.no_grad():
        want = tmodel(x).numpy()
    got = np.asarray(jmodel.apply(params, jnp.asarray(x.numpy())))
    snr = 10 * np.log10((want ** 2).sum() / ((want - got) ** 2).sum())
    assert snr > 40.0, snr
