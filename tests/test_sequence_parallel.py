"""Sequence-parallel (time-sharded) long-form inference: the sp=8
forward must equal the single-device forward of the same padded input,
and the partitioned program must actually communicate (collectives in
the compiled HLO) rather than degenerate to full replication."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tdanet_tpu.models import TDANetBest
from tdanet_tpu.parallel import make_sp_mesh, pad_for_sp, separate_sp


def _model():
    return TDANetBest(out_channels=16, in_channels=32, num_blocks=2,
                      upsampling_depth=5, enc_kernel_size=4,
                      num_sources=2, sample_rate=8000)


def test_sp_forward_matches_single_device():
    model = _model()
    params = model.init(jax.random.PRNGKey(0))
    wav = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (8000 * 3,)),
                     np.float32) * 0.1

    mesh = make_sp_mesh(8)
    got = separate_sp(model, params, wav, mesh)

    padded, orig = pad_for_sp(jnp.asarray(wav)[None], model, 8)
    want = np.asarray(model.apply(params, padded))[0, :, :orig]

    assert got.shape == want.shape == (2, wav.shape[-1])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sp_program_is_partitioned_not_replicated():
    model = _model()
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_sp_mesh(8)
    wav = jnp.zeros((1, 8000 * 3), jnp.float32)
    padded, _ = pad_for_sp(wav, model, 8)
    in_sh = NamedSharding(mesh, P(None, "sp"))
    rep = NamedSharding(mesh, P())
    fwd = jax.jit(lambda p, x: model.apply(p, x),
                  in_shardings=(rep, in_sh), out_shardings=rep)
    txt = fwd.lower(params, padded).compile().as_text()
    assert ("collective-permute" in txt or "all-reduce" in txt
            or "all-gather" in txt), "no collectives: GSPMD replicated"
    # GlobLN statistics must be cross-device reductions somewhere
    assert "all-reduce" in txt
