"""Worker for the 2-process jax.distributed smoke test (run by
test_multihost.py, one subprocess per rank). Proves the reference's
multi-node DDP capability (audio_train.py:185-195 via Lightning) on the
TPU-native stack: jax.distributed + gloo collectives + a dp-sharded
train step where each process feeds only its local batch shard.
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from tdanet_tpu.losses import PITLossWrapper, pairwise_neg_snr  # noqa: E402
from tdanet_tpu.models import TDANetBest  # noqa: E402
from tdanet_tpu.parallel import initialize_distributed, make_mesh  # noqa: E402
from tdanet_tpu.system import (  # noqa: E402
    create_train_state, make_optimizer, make_train_step)


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    assert initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 local CPU devices per process

    mesh = make_mesh(dp=4, tp=1)
    model = TDANetBest(out_channels=32, in_channels=64, num_blocks=1,
                       upsampling_depth=4, enc_kernel_size=4,
                       num_sources=2, sample_rate=8000)
    opt = make_optimizer("adam", lr=1e-3, grad_clip=5.0)
    loss_fn = PITLossWrapper(pairwise_neg_snr, threshold_byloss=True)
    with mesh:
        state = create_train_state(model, opt, jax.random.PRNGKey(0),
                                   mesh=mesh)
        step = make_train_step(model, loss_fn, opt, mesh=mesh)
        # global batch 4, each process provides its local half —
        # deterministic content so both ranks agree on the global batch
        T = 2000
        t = jnp.arange(T) / 8000.0
        rows = []
        for g in range(2):  # this process's 2 global rows
            gid = pid * 2 + g
            s1 = 0.3 * jnp.sin(2 * jnp.pi * (100 + 40 * gid) * t)
            s2 = 0.3 * jnp.sin(2 * jnp.pi * (900 + 40 * gid) * t)
            rows.append(jnp.stack([s1, s2]))
        local_src = jnp.stack(rows)              # (2, 2, T)
        local_mix = local_src.sum(1)             # (2, T)
        mix = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("dp")), local_mix, (4, T))
        src = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("dp")), local_src, (4, 2, T))
        state, loss = step(state, mix, src, jax.random.PRNGKey(1))
        loss = float(loss)
    print(f"RANK {pid} LOSS {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
