"""Train CLI (reference: audio_train.py): config-driven end-to-end
training with checkpointing, early stopping, and best_model.pth export.

Usage:
    python audio_train.py --conf_dir configs/tdanet.yml [a.b.c=value ...]
"""

import os

# Multi-host: scripts/launch_multihost.py sets these; initialize the
# distributed runtime BEFORE any backend touch (the coordinator
# handshake must precede device discovery).
if os.environ.get("TDANET_COORDINATOR"):
    if os.environ.get("TDANET_FORCE_CPU"):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_"
                                     "count=2")
        # keep env + config in agreement: honor_jax_platforms_env()
        # below re-asserts the env var, so a stray JAX_PLATFORMS=axon
        # inherited from the launching shell must not survive FORCE_CPU
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    from tdanet_tpu.parallel import initialize_distributed
    initialize_distributed(
        coordinator_address=os.environ["TDANET_COORDINATOR"],
        num_processes=int(os.environ["TDANET_NUM_PROCESSES"]),
        process_id=int(os.environ["TDANET_PROCESS_ID"]))

import jax

from tdanet_tpu.utils import parse_config, save_yaml
from tdanet_tpu.utils.misc import honor_jax_platforms_env

honor_jax_platforms_env()  # the axon sitecustomize clobbers JAX_PLATFORMS


def main(config):
    from tdanet_tpu.system.training_loop import AudioTrainer

    exp_dir = os.path.join("Experiments", "checkpoint",
                           config["exp"]["exp_name"])
    config.setdefault("main_args", {})["exp_dir"] = exp_dir
    os.makedirs(exp_dir, exist_ok=True)
    save_yaml(os.path.join(exp_dir, "conf.yml"), config)

    trainer = AudioTrainer(config)
    from tdanet_tpu.utils.profiling import count_params, profile_model
    params = trainer.model.init(jax.random.PRNGKey(0))
    sr = config["datamodule"]["data_config"]["sample_rate"]
    seg = config["datamodule"]["data_config"].get("segment") or 1.0
    try:
        import numpy as _np
        prof = profile_model(trainer.model, params,
                             _np.zeros((1, int(sr * seg)), _np.float32))
        print(f"Model {config['audionet']['audionet_name']}: "
              f"{prof['params'] / 1e6:.2f}M params, "
              f"{prof['macs'] / 1e9:.2f} GMACs/segment, "
              f"devices={jax.device_count()}")
    except Exception:
        print(f"Model {config['audionet']['audionet_name']}: "
              f"{count_params(params) / 1e6:.2f}M params, "
              f"devices={jax.device_count()}")
    trainer.fit(resume=bool(config.get("main_args", {}).get("resume")))


if __name__ == "__main__":
    main(parse_config(default_conf="configs/tdanet.yml"))
