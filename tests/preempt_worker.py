"""Subprocess worker for the preemption test: train many epochs on tiny
synthetic data until SIGTERM arrives; the trainer must checkpoint and
exit cleanly. argv: data_root exp_dir [resume]"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    data_root, exp_dir = sys.argv[1], sys.argv[2]
    resume = len(sys.argv) > 3 and sys.argv[3] == "resume"
    from tdanet_tpu.utils import load_yaml
    conf = load_yaml(os.path.join(os.path.dirname(__file__), "..",
                                  "configs", "tdanet_debug.yml"))
    conf["datamodule"]["data_config"].update(
        train_dir=os.path.join(data_root, "tr"),
        valid_dir=os.path.join(data_root, "dev"),
        test_dir=os.path.join(data_root, "tt"))
    conf["audionet"]["audionet_config"].update(num_blocks=1,
                                               upsampling_depth=4)
    conf["training"]["epochs"] = 3 if resume else 50
    conf["main_args"] = {"exp_dir": exp_dir}
    from tdanet_tpu.system.training_loop import AudioTrainer
    trainer = AudioTrainer(conf)
    trainer.fit(resume=resume)
    print("FIT_RETURNED_CLEANLY", flush=True)


if __name__ == "__main__":
    main()
