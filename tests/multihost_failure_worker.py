"""Worker for the multi-host recovery-synchronization tests.

mode=fail: both ranks raise an injected exception at the same train step
(how real device/collective failures surface — a failing collective
aborts on EVERY participant); the synchronized recovery path must
restore on all ranks in the same batch iteration and finish training in
lockstep.

mode=preempt: only RANK 0 receives SIGTERM mid-epoch (preemption notices
land on one host first). The per-batch flag allgather must propagate the
preemption so BOTH ranks break at the same boundary and join the orbax
checkpoint save (a collective) — the pre-fix behavior was a pod
deadlock: rank 0 saving while rank 1 enters the next step's psum.

A lone-rank HOST-side exception (one rank skips a step's collectives
while peers' are in flight) is NOT recoverable without an elastic
communicator rebuild and is out of scope — jax.distributed cannot
resize/rebuild a live communicator."""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    port, pid, data_root, exp_dir, mode = sys.argv[1:6]
    pid = int(pid)
    from tdanet_tpu.parallel import initialize_distributed
    assert initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=2, process_id=pid)
    assert jax.process_count() == 2

    from tdanet_tpu.system.training_loop import AudioTrainer
    from tdanet_tpu.utils import load_yaml

    conf = load_yaml(os.path.join(REPO, "configs", "tdanet_debug.yml"))
    dc = conf["datamodule"]["data_config"]
    dc.update(train_dir=os.path.join(data_root, "tr"),
              valid_dir=os.path.join(data_root, "dev"),
              test_dir=os.path.join(data_root, "tt"),
              batch_size=4, num_workers=0)
    conf["main_args"] = {"exp_dir": exp_dir}
    conf["audionet"]["audionet_config"].update(num_blocks=1,
                                               upsampling_depth=4)
    conf["training"].update(epochs=2, max_step_failures=2)
    conf["exp"] = dict(conf.get("exp", {}), disable_wandb=True)

    trainer = AudioTrainer(conf)  # default mesh: all 4 devices dp
    orig_step = trainer.train_step
    calls = {"n": 0}

    def wrapped(state, mix, src, rng):
        calls["n"] += 1
        if calls["n"] == 2:
            if mode == "fail":
                # symmetric: every rank's step aborts (as a real failing
                # collective would) — no stray in-flight collectives
                raise RuntimeError("injected fault")
            if mode == "preempt" and pid == 0:
                import signal
                os.kill(os.getpid(), signal.SIGTERM)  # rank 0 only
        return orig_step(state, mix, src, rng)

    trainer.train_step = wrapped
    hist = trainer.fit()
    if mode == "preempt":
        last = os.path.join(exp_dir, "last")
        print(f"RANK {pid} PREEMPT_OK epochs={len(hist)} "
              f"last_ckpt={os.path.exists(last)}", flush=True)
    else:
        print(f"RANK {pid} EPOCHS {len(hist)} "
              f"VAL {hist[-1]['val_loss']:.6f}", flush=True)


if __name__ == "__main__":
    main()
