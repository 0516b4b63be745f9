"""Production hardening of AudioTrainer (no reference counterpart):
SIGTERM preemption -> checkpoint + clean exit + resume; a failing train
step restores the last checkpoint and training continues."""
import os
import signal
import subprocess
import sys
import time

import numpy as np

from test_data_metrics_utils import make_synth_split


def _conf(root, exp_dir):
    from tdanet_tpu.utils import load_yaml
    conf = load_yaml(os.path.join(os.path.dirname(__file__), "..",
                                  "configs", "tdanet_debug.yml"))
    conf["datamodule"]["data_config"].update(
        train_dir=os.path.join(root, "tr"),
        valid_dir=os.path.join(root, "dev"),
        test_dir=os.path.join(root, "tt"))
    conf["audionet"]["audionet_config"].update(num_blocks=1,
                                               upsampling_depth=4)
    conf["main_args"] = {"exp_dir": exp_dir}
    return conf


def _make_data(root):
    for split in ("tr", "dev", "tt"):
        make_synth_split(os.path.join(root, split), n_utt=4,
                         seconds=(1.2, 1.4), seed=2)


def test_step_failure_restores_checkpoint_and_continues(tmp_path, capsys):
    from tdanet_tpu.system.training_loop import AudioTrainer

    import jax

    from tdanet_tpu.parallel import make_mesh

    root = str(tmp_path / "data")
    _make_data(root)
    conf = _conf(root, str(tmp_path / "exp"))
    trainer = AudioTrainer(conf, mesh=make_mesh(dp=2, tp=1,
                                                devices=jax.devices()[:2]))

    real_step = trainer.train_step
    calls = {"n": 0}

    def flaky_step(state, mix, src, rng):
        calls["n"] += 1
        if calls["n"] == 3:  # epoch 1's first batch: a checkpoint exists
            raise RuntimeError("injected device failure")
        return real_step(state, mix, src, rng)

    trainer.train_step = flaky_step
    history = trainer.fit()
    assert len(history) == conf["training"]["epochs"]
    assert all(np.isfinite(r["val_loss"]) for r in history)
    out = capsys.readouterr().out
    assert "restoring last checkpoint" in out


def test_sigterm_checkpoints_and_resumes(tmp_path):
    root = str(tmp_path / "data")
    _make_data(root)
    exp_dir = str(tmp_path / "exp")
    worker = os.path.join(os.path.dirname(__file__), "preempt_worker.py")

    log = tmp_path / "run.log"
    with open(log, "w") as f:
        proc = subprocess.Popen([sys.executable, worker, root, exp_dir],
                                stdout=f, stderr=subprocess.STDOUT)
    # wait for the first epoch row, then preempt
    deadline = time.time() + 600
    while time.time() < deadline:
        if '"epoch": 0' in open(log).read():
            break
        if proc.poll() is not None:
            raise AssertionError(f"worker died early:\n{open(log).read()}")
        time.sleep(2)
    else:
        proc.kill()
        raise AssertionError(f"no epoch row before timeout:\n"
                             f"{open(log).read()}")
    proc.send_signal(signal.SIGTERM)
    rc = proc.wait(timeout=300)
    txt = open(log).read()
    assert rc == 0, txt
    assert "Preempted: checkpointed" in txt, txt
    assert "FIT_RETURNED_CLEANLY" in txt, txt
    assert os.path.exists(os.path.join(exp_dir, "best_model.pth"))

    # resume continues from the preemption checkpoint
    out = subprocess.run([sys.executable, worker, root, exp_dir, "resume"],
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "Resumed from step" in out.stdout, out.stdout
