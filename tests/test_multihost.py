"""Multi-host smoke: 2-process jax.distributed over CPU gloo, running a
dp-sharded TDANet train step with per-process local batch shards
(reference capability: Lightning multi-node DDP, audio_train.py:185-195).
Each rank runs tests/multihost_worker.py in a fresh subprocess."""
import os

import numpy as np
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    return env


def test_two_process_distributed_train_step():
    port = _free_port()
    env = _clean_env()
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(port), str(pid)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid}:\n{out[-3000:]}"
    losses = []
    for out in outs:
        m = re.search(r"RANK \d LOSS (-?[\d.]+)", out)
        assert m, out[-2000:]
        losses.append(float(m.group(1)))
    # both ranks computed the same global loss through the collective
    assert abs(losses[0] - losses[1]) < 1e-5, losses


def _run_recovery_workers(tmp_path, mode, timeout=1500):
    import shutil

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_data_metrics_utils import make_synth_split

    root = tmp_path / "data"
    for split in ("tr", "dev", "tt"):
        make_synth_split(str(root / split), n_utt=8, seconds=(1.2, 1.4),
                         seed=4)
    exp_dir = str(tmp_path / "exp")
    port = _free_port()
    env = _clean_env()
    worker = os.path.join(REPO, "tests", "multihost_failure_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), str(root), exp_dir,
         mode],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        shutil.rmtree(exp_dir, ignore_errors=True)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid}:\n{out[-3000:]}"
    return outs


def test_step_failure_recovery_synchronized_across_ranks(tmp_path):
    """Every rank's train step aborts at the same batch (how a failing
    collective surfaces — it errors on all participants); the per-batch
    flag allgather must make BOTH ranks restore in the same iteration
    and finish training in lockstep. (A lone-rank HOST-side exception
    is unrecoverable without an elastic communicator rebuild — out of
    scope, documented in the worker.)"""
    outs = _run_recovery_workers(tmp_path, "fail")
    # print_only logs on rank 0 only; the real lockstep evidence is the
    # identical (epochs, collective val_loss) pair asserted below
    assert "restoring last checkpoint on all ranks" in outs[0], \
        f"rank 0 missed the recovery sync:\n{outs[0][-2000:]}"
    finals = []
    for out in outs:
        m = re.search(r"RANK \d EPOCHS (\d+) VAL (-?[\d.]+)", out)
        assert m, out[-2000:]
        finals.append((int(m.group(1)), float(m.group(2))))
    # both ranks completed the same number of epochs with the same
    # (collectively computed) final val loss
    assert finals[0] == finals[1], finals


def test_preemption_on_one_rank_propagates_to_all(tmp_path):
    """SIGTERM lands on RANK 0 ONLY mid-epoch (preemption notices hit
    one host first); the flag allgather must propagate it so both ranks
    break at the same batch boundary and join the collective checkpoint
    save — the pre-fix behavior was a pod deadlock (rank 0 saving while
    rank 1 enters the next step's psum)."""
    outs = _run_recovery_workers(tmp_path, "preempt")
    for pid, out in enumerate(outs):
        m = re.search(r"RANK \d PREEMPT_OK epochs=(\d+) last_ckpt=(\w+)",
                      out)
        assert m, f"rank {pid}:\n{out[-2000:]}"
        assert m.group(1) == "0"          # broke out before epoch end
    # the preempted checkpoint was written (rank-0 filesystem)
    assert "last_ckpt=True" in outs[0], outs[0][-2000:]


def test_two_process_audio_trainer_e2e(tmp_path):
    """Full AudioTrainer through scripts/launch_multihost.py: 2 CPU
    processes x 2 virtual devices = dp=4 mesh, per-process local batch
    shards, rank-0 checkpoint export."""
    import json
    import shutil

    sys.path.insert(0, REPO)
    from test_data_metrics_utils import make_synth_split

    root = tmp_path / "data"
    for split in ("tr", "dev", "tt"):
        make_synth_split(str(root / split), n_utt=8, seconds=(1.2, 1.4),
                         seed=3)
    exp = "mh_trainer_test"
    exp_dir = os.path.join(REPO, "Experiments", "checkpoint", exp)
    shutil.rmtree(exp_dir, ignore_errors=True)
    env = _clean_env()
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "launch_multihost.py"),
             "--nprocs", "2", "--cpu", "--",
             "audio_train.py", "--conf_dir", "configs/tdanet_debug.yml",
             f"datamodule.data_config.train_dir={root / 'tr'}",
             f"datamodule.data_config.valid_dir={root / 'dev'}",
             f"datamodule.data_config.test_dir={root / 'tt'}",
             "datamodule.data_config.batch_size=4",
             "audionet.audionet_config.num_blocks=1",
             "training.epochs=1", f"exp.exp_name={exp}"],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=1200)
        assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
        assert os.path.exists(os.path.join(exp_dir, "best_model.pth"))
        with open(os.path.join(exp_dir, "history.json")) as f:
            hist = json.load(f)
        assert len(hist) == 1 and np.isfinite(hist[0]["val_loss"])
    finally:
        shutil.rmtree(exp_dir, ignore_errors=True)
