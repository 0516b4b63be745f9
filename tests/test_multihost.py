"""Multi-host smoke: 2-process jax.distributed over CPU gloo, running a
dp-sharded TDANet train step with per-process local batch shards
(reference capability: Lightning multi-node DDP, audio_train.py:185-195).
Each rank runs tests/multihost_worker.py in a fresh subprocess."""
import os
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
