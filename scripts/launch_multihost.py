"""Multi-host training launcher — the torchrun/Lightning-DDP-launch
equivalent for this framework (reference capability:
audio_train.py:185-195 via Lightning multi-node).

Single-controller-per-host model: run this once per host (or once with
--nprocs N to spawn N local processes for testing). Each process calls
`parallel.initialize_distributed` and then runs the normal
`audio_train.py` flow — the dp mesh spans all hosts' devices and XLA
reduces gradients over ICI/DCN.

Examples:
  # real pod: run on EVERY host, same coordinator
  python scripts/launch_multihost.py --coordinator host0:9999 \
      --num_processes 4 --process_id $HOST_ID -- \
      audio_train.py --conf_dir configs/tdanet.yml

  # local smoke: 2 CPU processes on this machine
  python scripts/launch_multihost.py --nprocs 2 --cpu -- \
      audio_train.py --conf_dir configs/tdanet_debug.yml
"""
import argparse
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (default: spawn locally)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--nprocs", type=int, default=None,
                   help="spawn N local processes (testing)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU platform in children (testing)")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- script.py args...")
    args = p.parse_args(argv)
    cmd = [c for c in args.cmd if c != "--"]
    if not cmd:
        p.error("no command given (use: -- audio_train.py ...)")

    if args.nprocs:
        # local spawn mode
        port = _free_port()
        procs = []
        for pid in range(args.nprocs):
            env = dict(os.environ)
            env["TDANET_COORDINATOR"] = f"localhost:{port}"
            env["TDANET_NUM_PROCESSES"] = str(args.nprocs)
            env["TDANET_PROCESS_ID"] = str(pid)
            if args.cpu:
                env["TDANET_FORCE_CPU"] = "1"
            procs.append(subprocess.Popen(
                [sys.executable] + cmd, cwd=REPO, env=env))
        rcs = [q.wait() for q in procs]
        return max(rcs)

    if args.coordinator is None or args.num_processes is None \
            or args.process_id is None:
        p.error("--coordinator/--num_processes/--process_id are required "
                "without --nprocs")
    env = dict(os.environ)
    env["TDANET_COORDINATOR"] = args.coordinator
    env["TDANET_NUM_PROCESSES"] = str(args.num_processes)
    env["TDANET_PROCESS_ID"] = str(args.process_id)
    return subprocess.call([sys.executable] + cmd, cwd=REPO, env=env)


if __name__ == "__main__":
    sys.exit(main())
