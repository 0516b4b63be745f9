"""Driver-facing contracts: bench.py must print exactly one JSON line
with the agreed keys, and __graft_entry__ must expose the two hooks."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_json_contract():
    env = dict(os.environ, BENCH_BLOCKS="1", BENCH_BATCH="2",
               BENCH_ITERS="2", BENCH_SECONDS="0.5",
               JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, lines
    row = json.loads(lines[0])
    assert set(row) == {"metric", "value", "unit", "vs_baseline"}
    assert row["value"] > 0 and row["vs_baseline"] > 0


def _driver_env():
    """Strip the pytest conftest's CPU-mesh hints so the child sees the
    same cold environment the driver uses (MULTICHIP_r01 failed because
    dryrun_multichip assumed the caller had pre-set them)."""
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


def test_graft_entry_hooks():
    import __graft_entry__ as g
    assert callable(g.entry) and callable(g.dryrun_multichip)


def test_dryrun_multichip_driver_parity():
    """Exactly the driver's invocation: fresh subprocess, no conftest, no
    env hints. dryrun_multichip must self-configure its 8-device mesh."""
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=_driver_env(), capture_output=True, text=True,
        timeout=900)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "dryrun_multichip OK on 8 devices" in out.stdout


def test_dryrun_multichip_backend_already_up():
    """If the caller already initialized a too-small backend (the single
    tunneled TPU chip in the driver env), dryrun must re-exec a fresh
    subprocess rather than fail."""
    code = ("import jax; jax.config.update('jax_platforms', 'cpu');"
            "assert len(jax.devices()) == 1;"
            "import __graft_entry__ as g; g.dryrun_multichip(4)")
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                         env=_driver_env(), capture_output=True, text=True,
                         timeout=900)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "dryrun_multichip OK on 4 devices" in out.stdout
