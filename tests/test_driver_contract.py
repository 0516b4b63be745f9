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
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, lines
    row = json.loads(lines[0])
    assert set(row) == {"metric", "value", "unit", "vs_baseline"}
    assert row["value"] > 0 and row["vs_baseline"] > 0


def test_graft_entry_hooks():
    import __graft_entry__ as g
    assert callable(g.entry) and callable(g.dryrun_multichip)
