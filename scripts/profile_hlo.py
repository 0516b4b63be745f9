"""Join a jax.profiler trace with compiled-HLO metadata: per-op device
time attributed to source ops (fusion.N -> op_name + shape).

Usage:
    python scripts/profile_hlo.py <trace_dir> <hlo_txt> [top_n] [divisor]

trace_dir: directory passed to jax.profiler.trace (searches for
  plugins/profile/*/ *.trace.json.gz)
hlo_txt:   output of fwd.lower(...).compile().as_text() saved to a file
divisor:   divide durations by this (e.g. iters * scan_length) to get
  per-instance cost.

Works on the tunneled 'axon' TPU platform (device events appear under a
pid whose process_name contains 'TPU'). Used for the round-2 UConvBlock
breakdown (docs/PERF.md).
"""
import collections
import glob
import gzip
import json
import re
import sys


def load_device_events(trace_dir):
    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(sorted(paths)[-1]) as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    pids = {e["pid"]: e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    devpids = {k for k, v in pids.items() if "TPU" in v}
    return [e for e in events if e.get("pid") in devpids
            and e.get("ph") == "X"]


def load_hlo_meta(hlo_path):
    meta = {}
    pat = re.compile(r"^\s*(?:ROOT )?%?([\w.-]+)\s*=\s*(\(?\S+)")
    mpat = re.compile(r'metadata=\{[^}]*op_name="([^"]*)"')
    for line in open(hlo_path):
        m = pat.match(line)
        if not m:
            continue
        name, shape = m.group(1), m.group(2)
        om = mpat.search(line)
        if name not in meta:
            meta[name] = (shape.rstrip(","),
                          om.group(1) if om else "")
    return meta


def classify(op_name):
    if "/jit(_take)/gather" in op_name:
        return "interp-gather"
    if "dot_general" in op_name:
        return "matmul"
    if "conv_general_dilated" in op_name:
        return "conv"
    if "reduce" in op_name:
        return "reduce(norm-stats)"
    if "transpose" in op_name:
        return "transpose"
    return "elementwise/other"


def main():
    # optional: --scopes name1,name2 sums device time by jax.named_scope
    # substring of op_name (SURVEY §7 kernel-ledger attribution)
    scopes = []
    argv = list(sys.argv[1:])
    for i, a in enumerate(argv):
        if a == "--scopes":
            scopes = argv[i + 1].split(",")
            argv = argv[:i] + argv[i + 2:]
            break
    trace_dir, hlo_path = argv[0], argv[1]
    top_n = int(argv[2]) if len(argv) > 2 else 40
    div = float(argv[3]) if len(argv) > 3 else 1.0
    dev = load_device_events(trace_dir)
    meta = load_hlo_meta(hlo_path)
    agg, cnt = collections.Counter(), collections.Counter()
    for e in dev:
        agg[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
    # drop the whole-program wrappers (they nest everything)
    rows = []
    for name, dur in agg.items():
        if name.startswith("jit_") or name.startswith("while"):
            continue
        shape, op = meta.get(name, ("?", ""))
        rows.append((dur, name, shape, op))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows) / 1e3 / div
    print(f"total attributed device time: {total:.3f} ms (/= {div})")
    bycat = collections.Counter()
    for dur, name, shape, op in rows:
        bycat[classify(op)] += dur
    for cat, dur in bycat.most_common():
        print(f"  {dur/1e3/div:8.3f} ms  {cat}")
    if scopes:
        print("scope attribution (op_name substring match):")
        tot_us = sum(r[0] for r in rows)
        for s in scopes:
            d = sum(dur for dur, name, shape, op in rows if s in op)
            print(f"  {d/1e3/div:8.3f} ms  {100 * d / max(tot_us, 1):5.1f}%"
                  f"  scope={s}")
    print()
    for dur, name, shape, op in rows[:top_n]:
        print(f"{dur/1e3/div:8.4f} ms x{cnt[name]:4d} {name:32s} "
              f"{shape[:42]:42s} {op[-80:]}")


if __name__ == "__main__":
    main()
