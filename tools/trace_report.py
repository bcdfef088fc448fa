"""Per-module attribution report from a JAX device trace.

The axon-tunneled TPU does support ``jax.profiler`` device traces; what
it lacks is TensorBoard's profile plugin. This tool replaces it: parse
the perfetto ``*.trace.json.gz`` a trace run produces, map each device
op back to its model module via the optimized-HLO metadata, and print a
per-module (and per-op) time table — the workflow that localized both
the decoder conv budget and the space-to-batch training pathology.

Usage:
    # 1. capture a trace + matching HLO (see utils/profiling.trace):
    with jax.profiler.trace("/tmp/trace"):
        ... run the jitted fn a few times ...
    open("/tmp/hlo.txt", "w").write(jitted.lower(...).compile().as_text())

    # 2. report:
    python tools/trace_report.py /tmp/trace /tmp/hlo.txt \
        [--iters 3] [--per-frame 8] [--depth 2] [--top 30]

``--iters`` divides by the number of traced executions, ``--per-frame``
additionally by the batch size, ``--depth`` controls how many op_name
path segments form a bucket.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import sys


def load_trace_events(trace_dir: str):
    files = sorted(
        glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    )
    if not files:
        raise FileNotFoundError(
            f"no *.trace.json.gz under {trace_dir} — did the trace run?"
        )
    with gzip.open(files[-1]) as f:
        t = json.load(f)
    pids = {
        e["pid"]: e["args"].get("name")
        for e in t["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    for e in t["traceEvents"]:
        if e.get("ph") != "X":
            continue
        pname = pids.get(e["pid"], "")
        if "TPU" in pname or "GPU" in pname:
            yield e["name"], e.get("dur", 0)


def load_hlo_map(hlo_path: str):
    txt = open(hlo_path).read()
    name2op = {}
    for m in re.finditer(
        r"%(\S+?) = (\S+) [^\n]*?metadata=\{op_name=\"([^\"]+)\"", txt
    ):
        name2op[m.group(1)] = (m.group(3), m.group(2))
    return name2op


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("hlo")
    ap.add_argument("--iters", type=float, default=1.0)
    ap.add_argument("--per-frame", type=float, default=1.0)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--ops", action="store_true",
                    help="also print the top raw ops with shapes")
    args = ap.parse_args(argv)

    name2op = load_hlo_map(args.hlo)
    div = args.iters * args.per_frame * 1000.0  # us -> ms, normalized

    buckets = collections.Counter()
    raw = collections.Counter()
    unmapped = 0.0
    total = 0.0
    for name, dur in load_trace_events(args.trace_dir):
        if name.startswith("jit_") or name.startswith("while"):
            continue
        total += dur
        meta = name2op.get(name)
        if meta is None:
            unmapped += dur
            buckets["<unmapped>"] += dur
            continue
        op, ty = meta
        op = re.sub(r"^jit\([^)]*\)/", "", op)
        op = re.sub(r"(jvp|transpose)\(([^()]*)\)", r"\1:\2", op)
        parts = [p for p in op.split("/") if p]
        buckets["/".join(parts[: args.depth])] += dur
        raw[(name, op[:90], ty[:36])] += dur

    print(f"total device op time: {total / div:.3f} ms (normalized); "
          f"unmapped {unmapped / div:.3f}")
    print(f"{'ms':>10}  bucket (depth={args.depth})")
    for k, v in buckets.most_common(args.top):
        print(f"{v / div:10.3f}  {k}")
    if args.ops:
        print("\ntop raw ops:")
        for (name, op, ty), v in raw.most_common(args.top):
            print(f"{v / div:10.3f}  {name:26s} {ty:36s} {op}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
