"""Aggregate a jax.profiler xplane capture's TPU op times directly.

xprof's hlo_stats currently returns zero rows for this image's captures
(device-plane schema mismatch); the XSpace proto itself has the full
'/device:TPU:0' plane, so this parses it with the tensorflow tsl proto
and prints per-op and per-category self-time budgets.

Usage: python scripts_dev/xplane_report.py <trace_dir> [--iters N] [--top K]
"""
from __future__ import annotations

import argparse
import glob
import re
from collections import defaultdict


def load_plane(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    fs = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not fs:
        raise SystemExit(f"no xplane under {trace_dir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(fs[-1], "rb").read())
    tpu = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not tpu:
        raise SystemExit("no TPU plane captured (CPU_ONLY trace - tunnel flake; retry)")
    return tpu[0]


CAT_RULES = [
    ("pallas/mosaic kernel", re.compile(r"tpu_custom_call|custom-call")),
    ("sort", re.compile(r"sort")),
    ("scatter", re.compile(r"scatter")),
    ("gather", re.compile(r"gather|dynamic-slice")),
    ("conv/dot", re.compile(r"convolution|dot")),
    ("reduce", re.compile(r"reduce")),
    ("copy/transpose/pad", re.compile(r"copy|transpose|pad|bitcast|reshape|slice|concatenate")),
    ("fusion", re.compile(r"fusion")),
]


def categorize(name):
    for cat, rx in CAT_RULES:
        if rx.search(name):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    plane = load_plane(args.trace_dir)
    meta = plane.event_metadata
    per_op = defaultdict(lambda: [0.0, 0])
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = meta[ev.metadata_id].name
            per_op[name][0] += ev.duration_ps / 1e9  # -> ms
            per_op[name][1] += 1
    total = sum(v[0] for v in per_op.values()) / args.iters
    print(f"device XLA-op total: {total:.1f} ms/iter over {args.iters} iters, "
          f"{len(per_op)} distinct ops")
    rows = sorted(per_op.items(), key=lambda kv: -kv[1][0])
    print(f"{'ms/iter':>8} {'occ/iter':>8}  op")
    for name, (ms, occ) in rows[: args.top]:
        print(f"{ms/args.iters:8.2f} {occ//args.iters:8d}  {name[:90]}")
    cats = defaultdict(float)
    for name, (ms, _) in per_op.items():
        cats[categorize(name)] += ms / args.iters
    print("\nby category (ms/iter):")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {v:8.2f}  {k}")
    # glue = everything but the named heavies
    heavy = {"pallas/mosaic kernel", "sort", "scatter"}
    glue = sum(v for k, v in cats.items() if k not in heavy)
    print(f"\nglue (non kernel/sort/scatter): {glue:.2f} ms/iter")


if __name__ == "__main__":
    main()
