#!/usr/bin/env python
"""Summarize a jax.profiler trace directory into an op-level cost table.

Usage:
    python bench.py --profile /tmp/prof [...]    # writes the trace
    python tools/profile_summary.py /tmp/prof    # prints the hot-op table

Parses the Chrome-trace JSON (plugins/profile/<run>/*.trace.json.gz) that
jax.profiler.trace emits and aggregates device-lane event durations by op
category, giving the MXU-vs-elementwise split the VALIDATION.md roofline
arguments rest on. No tensorboard required (zero-egress image).
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys

# XLA op name -> coarse category
_CATEGORIES = [
    # dtype casts FIRST: a bare "conv" pattern would also match %convert.N
    # and book cast time as MXU work
    (re.compile(r"%?convert", re.I), "layout/copy"),
    (re.compile(r"%?(convolution|conv2d|\bconv\b)", re.I), "conv (MXU)"),
    (re.compile(r"%?(dot|einsum|matmul)", re.I), "matmul (MXU)"),
    (re.compile(r"%?fusion", re.I), "fusion (elementwise)"),
    (re.compile(r"%?(copy|transpose|bitcast|reshape)", re.I), "layout/copy"),
    (re.compile(r"%?(rng|threefry|random)", re.I), "rng"),
    (re.compile(r"%?(all-reduce|all-gather|reduce-scatter|collective)", re.I),
     "collective"),
    (re.compile(r"%?(dynamic-slice|dynamic-update|gather|scatter)", re.I),
     "gather/scatter"),
    (re.compile(r"%?(reduce|sort)", re.I), "reduce"),
]


def categorize(name: str) -> str:
    for pat, cat in _CATEGORIES:
        if pat.search(name):
            return cat
    return "other"


def load_events(trace_dir: str):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True)
    )
    if not paths:
        sys.exit(f"no *.trace.json.gz under {trace_dir} — run bench.py "
                 "--profile first")
    events = []
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        events.extend(data.get("traceEvents", []))
    return events


def device_lane_pids(events):
    """Process ids whose name looks like a device (TPU/accelerator) lane."""
    pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if re.search(r"(tpu|device|/device:|xla)", name, re.I) and not \
                    re.search(r"host|python", name, re.I):
                pids.add(e.get("pid"))
    return pids


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    events = load_events(trace_dir)
    dev_pids = device_lane_pids(events)

    by_cat = collections.Counter()
    by_op = collections.Counter()
    parents = collections.Counter()
    total = 0.0
    # while/jit/call events are PARENT aggregates that enclose their body ops
    # on the same lane — counting them alongside leaves double-counts and
    # inflates "other"; report them separately.
    parent_pat = re.compile(r"^(while|jit_|call|body|condition)", re.I)
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "")
        if not dur or name.startswith("$"):
            continue
        if parent_pat.match(name):
            parents[name] += dur
            continue
        total += dur
        by_cat[categorize(name)] += dur
        by_op[name] += dur

    if total == 0:
        sys.exit("no device events found — trace may be host-only")

    print(f"device busy time: {total/1e3:.2f} ms across "
          f"{len(by_op)} distinct ops\n")
    print("by category:")
    for cat, dur in by_cat.most_common():
        print(f"  {cat:<24} {dur/1e3:>10.2f} ms  {100*dur/total:>5.1f}%")
    print(f"\ntop {top_n} ops:")
    for name, dur in by_op.most_common(top_n):
        print(f"  {dur/1e3:>10.2f} ms  {100*dur/total:>5.1f}%  {name[:90]}")
    if parents:
        print("\nenclosing control-flow events (not in totals above):")
        for name, dur in parents.most_common(5):
            print(f"  {dur/1e3:>10.2f} ms  {name[:90]}")


if __name__ == "__main__":
    main()
