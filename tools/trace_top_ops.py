#!/usr/bin/env python
"""Aggregate device-op self-times from a jax.profiler trace.

Usage: python tools/trace_top_ops.py /tmp/tr/<variant> [-n 25] [--merge]

Reads the chrome-trace json(.gz) that ``jax.profiler.trace`` writes, keeps
events on TPU/device tracks (XLA op activity), sums duration per op name
and prints the top offenders — the attribution layer between "this variant
is X ms slower" (bench_profile) and "this specific fusion is why".

``--merge`` folds XLA's numbered op suffixes (fusion.123 -> fusion) so
repeated per-layer instances aggregate into op families.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re


def _find_trace(root: str):
    pats = [os.path.join(root, "**", "*.trace.json.gz"),
            os.path.join(root, "**", "*.trace.json")]
    files = []
    for p in pats:
        files += glob.glob(p, recursive=True)
    if not files:
        raise SystemExit(f"no trace files under {root}")
    return sorted(files)[-1]


def load_events(path: str):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", data)


def device_pids(events):
    """pids whose process name looks like a TPU/device track."""
    pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if re.search(r"TPU|/device|Device", name, re.I) \
                    and "host" not in name.lower():
                pids.add(e["pid"])
    return pids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("-n", type=int, default=25)
    ap.add_argument("--merge", action="store_true")
    args = ap.parse_args()

    path = _find_trace(args.root)
    events = load_events(path)
    pids = device_pids(events)

    total = 0.0
    by_name = collections.Counter()
    counts = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or (pids and e.get("pid") not in pids):
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))     # microseconds
        if args.merge:
            name = re.sub(r"[._]\d+(?=($|\.))", "", name)
            name = re.sub(r"\d+$", "", name)
        by_name[name] += dur
        counts[name] += 1
        total += dur

    print(f"{path}\ntotal device op time: {total / 1e3:.3f} ms "
          f"(all traced iterations)")
    print(f"{'op':60s} {'ms':>9s} {'%':>6s} {'count':>6s}")
    for name, dur in by_name.most_common(args.n):
        print(f"{name[:60]:60s} {dur / 1e3:9.3f} {100 * dur / total:6.1f} "
              f"{counts[name]:6d}")


if __name__ == "__main__":
    main()
