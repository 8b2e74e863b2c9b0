"""Summarize a jax.profiler trace: top device ops by total duration.

Usage: python scripts/trace_summary.py /tmp/trace_dir [top_n]

Reads the newest ``*.trace.json.gz`` under the directory, aggregates
complete events on device-side tracks by (cleaned) op name, prints a
table of total ms / call count. Op names are cleaned of fusion indices
(``fusion.123`` -> ``fusion``) so families group.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = sorted(
        glob.glob(os.path.join(root, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        sys.exit(f"no trace.json.gz under {root}")
    path = paths[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    events = data.get("traceEvents", [])
    # pid/tid -> track name
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    # device tracks: TPU/device/XLA Ops
    dev_pids = {
        pid for pid, n in names.items()
        if any(k in n.lower() for k in ("tpu", "device", "/device", "xla"))
        and "host" not in n.lower()
    }

    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        name = re.sub(r"[.\d]+$", "", name)
        dur = e.get("dur", 0) / 1000.0  # us -> ms
        agg[name] += dur
        cnt[name] += 1
        total += dur

    print(f"trace: {path}")
    print(f"tracks: { {pid: names.get(pid) for pid in (dev_pids or names)} }")
    print(f"{'total ms':>10} {'calls':>7}  op")
    for name, ms in agg.most_common(top_n):
        print(f"{ms:10.1f} {cnt[name]:7d}  {name[:90]}")
    print(f"{total:10.1f}          TOTAL (device)")


if __name__ == "__main__":
    main()
