r"""Parse a jax.profiler trace.json.gz: exclusive device-op times.

Reconstructs parent/child nesting from (ts, dur) intervals per tid and
prints each op name's EXCLUSIVE time (self time minus nested children), so
`while.*` wrappers don't mask the fusions inside them.

    python benchmarks/parse_trace.py /tmp/bbtrace [top_n]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bbtrace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    f = sorted(glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz"))[-1]
    data = json.load(gzip.open(f))
    events = data["traceEvents"] if isinstance(data, dict) else data

    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")

    by_tid = collections.defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            if "TPU" in pids.get(e.get("pid"), ""):
                by_tid[(e["pid"], e.get("tid"))].append(e)

    excl = collections.Counter()
    incl = collections.Counter()
    cnt = collections.Counter()
    for evs in by_tid.values():
        evs.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack: list[dict] = []
        child_time = {}  # id(event) -> time covered by direct children
        for e in evs:
            while stack and e["ts"] >= stack[-1]["ts"] + stack[-1]["dur"]:
                done = stack.pop()
                excl[done["name"]] += done["dur"] - child_time.pop(id(done), 0)
            if stack:
                child_time[id(stack[-1])] = (
                    child_time.get(id(stack[-1]), 0) + e["dur"]
                )
            incl[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
            stack.append(e)
            child_time.setdefault(id(e), 0)
        while stack:
            done = stack.pop()
            excl[done["name"]] += done["dur"] - child_time.pop(id(done), 0)

    total = sum(excl.values())
    print(f"total device time (exclusive sum): {total / 1e6:.3f}s")
    print(f"{'excl_s':>8} {'incl_s':>8} {'count':>6}  name")
    for name, d in excl.most_common(top_n):
        print(
            f"{d / 1e6:8.3f} {incl[name] / 1e6:8.3f} {cnt[name]:6d}"
            f"  {name[:100]}"
        )


if __name__ == "__main__":
    main()
