"""Join trace op durations with HLO source metadata and aggregate device
time by source file:line — the decode/encode cost map.

    python scripts/trace_by_source.py TRACE.json.gz HLO1 [HLO2 ...]
"""

from __future__ import annotations

import collections
import gzip
import json
import re
import sys


def load_source_map(hlo_paths):
    """op name -> (file:line, op_name metadata)."""
    m = {}
    pat = re.compile(
        r"%(\S+?) = .*?metadata={op_name=\"([^\"]*)\""
        r"(?:.*?source_file=\"([^\"]*)\")?(?:.*?source_line=(\d+))?")
    for path in hlo_paths:
        with open(path) as f:
            for line in f:
                mo = pat.search(line)
                if mo:
                    name, opn, sf, sl = mo.groups()
                    if sf:
                        m[name] = (f"{sf.split('/')[-1]}:{sl}", opn)
                    else:
                        m[name] = ("?", opn)
    return m


def main():
    trace, hlos = sys.argv[1], sys.argv[2:]
    smap = load_source_map(hlos)
    with gzip.open(trace, "rt") as f:
        data = json.load(f)
    events = [e for e in data["traceEvents"] if e.get("ph") == "X"]
    tid_names = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    ops_lane = [
        e for e in events
        if tid_names.get((e["pid"], e["tid"])) == "XLA Ops"
    ]
    # exclusive time
    ops_lane.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
    agg = collections.Counter()
    cnt = collections.Counter()
    stack = []
    for e in ops_lane:
        ts, dur = e["ts"], e.get("dur", 0)
        while stack and stack[-1][1] <= ts:
            stack.pop()
        if stack:
            agg[stack[-1][2]] -= dur
        stack.append((ts, ts + dur, e["name"]))
        agg[e["name"]] += dur
        cnt[e["name"]] += 1

    by_src = collections.Counter()
    by_src_n = collections.Counter()
    unknown = collections.Counter()
    for name, us in agg.items():
        if us <= 0:
            continue
        base = name.split("(")[0]
        hit = smap.get(base)
        if hit is None:
            unknown[base] += us
            continue
        key = f"{hit[0]:<24s} {hit[1][:60]}"
        by_src[key] += us
        by_src_n[key] += cnt[name]
    print("== device time by source (exclusive, summed over reps) ==")
    for k, us in by_src.most_common(60):
        print(f"  {us / 1e3:10.2f} ms x{by_src_n[k]:<6d} {k}")
    print("== unmapped ==")
    for k, us in unknown.most_common(15):
        print(f"  {us / 1e3:10.2f} ms  {k}")


if __name__ == "__main__":
    main()
