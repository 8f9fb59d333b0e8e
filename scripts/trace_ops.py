"""Dump the top device ops (by summed duration) inside each top-level jit
window of a jax.profiler trace.json.gz — finer-grained than the op-group
summary in trace_summary_r04.md.

    python scripts/trace_ops.py /tmp/trace_r5/plugins/profile/*/vm.trace.json.gz
"""

from __future__ import annotations

import collections
import gzip
import json
import sys


def main(path: str, top: int = 40) -> None:
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    # identify device-lane pids (TPU core)
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    print("processes:", {p: n for p, n in pid_names.items()}, file=sys.stderr)

    xs = [e for e in events
          if e.get("ph") == "X" and e.get("pid") in dev_pids]
    if not xs:  # fall back: everything with a duration
        xs = [e for e in events if e.get("ph") == "X"]

    # find top-level jit windows (XlaModule or jit_ prefixed names on the
    # module lane)
    lanes = collections.defaultdict(list)
    for e in xs:
        lanes[(e["pid"], e["tid"])].append(e)

    for (pid, tid), evs in sorted(lanes.items()):
        name = tid_names.get((pid, tid), "")
        total = sum(e.get("dur", 0) for e in evs)
        print(f"\n== lane pid={pid} tid={tid} '{name}' "
              f"({len(evs)} events, {total / 1e6:.3f}s summed) ==")
        # choose top-level events (not contained in any other event on lane)
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        agg = collections.Counter()
        cnt = collections.Counter()
        # exclusive-time accounting via containment stack
        stack = []
        for e in evs:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and stack[-1][1] <= ts:
                stack.pop()
            # subtract child from parent
            if stack:
                agg[stack[-1][2]] -= dur
            stack.append((ts, ts + dur, e["name"]))
            agg[e["name"]] += dur
            cnt[e["name"]] += 1
        for nm, us in agg.most_common(top):
            if us <= 0:
                continue
            print(f"  {us / 1e3:10.2f} ms  x{cnt[nm]:<5d} {nm[:110]}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 40)
