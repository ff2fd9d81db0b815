#!/usr/bin/env python3
"""Per-query bench regression tripwire (round-8 ask #3).

Diffs two bench artifacts' per-query times and flags queries whose
min-of-two time grew by more than THRESHOLD (default 1.5x). Accepts both
artifact shapes:

  - the driver's BENCH_r{N}.json ({"tail": "...<truncated stdout>..."}),
    from which per-query [run1,run2] pairs are regex-extracted;
  - raw graft.Bench stdout (the {"metric":"per_query",...,"runs":{...}}
    line, or a file containing it).

A flagged query is a WARNING, not a verdict: min-of-two at local[32] is
still exposed to ambient host load, and a suite that grew by N queries
shifts every query's GC/JIT environment. Before calling a flag a real
regression, re-time the query ISOLATED on the same binary:

  SPARK_GRAFT_ONLY=<name> SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Bench"

and compare against its old time; contention shows up as the isolated
run landing back at the old number (see SCALING.md "driver-bench drift",
round 8). Exit code 1 if anything is flagged, for use as a CI tripwire.

Usage: python3 tools/bench_diff.py OLD NEW [threshold]
"""
import json
import re
import sys


def per_query(path):
    """name -> min-of-runs seconds, from either artifact shape."""
    text = open(path).read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = {"tail": text}
    blob = d.get("tail", "") if isinstance(d, dict) else ""
    if isinstance(d, dict) and "runs" in d:
        return {k: min(v) for k, v in d["runs"].items() if min(v) >= 0}
    if isinstance(d, dict) and "queries" in d and "tail" not in d:
        return {k: v for k, v in d["queries"].items() if v >= 0}
    pairs = re.findall(r'"([a-z0-9_]+)":\[(-?[0-9.]+),(-?[0-9.]+)\]', blob)
    out = {}
    for k, a, b in pairs:
        m = min(float(a), float(b))
        if m >= 0:
            out[k] = m
    return out


def main(old_path, new_path, threshold=1.5):
    old, new = per_query(old_path), per_query(new_path)
    common = sorted(set(old) & set(new))
    if not common:
        print("no common queries between the two artifacts")
        return 2
    flagged = []
    for k in common:
        # sub-100ms times are timer noise; require absolute growth too
        if new[k] > old[k] * threshold and new[k] - old[k] > 0.1:
            flagged.append(k)
    tot_old = sum(old[k] for k in common)
    tot_new = sum(new[k] for k in common)
    print(f"{len(common)} common queries; aggregate "
          f"{tot_old:.1f}s -> {tot_new:.1f}s ({tot_new / tot_old:.2f}x)")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"{len(only_new)} new queries (+"
              f"{sum(new[k] for k in only_new):.1f}s): "
              + ", ".join(only_new[:10]) + ("..." if len(only_new) > 10 else ""))
    if flagged:
        print(f"\nFLAGGED (> {threshold}x AND > +0.1s) — re-time isolated "
              "before treating as a regression:")
        for k in sorted(flagged, key=lambda k: -(new[k] / old[k])):
            print(f"  {k:36s} {old[k]:7.3f}s -> {new[k]:7.3f}s "
                  f"({new[k] / old[k]:.2f}x)")
        return 1
    print("no per-query drift beyond threshold")
    return 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], t))
