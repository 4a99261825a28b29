#!/usr/bin/env python3
"""Self-adjudicate a Bench run against BASELINE.md (VERDICT r8 item 7).

Usage: python3 tools/adjudicate.py [bench_out.json] [BASELINE.md]

Applies BASELINE.md's own reading protocol:
- queries with baseline median >= 1 s: flag ratio > 2x as a candidate
  regression (worth profiling in-round);
- sub-second queries: flag only absolute delta > max(1 s, 5x spread)
  (scheduler jitter dominates ratios there);
- a whole-suite shift (most queries moving together) is host noise —
  the report separates per-query outliers from the suite-level ratio.

Exit 0 if no candidate regressions, 1 otherwise.
"""
import json
import re
import sys


def main(bench_path="bench_out.json", baseline_path="BASELINE.md"):
    bench = json.loads(re.sub(r"^\[info\]\s*", "", open(bench_path).read().strip()))
    base, spread = {}, {}
    for line in open(baseline_path):
        m = re.match(r"\| (\w+) \| ([\d.]+) \| ([\d.]+)", line)
        if m:
            base[m.group(1)] = float(m.group(2))
            spread[m.group(1)] = float(m.group(3))
    qs = {k: v for k, v in bench["queries"].items() if v >= 0}
    shared = sorted(set(qs) & set(base))
    suite_ratio = sum(qs[k] for k in shared) / max(sum(base[k] for k in shared), 1e-9)
    print(f"suite: {sum(qs[k] for k in shared):.1f}s vs baseline "
          f"{sum(base[k] for k in shared):.1f}s = {suite_ratio:.2f}x "
          f"over {len(shared)} shared queries")
    missing = sorted(set(qs) - set(base))
    if missing:
        print(f"no baseline row ({len(missing)}): {', '.join(missing)}")
    flags = []
    for k in shared:
        b, v = base[k], qs[k]
        if b >= 1.0 and v / b > 2.0:
            flags.append(f"{k}: {v:.2f}s vs {b:.2f}s = {v / b:.1f}x (ratio gate)")
        elif b < 1.0 and v - b > max(1.0, 5 * spread.get(k, 0)):
            flags.append(f"{k}: {v:.2f}s vs {b:.2f}s (+{v - b:.2f}s, abs gate)")
    if bench.get("failed"):
        flags.append(f"FAILED queries: {bench['failed']}")
    if flags:
        print("candidate regressions (profile in-round before shipping):")
        for f in flags:
            print(f"  {f}")
        return 1
    print("no candidate regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
