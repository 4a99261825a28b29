#!/usr/bin/env python3
"""Regenerate BASELINE.md's per-query table from >=3 full-suite Bench runs.

Usage: python3 tools/baseline.py run1.json run2.json run3.json [...]

Each input is one line of graft.Bench output (optionally prefixed by
sbt's [info]). Emits a markdown table of per-query MEDIAN seconds with a
spread column (max-min across runs), plus the median-run total — the
dispersion the 2x gate needs to be read against.
"""
import json
import re
import statistics
import sys


def load(path):
    txt = open(path).read().strip()
    return json.loads(re.sub(r"^\[info\]\s*", "", txt))


def main(paths):
    runs = [load(p) for p in paths]
    assert len(runs) >= 3, "need >=3 runs for a median-of-3 baseline"
    keys = sorted(set().union(*[r["queries"].keys() for r in runs]))
    rows = []
    for k in keys:
        vals = [r["queries"][k] for r in runs if k in r["queries"]
                and r["queries"][k] >= 0]
        med = statistics.median(vals)
        rows.append((k, med, max(vals) - min(vals), len(vals)))
    totals = [sum(v for v in r["queries"].values() if v >= 0) for r in runs]
    print(f"Totals per run: {[round(t, 1) for t in totals]} "
          f"(median {statistics.median(totals):.1f} s, {len(keys)} queries)")
    print()
    print("| query | median s | spread (max-min) |")
    print("| --- | --- | --- |")
    for k, med, spread, n in rows:
        note = "" if n == len(runs) else f" ({n}/{len(runs)} runs)"
        print(f"| {k} | {med:.3f} | {spread:.3f}{note} |")


if __name__ == "__main__":
    main(sys.argv[1:])
