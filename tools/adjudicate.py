#!/usr/bin/env python3
"""Self-adjudicate a Bench run against BASELINE.md (VERDICT r8 item 7,
noise forensics per VERDICT r9 item 6).

Usage: python3 tools/adjudicate.py [bench_out.json] [BASELINE.md]

Applies BASELINE.md's own reading protocol:
- queries with baseline median >= 1 s: flag ratio > 2x as a candidate
  regression (worth profiling in-round);
- sub-second queries: flag only absolute delta > max(1 s, 5x spread)
  (scheduler jitter dominates ratios there);
- a whole-suite shift (most queries moving together — suite median
  ratio > 1.3x) is host noise: flags are re-gated against the
  shift-normalized baseline, and only residual outliers count;
- residual outliers that form at most two contiguous run-order blocks
  while the rest of the suite holds (VERDICT r9's q11–q17 pattern) are
  a suspected host-noise WINDOW — a background process stealing the
  machine for the span those queries ran in. Bench's per-query start
  timestamps ("starts") corroborate the span when present.

Exit 0 if no surviving candidate regressions (warnings for suspected
noise), 1 otherwise. Failed queries are always fatal.
"""
import json
import re
import statistics
import sys


def load_bench(path):
    bench = json.loads(re.sub(r"^\[info\]\s*", "", open(path).read().strip()))
    if "queries" in bench:
        return bench
    # a driver BENCH_r{N}.json wrapper: the real line is in "parsed"
    # (complete) or "tail" (possibly truncated stdout capture)
    if isinstance(bench.get("parsed"), dict) and "queries" in bench["parsed"]:
        return bench["parsed"]
    if isinstance(bench.get("tail"), str):
        # Bench prints "starts" before "queries" (r11) so a truncated
        # tail keeps durations; epoch-second start values (~1.7e9) are
        # filtered by magnitude, and a duration seen after a same-named
        # timestamp overwrites it
        pairs = re.findall(r'"([a-z]\w+)":(-?[\d.eE+]+)', bench["tail"])
        skip = {"metric", "value", "sf"}
        qs = {k: float(v) for k, v in pairs if k not in skip and float(v) < 1e8}
        print(f"note: reconstructed {len(qs)} queries from a truncated "
              "driver tail — coverage may be partial")
        return {"queries": qs, "failed": []}
    raise SystemExit(f"unrecognized bench artifact shape: {path}")


def gate(k, b, v, spread):
    """True when (b -> v) trips the baseline protocol's per-query gate."""
    if b >= 1.0:
        return v / b > 2.0
    return v - b > max(1.0, 5 * spread.get(k, 0))


def contiguous_blocks(names, order, max_gap=2):
    """Number of run-order blocks the names collapse into (gaps of one
    un-flagged query don't break a block: a sub-second query inside a
    noise window can duck the abs gate)."""
    pos = sorted(order[k] for k in names if k in order)
    if not pos:
        return 0
    blocks = 1
    for a, b in zip(pos, pos[1:]):
        if b - a > max_gap:
            blocks += 1
    return blocks


def main(bench_path="bench_out.json", baseline_path="BASELINE.md"):
    bench = load_bench(bench_path)
    base, spread = {}, {}
    for line in open(baseline_path):
        m = re.match(r"\| (\w+) \| ([\d.]+) \| ([\d.]+)", line)
        if m:
            base[m.group(1)] = float(m.group(2))
            spread[m.group(1)] = float(m.group(3))
    qs = {k: v for k, v in bench["queries"].items() if v >= 0}
    shared = sorted(set(qs) & set(base))
    # run order comes from the start timestamps when present — Bench
    # interleaves execution by name-hash (r11), so alphabetical position
    # no longer approximates run position. Without starts, fall back to
    # name order (pre-r11 artifacts, truncated tails).
    starts = bench.get("starts", {})
    if starts and all(k in starts for k in shared):
        run_seq = sorted(shared, key=lambda k: starts[k])
    else:
        run_seq = shared
    order = {k: i for i, k in enumerate(run_seq)}
    suite_ratio = sum(qs[k] for k in shared) / max(sum(base[k] for k in shared), 1e-9)
    print(f"suite: {sum(qs[k] for k in shared):.1f}s vs baseline "
          f"{sum(base[k] for k in shared):.1f}s = {suite_ratio:.2f}x "
          f"over {len(shared)} shared queries")
    missing = sorted(set(qs) - set(base))
    if missing:
        print(f"no baseline row ({len(missing)}): {', '.join(missing)}")
    if bench.get("failed"):
        print(f"FAILED queries (always fatal): {bench['failed']}")
        return 1

    flagged = [k for k in shared if base[k] > 0 and gate(k, base[k], qs[k], spread)]
    if not flagged:
        print("no candidate regressions")
        return 0

    # host-noise layer 1: a whole-suite multiplicative shift. 100+
    # independent queries do not regress by the same factor from a code
    # change — re-gate survivors against the shifted baseline.
    ratios = [qs[k] / base[k] for k in shared if base[k] > 0.05]
    shift = max(statistics.median(ratios), 1.0) if ratios else 1.0
    residual = flagged
    if shift > 1.3:
        print(f"whole-suite shift: median ratio {shift:.2f}x — BASELINE.md's "
              "protocol reads a together-move as host noise; re-gating "
              "against the shifted baseline")
        residual = [k for k in shared
                    if base[k] > 0 and gate(k, base[k] * shift, qs[k], spread)]

    # host-noise layer 2: residual outliers contiguous in run order
    # (the window a background process stole), rest of the suite flat.
    rest = sorted(qs[k] / (base[k] * shift) for k in shared
                  if k not in set(residual) and base[k] > 0.05)
    rest_ok = bool(rest) and rest[len(rest) // 2] < 1.3
    window = (len(residual) >= 3 and rest_ok
              and contiguous_blocks(residual, order) <= 2)
    # a window downgrade (exit 0) must be CORROBORATED by the start
    # timestamps (ADVICE r10 #1): without them, run-order contiguity
    # alone can't rule out a family-wide code regression, so a suspected
    # window is only a warning label on a FAILING exit.
    corroborated = False
    if window and starts and all(k in starts for k in residual):
        span = max(starts[k] for k in residual) - min(starts[k] for k in residual)
        total = (max(starts.values()) - min(starts.values())) or 1.0
        # a "window" covering most of the run is just a slow host for
        # the whole run — layer 1's shift handling owns that story
        if span / total > 0.8 and len(residual) < 0.5 * len(shared):
            window = False
        else:
            corroborated = span / total <= 0.5

    def show(keys, label):
        print(label)
        for k in keys:
            print(f"  {k}: {qs[k]:.2f}s vs {base[k]:.2f}s = {qs[k] / base[k]:.1f}x")

    if not residual:
        show(flagged, "all flags explained by the suite-level shift (host noise):")
        return 0
    if window and corroborated:
        show(residual, "HOST-NOISE WINDOW (contiguous run-time block moved "
             "together inside a bounded wall-clock span, rest of suite "
             "flat; corroborated by start timestamps):")
        return 0
    if window:
        show(residual, "SUSPECTED host-noise window, but NOT corroborated by "
             "start timestamps — could equally be a family-wide code "
             "regression; re-run the block to confirm (exit 1):")
        return 1
    show(residual, "candidate regressions (profile in-round before shipping):")
    return 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
