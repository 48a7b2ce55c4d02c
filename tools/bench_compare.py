#!/usr/bin/env python3
"""Compare two archived bench draws per-query.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [threshold]

Accepts either format found under docs/bench/:
  - the per-query file graft.Bench writes to target/bench_last.json
    ({"queries": {name: {"median": s, ...}}, ...}), or
  - the driver's BENCH_rNN.json wrapper (totals only, per-query data
    in the embedded stdout tail) — wrapper inputs degrade to a
    total-level compare.

Prints every query whose median moved more than `threshold` (default
1.5x in either direction, min 0.1 s absolute), worst regressions first,
then the totals. Exit 0 always — this is an attribution report, not a
gate (the sandbox host's throughput fluctuates; medians of 3 still
carry noise).
"""
import json
import re
import sys


def load(path):
    d = json.load(open(path))
    if "queries" in d and isinstance(d["queries"], dict):
        qs = {k: v.get("median", v) if isinstance(v, dict) else v
              for k, v in d["queries"].items()}
        return qs, float(d.get("value", sum(qs.values())))
    # driver wrapper: only the total line survives in the tail
    tail = d.get("tail", "")
    m = re.findall(r'\{"metric":"total","value":([0-9.]+)', tail)
    total = float(m[-1]) if m else None
    if total is None and isinstance(d.get("parsed"), dict):
        total = float(d["parsed"].get("value", 0))
    return {}, total


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old_q, old_total = load(old_path)
    new_q, new_total = load(new_path)
    if old_q and new_q:
        moved = []
        for name in sorted(set(old_q) | set(new_q)):
            a, b = old_q.get(name), new_q.get(name)
            if a is None:
                print(f"NEW       {name}: {b:.3f}s")
                continue
            if b is None:
                print(f"REMOVED   {name} (was {a:.3f}s)")
                continue
            if max(a, b) < 0.1:
                continue
            r = b / a if a > 0 else float("inf")
            if r > ratio or r < 1 / ratio:
                moved.append((r, name, a, b))
        for r, name, a, b in sorted(moved, reverse=True):
            tag = "SLOWER" if r > 1 else "faster"
            print(f"{tag:9s} {name}: {a:.3f}s -> {b:.3f}s ({r:.2f}x)")
        if not moved:
            print(f"no per-query median moved beyond {ratio}x")
        # always name the top-10 regressions, threshold or not, so a
        # round's verdict can attribute drift mechanically even when
        # every mover sits under the noise bar
        both = [(b / a, n, a, b) for n in set(old_q) & set(new_q)
                for a, b in [(old_q[n], new_q[n])] if a > 0 and max(a, b) >= 0.1]
        print("-- top-10 regressions (any size):")
        for r, name, a, b in sorted(both, reverse=True)[:10]:
            print(f"   {name}: {a:.3f}s -> {b:.3f}s ({r:.2f}x)")
    else:
        print("per-query data missing on one side; totals only")
    if old_total is not None and new_total is not None:
        print(f"total: {old_total:.3f}s -> {new_total:.3f}s "
              f"({new_total / old_total:.2f}x)")


if __name__ == "__main__":
    main()
