#!/usr/bin/env python3
"""Diff two bench_history records (graft.Bench full per-query maps).

Usage: python3 tools/bench_diff.py bench_history/r07.json bench_history/r08.json
       [--cold] [--threshold 0.20] [--min-abs 0.15]

Prints per-query deltas exceeding the threshold (relative) AND min-abs
(seconds) — small absolute drifts inside the noise band are suppressed —
plus totals and the queries present on only one side. Exit code 0 always
(reporting, not gating): the judge and PLANS.md interpret the numbers.
"""
import argparse
import json
import sys


def load(path, cold):
    with open(path) as f:
        d = json.load(f)
    key = "cold_per_query" if cold else "per_query"
    m = d.get(key) or d.get("per_query") or {}
    total = d.get("cold_total" if cold else "total")
    if not m and "tail" in d:
        # driver BENCH_r0N.json: a truncated tail of the per_query line —
        # recover whatever complete "name":sec pairs survived
        import re
        m = {k: float(v) for k, v in
             re.findall(r'"(\w+)":(\d+\.\d+)', d["tail"])}
        total = (d.get("parsed") or {}).get("value")
    return {k: v for k, v in m.items() if v >= 0}, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--cold", action="store_true",
                    help="diff the cold (first-pass) map instead of warm")
    ap.add_argument("--threshold", type=float, default=0.20)
    ap.add_argument("--min-abs", type=float, default=0.15)
    args = ap.parse_args()

    old, old_total = load(args.old, args.cold)
    new, new_total = load(args.new, args.cold)
    which = "cold" if args.cold else "warm"

    shared = sorted(set(old) & set(new))
    print(f"[{which}] {args.old}: total={old_total} ({len(old)} queries)  "
          f"{args.new}: total={new_total} ({len(new)} queries)  "
          f"shared={len(shared)}")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"  removed: {', '.join(only_old)}")
    if only_new:
        print(f"  added:   {', '.join(only_new)}")

    moved = []
    for q in shared:
        a, b = old[q], new[q]
        if a <= 0:
            continue
        rel = (b - a) / a
        if abs(rel) >= args.threshold and abs(b - a) >= args.min_abs:
            moved.append((rel, a, b, q))
    moved.sort(reverse=True)
    if not moved:
        print(f"  no per-query moves ≥{args.threshold:.0%} and "
              f"≥{args.min_abs}s — inside the noise band")
    for rel, a, b, q in moved:
        tag = "slower" if rel > 0 else "faster"
        print(f"  {rel:+7.1%}  {a:7.3f}s -> {b:7.3f}s  {q}  ({tag})")

    s_old = sum(old[q] for q in shared)
    s_new = sum(new[q] for q in shared)
    if s_old > 0:
        print(f"  shared-query total: {s_old:.2f}s -> {s_new:.2f}s "
              f"({(s_new - s_old) / s_old:+.1%})")


if __name__ == "__main__":
    main()
