"""Compare a bench run's per-query floors (`queries_min`) against the
committed floor-record base (default BENCH_LOCAL_r15.json, the 85.11
floor-sum record) — the round-end discipline check: no query >1.2× its
floor without a source-change explanation in NOTES.

Usage: python tools/floor_compare.py RUN.json [BASE.json]
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    run = json.load(open(sys.argv[1]))
    base_path = (
        sys.argv[2] if len(sys.argv) > 2 else "BENCH_LOCAL_r15.json"
    )
    base = json.load(open(base_path))
    run_min = run["queries_min"]
    base_min = base["queries_min"]
    # ADVICE r17: skip zero base floors (a 0.0 would ZeroDivisionError
    # and carries no signal) and use the true median for even-sized
    # ratio sets instead of the upper element
    common = sorted(
        q
        for q in set(run_min) & set(base_min)
        if base_min[q] > 0
    )
    skipped = sorted(
        q
        for q in set(run_min) & set(base_min)
        if base_min[q] <= 0
    )
    if skipped:
        print(f"skipped (base floor 0): {skipped}")
    # ADVICE r18: an empty intersection (wrong base file, renamed
    # queries) would StatisticsError on median([]) and ZeroDivision on
    # the floor-sum ratio — fail with a message instead
    if not common:
        print(
            f"no comparable queries: run={sys.argv[1]} and "
            f"base={base_path} share no names with a nonzero base "
            "floor — wrong base file?"
        )
        raise SystemExit(2)
    ratios = {q: run_min[q] / base_min[q] for q in common}
    med = statistics.median(ratios.values())
    fs_run = sum(run_min[q] for q in common)
    fs_base = sum(base_min[q] for q in common)
    print(
        f"common={len(common)} floor-sum {fs_run:.2f} vs "
        f"{fs_base:.2f} = {fs_run / fs_base:.3f}  "
        f"median per-query floor ratio {med:.3f}"
    )
    print(
        f"canary {run.get('canary_ratio')} mc "
        f"{run.get('canary_mc_ratio')} median-sum {run.get('value')}"
    )
    flagged = {q: r for q, r in ratios.items() if r > 1.2}
    for q, r in sorted(flagged.items(), key=lambda kv: -kv[1]):
        print(
            f"  OVER  {q}: {run_min[q]:.3f} vs {base_min[q]:.3f} "
            f"= {r:.2f}x"
        )
    best = sorted(ratios.items(), key=lambda kv: kv[1])[:5]
    for q, r in best:
        print(
            f"  best  {q}: {run_min[q]:.3f} vs {base_min[q]:.3f} "
            f"= {r:.2f}x"
        )


if __name__ == "__main__":
    main()
