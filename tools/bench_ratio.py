#!/usr/bin/env python3
"""Per-query ratio table between two Bench full-JSON dumps.

Usage: bench_ratio.py <base.json> <scaled.json> [threshold]
Prints a markdown table of every query with ratio >= threshold (default
4.0) plus summary stats — the SCALE.md one-decade-up audit (round-10
verdict item 2). Queries failing in either run are listed separately.
"""
import json
import statistics
import sys


def main() -> None:
    base = json.load(open(sys.argv[1]))
    scaled = json.load(open(sys.argv[2]))
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 4.0
    bq, sq = base["queries"], scaled["queries"]
    shared = sorted(set(bq) & set(sq))
    fails = sorted(set(base.get("failures", {})) | set(scaled.get("failures", {})))
    ratios = {k: (sq[k] / bq[k] if bq[k] > 0 else float("inf"))
              for k in shared if k not in fails}
    rs = sorted(ratios.values())
    print(f"shared={len(shared)} failures={len(fails)} "
          f"median_ratio={statistics.median(rs):.2f} "
          f"p90={rs[int(len(rs) * 0.9)]:.2f} "
          f"total {base['value']:.1f}s -> {scaled['value']:.1f}s "
          f"({scaled['value'] / base['value']:.2f}x)")
    print(f"\n| query | {base['sf']} s | {scaled['sf']} s | ratio |")
    print("|---|---|---|---|")
    for k in sorted(ratios, key=lambda k: -ratios[k]):
        if ratios[k] >= threshold:
            print(f"| {k} | {bq[k]:.2f} | {sq[k]:.2f} | {ratios[k]:.1f} |")
    if fails:
        print("\nfailures (either run):")
        for k in fails:
            msg = scaled.get("failures", {}).get(k) or base.get("failures", {}).get(k)
            print(f"- {k}: {msg}")


if __name__ == "__main__":
    main()
