"""Cross-round bench comparison, canary-normalized.

Usage:
    python tools/bench_compare.py BENCH_rA.json BENCH_rB.json [threshold]

Reads two committed BENCH_r*.json lines, divides every shared per-key
timing in B by its twin in A (raw ratio), then divides that by the
box_canary ratio (duckdb_agg_30m medians, falling back to raw when
either round predates the canary) — the normalized ratio is the
engine-attributable movement. Prints keys whose normalized ratio
exceeds the threshold (default 1.5) in either direction, plus the
totals and canary row. The r9 NOTES reading rule in one tool: a drift
the canary does not explain is engine signal, everything else is box.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    d = json.load(open(path))
    return d.get("parsed", d)


def main() -> int:
    a, b = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    ca = (a.get("box_canary") or {}).get("duckdb_agg_30m")
    cb = (b.get("box_canary") or {}).get("duckdb_agg_30m")
    box = (cb / ca) if ca and cb else None
    ta, tb = a.get("total_queries_sec"), b.get("total_queries_sec")
    tot_raw = f"raw {tb / ta:.2f}x" if ta and tb else "raw n/a"
    print(
        f"totals: {ta} -> {tb} s ({tot_raw})"
        + (f"; box canary {ca} -> {cb} s ({box:.2f}x)" if box else
           "; no canary in one side — raw ratios only")
    )
    qa, qb = a.get("queries", {}), b.get("queries", {})
    rows = []
    for k in sorted(set(qa) & set(qb)):
        if qa[k] <= 0 or qb[k] <= 0:
            continue
        raw = qb[k] / qa[k]
        norm = raw / box if box else raw
        if norm > thr or norm < 1 / thr:
            rows.append((norm, raw, k))
    if not rows:
        print(f"no shared key moved beyond {thr}x after normalization")
        return 0
    for norm, raw, k in sorted(rows, reverse=True):
        print(f"  {k}: {qa[k]:.2f} -> {qb[k]:.2f} s  raw {raw:.2f}x  norm {norm:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
