"""Benchmark runner — the driver's per-round feedback loop.

Runs every registered plan at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit", "queries" (per-query sec),
"sf"}.

Timing attribution note: a few expensive frames are memoized per
session (shingles, exact-Jaccard pairs — plans/dedup.py); alphabetical
order means the FIRST consumer (corpus_curate) absorbs that shared cost
and later dedup plans time near zero. Compare the family's sum across
rounds, not single keys.

Each query is fully materialized through the noop DataSourceV2 sink —
every operator executes, nothing collects to the driver (the 100 TB
posture: the "fetch" is a distributed write, never collect();
SURVEY.md §2.1 O17).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_cnpjs_spark.plans import QUERIES  # noqa: E402
from etl_cnpjs_spark.session import get_spark  # noqa: E402


def run_once(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    if df.isStreaming:
        raise ValueError("bench only runs batch plans")
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    spark = get_spark("etl-cnpjs-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on the smallest SF so per-query numbers measure the
    # plan, not JIT compilation of whole-stage codegen.
    try:
        run_once(spark, QUERIES["flagship"].fn, "/root/testdata/sf0.001")
    except Exception:
        pass

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        try:
            timings[name] = round(run_once(spark, QUERIES[name].fn, sf_dir), 4)
        except Exception as exc:  # a failing query must not hide the rest
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "total_wall_sec_all_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
