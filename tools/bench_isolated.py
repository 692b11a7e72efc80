"""Isolated-headline bench: one FRESH vanilla SparkSession per process,
a single query key, warmup + N timed reps. Adjudicates cross-round
in-suite drift (r6 VERDICT item 4): the in-suite number is taken after
~8,000 stages of session aging; this is the same query at stage ~0.

Usage:
    python tools/bench_isolated.py <key> [reps] [sf_dir]

Prints one JSON line {"key":..., "reps":[...], "median":...}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    key = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from etl_cnpjs_spark.plans import QUERIES
    from etl_cnpjs_spark.session import get_spark

    # Same factory as the in-suite bench: the comparison this tool
    # exists for must differ only in session AGE, not in configs
    # (shuffle partitions, driver memory, timezone, AQE).
    spark = get_spark(app_name=f"bench-isolated-{key}")
    spark.sparkContext.setLogLevel("ERROR")

    fn = QUERIES[key].fn
    # one untimed warmup (JVM/codegen/read-footer costs are session
    # constants the in-suite number also excludes for non-first keys)
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 4))
    print(
        json.dumps(
            {
                "key": key,
                "sf_dir": sf_dir,
                "reps": out,
                "median": round(statistics.median(out), 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
