"""Dump .explain("formatted") for one or more registry keys.

Usage:
    python tools/explain_key.py <key> [key ...] [--sf SF_DIR] [--out DIR]

Writes <out>/<key>.txt (default stdout when no --out). One vanilla-config
engine session per process (same factory as bench.py), so plan shapes
match what the bench executes. Explain output is the INITIAL AQE plan
(isFinalPlan=false) — runtime re-optimizations (coalescing, broadcast
promotion) are not in it, which is fine for the shape claims these files
back (exchange count, join strategy, PushedFilters, Python eval nodes).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = None
    keys = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--out":
            out_dir = args[i + 1]
            i += 2
        else:
            keys.append(args[i])
            i += 1

    from etl_cnpjs_spark.plans import QUERIES
    from etl_cnpjs_spark.session import get_spark

    spark = get_spark(app_name="explain-key")
    spark.sparkContext.setLogLevel("ERROR")
    for key in keys:
        df = QUERIES[key].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(out_dir, f"{key}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path}")
        else:
            print(f"===== {key} =====")
            print(txt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
