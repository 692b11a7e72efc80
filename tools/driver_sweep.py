"""Full-registry driver-contract sweep.

Simulates the round driver's CORRECTNESS harness over EVERY registered
key (the driver itself only sees a ~50-key window per round): a VANILLA
SparkSession (no engine configs — sharp edge #4 in NOTES.md), each
queries() entry executed at sf0.01, the oracle_sql() twin run in DuckDB
over the same parquet views, compared with the strict order-insensitive
full-precision harness in tests/compare.py (stricter than the driver's
hash — if this passes, the hash passes).

Usage:
    python tools/driver_sweep.py [sf_dir] [key ...]

With no keys, sweeps the whole registry in registration order (i.e. the
exact prefix order the driver will sample). Writes a summary JSON to
/tmp/driver_sweep.json and prints one line per key.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    os.environ.setdefault("SPARK_GRAFT_TEST_SF_DIR", sf_dir)

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from compare import assert_frames_match

    # Vanilla session: the driver sets no engine configs.
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver-sweep")
        .getOrCreate()
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    results: dict[str, dict] = {}
    n_pass = n_rows_only = n_fail = 0
    for i, (key, fn) in enumerate(qs.items()):
        if only and key not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            if key in oracles:
                odf = con.execute(oracles[key]).fetchdf()
                assert_frames_match(sdf, odf, key)
                status = "PASS"
                n_pass += 1
            else:
                assert len(sdf) >= 0
                status = "rows_only"
                n_rows_only += 1
            err = None
        except Exception:
            status = "FAIL"
            n_fail += 1
            err = traceback.format_exc(limit=8)
        dt = time.time() - t0
        results[key] = {"status": status, "sec": round(dt, 2), "err": err}
        print(f"[{i + 1}/{len(qs)}] {key}: {status} ({dt:.1f}s)", flush=True)
        if err:
            print(err, flush=True)

    summary = {
        "sf_dir": sf_dir,
        "pass": n_pass,
        "rows_only": n_rows_only,
        "fail": n_fail,
        "results": results,
    }
    with open("/tmp/driver_sweep.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(
        f"SWEEP: {n_pass} pass, {n_rows_only} rows-only, {n_fail} FAIL "
        f"-> /tmp/driver_sweep.json",
        flush=True,
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
