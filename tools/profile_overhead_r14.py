"""Round-14 fixed-overhead profile for the bench tail (VERDICT r13 #1).

~310 registry keys measure < 0.7 s at sf0.1 and sum to ~107 s — the
driver's own 8-vs-32-core scaling block says the fleet is per-job
overhead bound, not compute bound. Before changing any mechanism this
profiles WHERE a tail key's wall time goes:

  construct  fn(spark, sf_dir)        — Python plan building, py4j trips
  analyze    df.schema                — analysis (driver, JVM)
  execute    noop write               — optimize + AQE stage jobs + tasks

plus per-execution job/stage/task counts from the StatusTracker, and two
synthetic floors measured in the same session:

  action_floor   noop write of spark.range(1)          (1 job, 1 task)
  shuffle_floor  noop write of range->repartition(n)   (adds 1 exchange)

Usage: python tools/profile_overhead_r14.py [key ...]   (default: a
representative tail sample). Prints one JSON line per key to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_cnpjs_spark.plans import QUERIES  # noqa: E402
from etl_cnpjs_spark.session import get_spark  # noqa: E402

DEFAULT_KEYS = [
    "agg_count_by",        # groupBy agg, 2 exchanges
    "window_rank",         # window over one exchange
    "fn_regexp",           # pure map, no shuffle
    "set_except_all",      # set op
    "events_gap_detect",   # window + filter
    "join_asof_nearest",   # range-ish join
    "agg_decay_sum",       # small agg
    "sql_scalar_subquery", # subquery planning
    "text_langid_confidence",
    "dq_check",
]


def _counts(sc, group):
    tracker = sc.statusTracker()
    jobs = tracker.getJobIdsForGroup(group)
    n_stages = 0
    n_tasks = 0
    for j in jobs:
        info = tracker.getJobInfo(j)
        if info is None:
            continue
        for s in info.stageIds:
            si = tracker.getStageInfo(s)
            if si is not None:
                n_stages += 1
                n_tasks += si.numTasks
    return len(jobs), n_stages, n_tasks


def profile_key(spark, key, sf_dir, reps=5):
    sc = spark.sparkContext
    fn = QUERIES[key].fn
    rows = []
    for i in range(reps):
        group = f"prof-{key}-{i}"
        sc.setJobGroup(group, key)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.schema  # force analysis
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        jobs, stages, tasks = _counts(sc, group)
        rows.append(
            {
                "construct": round(t1 - t0, 4),
                "analyze": round(t2 - t1, 4),
                "execute": round(t3 - t2, 4),
                "total": round(t3 - t0, 4),
                "jobs": jobs,
                "stages": stages,
                "tasks": tasks,
            }
        )
        sc.setJobGroup("", "")
    # median by total
    rows.sort(key=lambda r: r["total"])
    med = rows[(len(rows) - 1) // 2]
    return {"key": key, "median": med, "reps": rows}


def floors(spark, reps=5):
    out = {}
    sc = spark.sparkContext
    n = sc.defaultParallelism
    for name, mk in [
        ("action_floor", lambda: spark.range(1)),
        ("action_floor_32task", lambda: spark.range(1 << 20, numPartitions=n)),
        ("shuffle_floor", lambda: spark.range(1 << 20, numPartitions=n).repartition(n)),
        ("agg_floor", lambda: mk_agg(spark, n)),
    ]:
        ts = []
        for i in range(reps):
            group = f"floor-{name}-{i}"
            sc.setJobGroup(group, name)
            df = mk()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
            jobs, stages, tasks = _counts(sc, group)
            sc.setJobGroup("", "")
        ts.sort()
        out[name] = {
            "median_sec": round(ts[(len(ts) - 1) // 2], 4),
            "jobs": jobs,
            "stages": stages,
            "tasks": tasks,
        }
    return out


def mk_agg(spark, n):
    from pyspark.sql import functions as F

    return (
        spark.range(1 << 20, numPartitions=n)
        .groupBy((F.col("id") % 97).alias("k"))
        .count()
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    keys = sys.argv[1:] or DEFAULT_KEYS
    spark = get_spark("overhead-profile-r14")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup
    try:
        QUERIES["flagship"].fn(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:
        pass
    print(json.dumps({"floors": floors(spark)}), flush=True)
    for key in keys:
        if key not in QUERIES:
            print(json.dumps({"key": key, "err": "unknown"}), flush=True)
            continue
        try:
            print(json.dumps(profile_key(spark, key, sf_dir)), flush=True)
        except Exception as exc:
            print(json.dumps({"key": key, "err": str(exc)[:200]}), flush=True)


if __name__ == "__main__":
    main()
