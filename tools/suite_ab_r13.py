"""In-suite A/B for the r12 dedup-family driver-bench regression
(VERDICT r12 item #1, second prong — the isolated grids are
tools/drift_r13.py).

Hypothesis under test: the driver's dedup_minhash 4.92 s median is
SUITE-SESSION STATE (position ~88 of 391 in the alphabetical battery,
after the heavy corpus_* family) rather than the plan — the plan was
diff-clean in r12 and fresh-process isolated medians sit at ~1 s.

Design — ONE session, exactly bench.py's warmup sequence, then:
  arm A ("young"): dedup_minhash x R reps at session age ~0 (memos
      warm, same as the battery's state when it reaches the key —
      minus the 87 preceding keys' session aging).
  aging: the 87 alphabetically-preceding battery keys, 1 rep each —
      reproduces the battery's position-dependent state (AQE plan
      registry, JVM heap/allocator, codegen cache, eviction pressure
      on the memoized localCheckpoint blocks).
  arm B ("aged"): dedup_minhash x R reps again.

Per-arm instrumentation: JVM used heap, cached-block count (block
manager), cumulative executor GC time — so if B >> A the mechanism is
named, not guessed.

Prints one JSON line; appends it to DRIFT_r13.jsonl with
grid="dedup-family-suite-ab".
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def jvm_probe(spark) -> dict:
    jvm = spark.sparkContext._jvm
    rt = jvm.java.lang.Runtime.getRuntime()
    used_mb = int((rt.totalMemory() - rt.freeMemory()) / (1 << 20))
    status = spark.sparkContext.statusTracker()
    try:
        sc = spark.sparkContext._jsc.sc()
        rdd_infos = sc.getRDDStorageInfo()
        cached = sum(1 for r in rdd_infos if r.isCached())
        cached_mb = int(
            sum(r.memSize() + r.diskSize() for r in rdd_infos) / (1 << 20)
        )
    except Exception:
        cached, cached_mb = -1, -1
    _ = status  # reserved
    return {"heap_mb": used_mb, "cached_rdds": cached, "cached_mb": cached_mb}


def run_once(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 4)


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_cnpjs_spark.plans import QUERIES
    from etl_cnpjs_spark.session import get_spark

    spark = get_spark("suite-ab-r13")
    spark.sparkContext.setLogLevel("ERROR")

    # bench.py's exact warmup sequence (flagship smoke + shared memos).
    run_once(spark, QUERIES["flagship"].fn, "/root/testdata/sf0.001")
    from etl_cnpjs_spark.plans.cnpj_parity import ensure_cnpj_env
    from etl_cnpjs_spark.plans.dedup import (
        _banded8x2,
        _doc_shingles,
        _exact_pairs,
    )

    _doc_shingles(spark, sf_dir)
    _exact_pairs(spark, sf_dir)
    ensure_cnpj_env(spark, sf_dir)
    _banded8x2(spark, sf_dir)
    spark.range(1).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    key = "dedup_minhash"
    probe_a0 = jvm_probe(spark)
    arm_a = [run_once(spark, QUERIES[key].fn, sf_dir) for _ in range(reps)]
    probe_a1 = jvm_probe(spark)

    aging_keys = [k for k in sorted(QUERIES) if k < key]
    t0 = time.perf_counter()
    aging_fail = []
    for k in aging_keys:
        try:
            run_once(spark, QUERIES[k].fn, sf_dir)
        except Exception:
            aging_fail.append(k)
    aging_sec = round(time.perf_counter() - t0, 1)

    probe_b0 = jvm_probe(spark)
    arm_b = [run_once(spark, QUERIES[key].fn, sf_dir) for _ in range(reps)]
    probe_b1 = jvm_probe(spark)

    out = {
        "grid": "dedup-family-suite-ab",
        "key": key,
        "sf_dir": sf_dir,
        "arm_a_young": {
            "reps": arm_a,
            "median": round(statistics.median(arm_a), 4),
            "probe_before": probe_a0,
            "probe_after": probe_a1,
        },
        "aging": {
            "keys": len(aging_keys),
            "sec": aging_sec,
            "failed": aging_fail,
        },
        "arm_b_aged": {
            "reps": arm_b,
            "median": round(statistics.median(arm_b), 4),
            "probe_before": probe_b0,
            "probe_after": probe_b1,
        },
    }
    with open(os.path.join(REPO, "DRIFT_r13.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
