"""Round-12 scaling measurement: the two nearest-centroid assignment
shapes (SCALE.md "Nearest-centroid assignment").

The r12 A/B picked per-site forms on wall-time grids at fixed sizes;
this measures the claimed GROWTH LAWS behind that decision:

- form (a) array_max-lambda (zero exchange, interpreted per-row
  struct-array eval)           — _label_centroid_assignment's shape
- form (b) crossJoin + groupBy(vec_id).max_by (map-side argmax, one
  thin exchange of n rows, codegen cosine) — sim_topk_ivf's shape

Axes: (n, k) -> (10n, k) pins linearity in corpus size at fixed
centroid count; (n, k) -> (n, 10k) shows the per-row k-cost where the
two forms genuinely differ (interpreted lambda vs codegen agg).

Usage: python tools/stress_r12.py   (writes nothing outside /tmp,
prints one JSON line; vectors replicated from sf0.1 embeddings with
shifted ids so value distribution is real, not synthetic)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_cnpjs_spark.catalog import table  # noqa: E402
from etl_cnpjs_spark.operators.similarity import cosine, vec_double  # noqa: E402
from etl_cnpjs_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
ID_STRIDE = 100_000_000


def replicate(df, k: int):
    parts = [
        df.withColumn("vec_id", F.col("vec_id") + i * ID_STRIDE) for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def centroids(n, k: int):
    # deterministic k-subset: smallest k vec_ids (the IVF pattern with
    # CENTROID_MOD replaced by an explicit count so k is a free axis)
    return (
        n.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )


def assign_maxby(n, c):
    score = F.struct(
        cosine(F.col("v"), F.col("cv")).alias("cos"),
        (-F.col("cid")).alias("ncid"),
    )
    return (
        n.crossJoin(F.broadcast(c))
        .groupBy("vec_id")
        .agg(F.max_by(F.col("cid"), score).alias("cid"))
    )


def assign_lambda(n, c):
    call = c.agg(F.collect_list(F.struct("cid", "cv")).alias("__cs"))
    best = F.array_max(
        F.transform(
            F.col("__cs"),
            lambda s: F.struct(
                cosine(F.col("v"), s.cv).alias("cos"),
                (-s.cid).alias("ncid"),
            ),
        )
    )
    return n.crossJoin(F.broadcast(call)).select(
        "vec_id", (-best.getField("ncid")).alias("cid")
    )


def timed(fn):
    t0 = time.time()
    rows = fn()
    return round(time.time() - t0, 2), rows


def main() -> int:
    spark = get_spark(app_name="stress_r12")
    base = table(spark, SF_DIR, "embeddings").select(
        "vec_id", vec_double(F.col("embedding")).alias("v")
    )
    n1 = base.localCheckpoint()
    n10 = replicate(base, 10).localCheckpoint()
    out = {"n1": n1.count(), "n10": n10.count(), "points": {}}
    grid = [
        ("n1_k64", n1, 64),
        ("n10_k64", n10, 64),
        ("n1_k640", n1, 640),
    ]
    for name, n, k in grid:
        c = centroids(n, k).localCheckpoint()  # exclude centroid build
        for form, builder in (("maxby", assign_maxby), ("lambda", assign_lambda)):
            sec, rows = timed(
                lambda b=builder, nn=n, cc=c: (
                    b(nn, cc).agg(
                        F.count(F.lit(1)).alias("n"),
                        F.sum("cid").alias("chk"),
                    )
                ).collect()[0]["n"]
            )
            out["points"][f"{name}_{form}"] = {"sec": sec, "rows": rows}
    # value identity of the two forms at every grid point is pinned by
    # tests/test_plans.py tie fences; here assert the cheap invariant
    for name, n, k in grid:
        a = out["points"][f"{name}_maxby"]["rows"]
        b = out["points"][f"{name}_lambda"]["rows"]
        assert a == b, (name, a, b)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
