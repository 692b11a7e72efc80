"""Round-6 session-2 10× stress: measured-vs-predicted scaling for the
batch-2..6 families that added new plan shapes (the earlier
stress_r6.py covered triangle/image/containment).

Shapes measured (replication axis chosen per family to probe the
DOCUMENTED cost driver, mirroring tools/stress.py):

1. text_lm_train — 10× docs as EXACT replicas (shifted doc_id): the
   bigram vocabulary is CONSTANT, counts grow 10× — the bounded-model
   regime the plan's min-count prune presumes. Predicted: wall ~flat
   (scan-bound), bigram exchange constant-width.
2. events_dau_mau — 10× events via user_id offsets (same day span):
   the distinct (day,user) frame grows 10×, the day grid is constant.
   Predicted: wall ∝ distinct frame (linear), grid join stays
   broadcast.
3. graph_kcore — 10× lineitem with shifted part/supplier keys
   (disjoint subgraphs): edges grow 10×, structure preserved.
   Predicted: linear per peel round, R unchanged.

Usage: python tools/stress_r6b.py  (writes /tmp/stress_r6b.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from etl_cnpjs_spark.catalog import table  # noqa: E402
from etl_cnpjs_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
K = 10


def replicate(df, key_cols: dict[str, int], k: int):
    """k-fold replication, shifting each key column by i·offset."""
    r = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_rep")
    out = df.select("*", r)
    for col, off in key_cols.items():
        out = out.withColumn(col, F.col(col) + F.col("_rep") * F.lit(off))
    return out.drop("_rep")


def timed(fn):
    t0 = time.time()
    n = fn()
    return round(time.time() - t0, 2), n


def lm_train_shape(docs):
    from etl_cnpjs_spark.functions.text import tokens

    d = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select(tokens(F.col("text")).alias("t"))
        .filter(F.size("t") >= 2)
    )
    sz = F.size("t")
    bigram = F.zip_with(
        F.slice(F.col("t"), 1, sz - 1),
        F.slice(F.col("t"), 2, sz - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bc = (
        d.select(F.explode(bigram).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
    )
    return bc.count()


def dau_mau_shape(ev):
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = du.select("day").distinct().select(F.col("day").alias("g"))
    mau = (
        du.join(
            F.broadcast(days),
            (F.col("day") <= F.col("g"))
            & (F.col("day") >= F.date_sub(F.col("g"), 29)),
        )
        .groupBy("g")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return mau.count()


def kcore_shape(li):
    e0 = li.select(
        F.col("l_partkey").alias("u"),
        (F.col("l_suppkey") + F.lit(10_000_000)).alias("v"),
    ).distinct()
    edges = e0.unionAll(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    edges = edges.localCheckpoint()
    for _ in range(4):
        deg = edges.groupBy(F.col("u").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        surv = deg.filter(F.col("deg") >= 8).select("node")
        edges = (
            edges.join(F.broadcast(surv.select(F.col("node").alias("u"))), "u")
            .join(F.broadcast(surv.select(F.col("node").alias("v"))), "v")
            .select("u", "v")
            .localCheckpoint()
        )
    return edges.count()


def main():
    spark = get_spark("stress-r6b", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    docs = table(spark, SF_DIR, "documents").localCheckpoint()
    ev = table(spark, SF_DIR, "events").localCheckpoint()
    li = table(spark, SF_DIR, "lineitem").localCheckpoint()

    results = {}
    d10 = replicate(docs, {"doc_id": 1_000_000}, K).localCheckpoint()
    w1, n1 = timed(lambda: lm_train_shape(docs))
    w10, n10 = timed(lambda: lm_train_shape(d10))
    results["text_lm_train"] = {
        "wall_1x": w1, "wall_10x": w10, "out_1x": n1, "out_10x": n10,
    }

    e10 = replicate(ev, {"user_id": 1_000_000, "event_id": 100_000_000}, K).localCheckpoint()
    w1, n1 = timed(lambda: dau_mau_shape(ev))
    w10, n10 = timed(lambda: dau_mau_shape(e10))
    results["events_dau_mau"] = {
        "wall_1x": w1, "wall_10x": w10, "days_1x": n1, "days_10x": n10,
    }

    l10 = replicate(
        li, {"l_partkey": 10_000_000, "l_suppkey": 1_000_000}, K
    ).localCheckpoint()
    w1, n1 = timed(lambda: kcore_shape(li))
    w10, n10 = timed(lambda: kcore_shape(l10))
    results["graph_kcore"] = {
        "wall_1x": w1, "wall_10x": w10, "core_edges_1x": n1, "core_edges_10x": n10,
    }

    print(json.dumps(results, indent=2))
    with open("/tmp/stress_r6b.json", "w") as f:
        json.dump(results, f)


if __name__ == "__main__":
    main()
