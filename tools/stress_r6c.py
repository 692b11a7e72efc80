"""Round-6 session-3 10× stress: measured-vs-predicted scaling for the
new plan shapes added this session.

Shapes measured (replication axis probes the DOCUMENTED cost driver):

1. text_novelty — 10× docs as exact replicas (shifted doc_id): the
   postings frame grows 10×; the claim under test is LINEARITY (the
   one-exchange min/join-back shape, no posting self-join). Predicted:
   wall ~linear, never quadratic.
2. agg_bootstrap_ci — 10× events: the ×32 replicate fan-out is
   scan-side and partial-aggregated, so the (type, rep) exchange is
   CONSTANT width (|types|·32 rows per task). Predicted: wall ∝ scan.
3. events_interval_merge — 10× events via user_id offsets (disjoint
   users): one user-keyed exchange, windows are per-partition linear.
   Predicted: linear.
4. embedding_pq — 10× vectors (shifted vec_id, codebook PINNED to the
   original 4 seeds): 32 narrow rows per vector, one vec-keyed
   exchange. Predicted: linear.

Usage: python tools/stress_r6c.py  (writes /tmp/stress_r6c.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_cnpjs_spark.catalog import table  # noqa: E402
from etl_cnpjs_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
K = 10


def replicate(df, key_cols: dict[str, int], k: int):
    r = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_rep")
    out = df.select("*", r)
    for col, off in key_cols.items():
        out = out.withColumn(col, F.col(col) + F.col("_rep") * F.lit(off))
    return out.drop("_rep")


def timed(fn):
    t0 = time.time()
    n = fn()
    return round(time.time() - t0, 2), n


def novelty_shape(docs):
    from etl_cnpjs_spark.functions.text import shingles, tokens

    sh = docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", shingles(tokens(F.col("text"))).alias("sh")
    )
    e = sh.filter(F.size("sh") > 0).select("doc_id", F.explode("sh").alias("s"))
    firsts = e.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    j = e.join(firsts, "s")
    out = j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(F.col("first_doc") < F.col("doc_id"), 1).otherwise(0)).alias(
            "n_seen"
        ),
    )
    return out.count()


def bootstrap_shape(ev):
    from etl_cnpjs_spark.plans.extended11 import _BOOT_KNUTH, _BOOT_MOD, _boot_w

    h = f"((event_id * {_BOOT_KNUTH} + rep * 97) % {_BOOT_MOD})"
    w = ev.select(
        "event_type",
        F.expr("explode(sequence(1, 32))").alias("rep"),
        "event_id",
        F.floor(F.col("value") * 1000000 + 0.5).cast("bigint").alias("x_micro"),
    ).select("event_type", "rep", F.expr(_boot_w(h)).alias("w"), "x_micro")
    rm = w.groupBy("event_type", "rep").agg(
        F.expr("sum(w * x_micro) DIV greatest(sum(w), 1)").alias("m")
    )
    return rm.count()


def interval_shape(ev):
    e = ev.select(
        "user_id",
        F.unix_timestamp("ts").cast("bigint").alias("s"),
        (F.unix_timestamp("ts").cast("bigint") + 300).alias("f"),
        "event_id",
    )
    ws = W.partitionBy("user_id").orderBy("s", "event_id")
    m = e.withColumn(
        "pmf", F.max("f").over(ws.rowsBetween(W.unboundedPreceding, -1))
    ).withColumn(
        "ni",
        F.when(F.col("pmf").isNull() | (F.col("s") > F.col("pmf")), 1).otherwise(0),
    ).withColumn("isl", F.sum("ni").over(ws.rowsBetween(W.unboundedPreceding, 0)))
    return m.groupBy("user_id", "isl").agg(F.count(F.lit(1)).alias("n")).count()


def pq_shape(vecs, seeds):
    from etl_cnpjs_spark.operators.similarity import dot

    sub = F.expr("explode(sequence(0, 7))").alias("s")
    exp = vecs.select("vec_id", "v", sub).crossJoin(F.broadcast(seeds))
    va = F.expr("slice(v, s * 8 + 1, 8)")
    vb = F.expr("slice(cv, s * 8 + 1, 8)")
    dist = dot(va, va) - 2 * dot(va, vb) + dot(vb, vb)
    d = exp.select(
        "vec_id", "s", "cid",
        F.floor(dist * 1000000 + 0.5).cast("bigint").alias("dm"),
    )
    best = d.select(
        "vec_id", "s", "cid",
        F.row_number().over(W.partitionBy("vec_id", "s").orderBy("dm", "cid"))
        .alias("rk"),
    ).filter(F.col("rk") == 1)
    return best.groupBy("vec_id").agg(F.count(F.lit(1)).alias("n")).count()


def main():
    spark = get_spark("stress-r6c", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    from etl_cnpjs_spark.operators.similarity import vec_double

    docs = table(spark, SF_DIR, "documents").localCheckpoint()
    ev = table(spark, SF_DIR, "events").localCheckpoint()
    vecs = (
        table(spark, SF_DIR, "embeddings")
        .select("vec_id", vec_double(F.col("embedding")).alias("v"))
        .localCheckpoint()
    )
    seeds = (
        vecs.filter(F.col("vec_id") < 4)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
        .localCheckpoint()
    )

    results = {}

    d10 = replicate(docs, {"doc_id": 1_000_000}, K).localCheckpoint()
    w1, n1 = timed(lambda: novelty_shape(docs))
    w10, n10 = timed(lambda: novelty_shape(d10))
    results["text_novelty"] = {"wall_1x": w1, "wall_10x": w10,
                               "docs_1x": n1, "docs_10x": n10}

    e10 = replicate(ev, {"user_id": 1_000_000, "event_id": 100_000_000}, K
                    ).localCheckpoint()
    w1, n1 = timed(lambda: bootstrap_shape(ev))
    w10, n10 = timed(lambda: bootstrap_shape(e10))
    results["agg_bootstrap_ci"] = {"wall_1x": w1, "wall_10x": w10,
                                   "cells_1x": n1, "cells_10x": n10}

    w1, n1 = timed(lambda: interval_shape(ev))
    w10, n10 = timed(lambda: interval_shape(e10))
    results["events_interval_merge"] = {"wall_1x": w1, "wall_10x": w10,
                                        "islands_1x": n1, "islands_10x": n10}

    v10 = replicate(vecs, {"vec_id": 10_000_000}, K).localCheckpoint()
    w1, n1 = timed(lambda: pq_shape(vecs, seeds))
    w10, n10 = timed(lambda: pq_shape(v10, seeds))
    results["embedding_pq"] = {"wall_1x": w1, "wall_10x": w10,
                               "vecs_1x": n1, "vecs_10x": n10}

    print(json.dumps(results, indent=2))
    with open("/tmp/stress_r6c.json", "w") as f:
        json.dump(results, f)


if __name__ == "__main__":
    main()
