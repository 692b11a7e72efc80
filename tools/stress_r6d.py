"""Round-6 session-3 late-batch 10× stress: HITS, table diff,
Mann–Whitney, vocab coverage.

Axes per family:
1. graph_hits — 10× orders feed a FIXED 500-node space: the edge set
   SATURATES (distinct pairs cap), so wall must go ~flat once the
   dedup absorbs the extra rows. Predicted: ratio ≈ scan cost only.
2. dq_table_diff — 10× disjoint keys both sides: one co-partitioned
   full-outer join. Predicted: linear.
3. events_ab_mannwhitney — 10× events via disjoint user offsets (same
   event_type partitions grow 10×): rank windows are sort-bound per
   partition. Predicted: ~linear (n log n).
4. text_vocab_coverage — 10× docs as replicas: vocab is CONSTANT
   (same top-100), token frame grows 10×. Predicted: linear, vocab
   broadcast unchanged.

Usage: python tools/stress_r6d.py  (writes /tmp/stress_r6d.json)
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10


def replicate(df, key_cols, k):
    r = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_rep")
    out = df.select("*", r)
    for col, off in key_cols.items():
        out = out.withColumn(col, F.col(col) + F.col("_rep") * F.lit(off))
    return out.drop("_rep")


def timed(fn):
    t0 = time.time()
    n = fn()
    return round(time.time() - t0, 2), n


def hits_shape(o):
    N, R = 500, 3
    raw = o.select(
        (F.col("o_orderkey") % N).alias("a"),
        (((F.col("o_orderkey") / N).cast("bigint") * 13
          + (F.col("o_orderkey") % N) * 7 + 1) % N).alias("b"),
    )
    e = raw.filter(F.col("a") != F.col("b")).select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).distinct().localCheckpoint()
    nodes = (e.select(F.col("u").alias("node"))
             .union(e.select(F.col("v").alias("node"))).distinct()
             .localCheckpoint())
    h = nodes.select("node", F.lit(1000000).cast("bigint").alias("h"))
    for _ in range(R):
        ar = (e.join(F.broadcast(h.select(F.col("node").alias("u"), "h")), "u")
              .groupBy(F.col("v").alias("node"))
              .agg(F.sum("h").cast("bigint").alias("s")))
        mx = ar.agg(F.max("s").alias("mx"))
        a = (nodes.join(ar, "node", "left").crossJoin(F.broadcast(mx))
             .select("node", F.expr("coalesce(s,0)*1000000 DIV mx")
                     .cast("bigint").alias("a")).localCheckpoint())
        hr = (e.join(F.broadcast(a.select(F.col("node").alias("v"), "a")), "v")
              .groupBy(F.col("u").alias("node"))
              .agg(F.sum("a").cast("bigint").alias("s")))
        mxh = hr.agg(F.max("s").alias("mx"))
        h = (nodes.join(hr, "node", "left").crossJoin(F.broadcast(mxh))
             .select("node", F.expr("coalesce(s,0)*1000000 DIV mx")
                     .cast("bigint").alias("h")).localCheckpoint())
    return h.count()


def diff_shape(o):
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    v1 = o.select(F.col("o_orderkey").alias("key"), cents.alias("c1"))
    v2 = o.filter(F.col("o_orderkey") % 13 != 0).select(
        F.col("o_orderkey").alias("key"),
        F.when(F.col("o_orderkey") % 7 == 0, cents + 1).otherwise(cents)
        .alias("c2"),
    )
    j = v1.join(v2, "key", "full_outer")
    cls = (F.when(F.col("c1").isNull(), "added")
           .when(F.col("c2").isNull(), "removed")
           .when(F.col("c1") != F.col("c2"), "changed").otherwise("unchanged"))
    return j.select(cls.alias("class")).groupBy("class").count().count()


def mw_shape(ev):
    v = ev.select("event_type", (F.col("user_id") % 2).alias("cohort"), "value")
    r = v.select(
        "event_type", "cohort",
        F.rank().over(W.partitionBy("event_type").orderBy("value")).alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy("event_type", "value")).alias("tc"),
    )
    return r.groupBy("event_type").agg(
        F.sum(F.when(F.col("cohort") == 0, 2 * F.col("rk") + F.col("tc") - 1)
              .otherwise(0)).alias("s2a")).count()


def vocab_shape(docs):
    from etl_cnpjs_spark.functions.text import tokens
    d = docs.filter(F.length(F.trim("text")) > 0)
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    vc = (tok.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
          .orderBy(F.desc("n"), "w").limit(100)
          .select(F.col("w").alias("vw")))
    sc = tok.join(F.broadcast(vc), tok["w"] == vc["vw"], "left").groupBy(
        "doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    return sc.count()


def main():
    spark = get_spark("stress-r6d", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    o = table(spark, SF_DIR, "orders").localCheckpoint()
    ev = table(spark, SF_DIR, "events").localCheckpoint()
    docs = table(spark, SF_DIR, "documents").localCheckpoint()

    results = {}
    o10 = replicate(o, {"o_orderkey": 100_000_000}, K).localCheckpoint()
    w1, n1 = timed(lambda: hits_shape(o))
    w10, n10 = timed(lambda: hits_shape(o10))
    results["graph_hits"] = {"wall_1x": w1, "wall_10x": w10,
                             "nodes_1x": n1, "nodes_10x": n10}

    w1, n1 = timed(lambda: diff_shape(o))
    w10, n10 = timed(lambda: diff_shape(o10))
    results["dq_table_diff"] = {"wall_1x": w1, "wall_10x": w10,
                                "classes_1x": n1, "classes_10x": n10}

    e10 = replicate(ev, {"user_id": 1_000_000, "event_id": 100_000_000},
                    K).localCheckpoint()
    w1, n1 = timed(lambda: mw_shape(ev))
    w10, n10 = timed(lambda: mw_shape(e10))
    results["events_ab_mannwhitney"] = {"wall_1x": w1, "wall_10x": w10,
                                        "types_1x": n1, "types_10x": n10}

    d10 = replicate(docs, {"doc_id": 1_000_000}, K).localCheckpoint()
    w1, n1 = timed(lambda: vocab_shape(docs))
    w10, n10 = timed(lambda: vocab_shape(d10))
    results["text_vocab_coverage"] = {"wall_1x": w1, "wall_10x": w10,
                                      "docs_1x": n1, "docs_10x": n10}

    print(json.dumps(results, indent=2))
    with open("/tmp/stress_r6d.json", "w") as f:
        json.dump(results, f)


if __name__ == "__main__":
    main()
