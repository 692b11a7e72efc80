"""Round-6 session-4 10x stress: measured-vs-predicted scaling for the
session's two heavy shapes.

1. text_exact_substr_spans — 10x docs as shifted-id replicas. NOTE the
   replication SATURATES duplication (every gram now occurs 10 times),
   so this probes the worst case: postings 10x AND every position
   survives the dup filter into the islands merge. The claim under
   test is linearity of the no-join shape (count window + islands);
   predicted wall ~linear in postings, output spans ~10x docs.
2. graph_random_walk — 10x edges as node-shifted DISJOINT copies:
   frontier and per-step join volume grow 10x, walk depth fixed at 3.
   Predicted: linear (the frontier never branches — argmin fan-out 1).

Usage: python tools/stress_r6e.py  (writes /tmp/stress_r6e.json)
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


def substr_shape(docs, k: int = 8):
    toks = F.split(F.trim("text"), r"\s+")
    d = docs.select("doc_id", toks.alias("toks"))
    ngrams = F.slice(F.col("toks"), 1, F.greatest(F.size("toks") - (k - 1), F.lit(0)))
    for i in range(1, k):
        part = F.slice(F.col("toks"), i + 1, F.greatest(F.size("toks") - (k - 1), F.lit(0)))
        ngrams = F.zip_with(ngrams, part, lambda a, b: F.concat_ws(" ", a, b))
    g = (
        d.filter(F.size("toks") >= k)
        .select("doc_id", F.posexplode(ngrams).alias("pos0", "gram"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    )
    dup = (
        g.withColumn("c", F.count(F.lit(1)).over(W.partitionBy("gram")))
        .filter(F.col("c") >= 2)
        .select("doc_id", "pos")
    )
    isl = dup.withColumn(
        "grp", F.col("pos") - F.row_number().over(W.partitionBy("doc_id").orderBy("pos"))
    )
    return (
        isl.groupBy("doc_id", "grp")
        .agg(F.min("pos").alias("a"), F.max("pos").alias("b"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .count()
    )


def walk_shape(edges, steps: int = 3):
    cur = edges.select(F.col("a").alias("node")).distinct()
    carried = ["node"]
    for t in range(1, steps + 1):
        pos = carried[-1]
        key = F.concat(
            F.md5(F.concat_ws("|", F.lit(str(t)), F.col(pos).cast("string"), F.col("b").cast("string"))),
            F.lpad(F.col("b").cast("string"), 20, "0"),
        )
        cur = (
            cur.join(edges, cur[pos] == edges["a"])
            .groupBy(*carried)
            .agg(F.min_by("b", key).alias(f"step{t}"))
        )
        carried.append(f"step{t}")
    return cur.count()


def main():
    spark = get_spark()
    docs = table(spark, SF_DIR, "documents").localCheckpoint()
    d10 = replicate(docs, {"doc_id": 10_000_000}, K).localCheckpoint()

    results = {}
    w1, n1 = timed(lambda: substr_shape(docs))
    w10, n10 = timed(lambda: substr_shape(d10))
    results["text_exact_substr_spans"] = {
        "wall_1x": w1, "wall_10x": w10, "spans_1x": n1, "spans_10x": n10,
    }

    # apply step: span-cut cleaned corpus (anti-join + ordered agg)
    from etl_cnpjs_spark.plans.extended12 import exact_substr_spans

    def clean_shape(docs):
        spans = exact_substr_spans(docs.select("doc_id", "text"), k=8)
        cut = spans.select(
            "doc_id",
            F.explode(F.sequence(F.col("start_tok"), F.col("end_tok"))).alias("pos"),
        )
        tok = docs.select(
            "doc_id", F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos0", "tok")
        ).select("doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "tok")
        kept = tok.join(cut, ["doc_id", "pos"], "left_anti")
        return kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).count()

    w1, n1 = timed(lambda: clean_shape(docs))
    w10, n10 = timed(lambda: clean_shape(d10))
    results["corpus_substr_clean"] = {
        "wall_1x": w1, "wall_10x": w10, "docs_kept_1x": n1, "docs_kept_10x": n10,
    }

    from etl_cnpjs_spark.plans.dedup import _exact_pairs

    pairs = _exact_pairs(spark, SF_DIR).select("i", "j").localCheckpoint()
    edges = pairs.select(F.col("i").alias("a"), F.col("j").alias("b")).unionAll(
        pairs.select(F.col("j").alias("a"), F.col("i").alias("b"))
    ).localCheckpoint()
    e10 = replicate(edges, {"a": 10_000_000, "b": 10_000_000}, K).localCheckpoint()
    w1, n1 = timed(lambda: walk_shape(edges))
    w10, n10 = timed(lambda: walk_shape(e10))
    results["graph_random_walk"] = {
        "wall_1x": w1, "wall_10x": w10, "nodes_1x": n1, "nodes_10x": n10,
    }

    print(json.dumps(results, indent=2))
    with open("/tmp/stress_r6e.json", "w") as f:
        json.dump(results, f)


if __name__ == "__main__":
    main()
