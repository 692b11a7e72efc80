"""Round-7 10x stress: measured-vs-predicted scaling for the
session-3/4 statistical families the SCALE.md table didn't yet cover
(r6 VERDICT item 6).

1. agg_target_encode — category-window growth on the SKEW axis: 10x
   rows into the SAME 5 categories, so each window partition grows 10x
   while the partition COUNT stays 5 (the worst case for a
   partitionBy(category) window: parallelism is bounded by |categories|,
   the known bounded-category story in the plan docstring). Predicted:
   linear wall in rows, concentrated in <=5 tasks.
2. agg_cuped — user-grain exchange: 10x events as user-shifted copies
   (user frame 10x, per-user row count unchanged). Predicted: linear on
   the one user-keyed exchange; the sufficient-stats reduce stays 1 row.
3. events_did — same 10x events but SAME users (per-user growth): the
   4-cell aggregate absorbs everything map-side. Predicted: scan-bound,
   exchange width constant (4 cells).
4. graph_random_walk — 10x DENSITY (not disjoint copies, the r6
   verdict's explicit ask): same node set, 10x edges via modular
   j-rotations, so average degree grows 10x. Frontier stays |nodes|;
   each step's join OUTPUT grows 10x before min_by collapses it back.
   Predicted: linear in join volume (the bounded cost named in the
   plan docstring), fan-out still 1 after argmin.
5. text_js_divergence (post r6-fix form: broadcast scalar, no eager
   collect) — 10x docs as exact replicas: token volume 10x, vocab
   width CONSTANT, so the one hash(token) exchange carries the same
   distinct keys with 10x map-side-combined counts. Predicted:
   linear token pass, exchange width flat.

Usage: python tools/stress_r7.py  (writes /tmp/stress_r7.json)
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


def timed(fn):
    t0 = time.time()
    n = fn()
    return round(time.time() - t0, 2), n


def mat(df) -> int:
    """Materialize EVERY column through the noop sink (bench.py's
    discipline): a bare .count() lets Catalyst prune unused window /
    aggregate expressions and even eliminate cardinality-preserving
    joins, silently measuring a fraction of the claimed compute
    (NOTES.md round-7 sharp edge)."""
    df.write.format("noop").mode("overwrite").save()
    return -1


def tenc_shape(o):
    w = W.partitionBy("o_orderpriority")
    return mat(
        o.withColumn("s", F.sum("cents").over(w))
        .withColumn("n", F.count(F.lit(1)).over(w))
        .filter(F.col("n") > 1)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.expr("CAST((s - cents) * 1000000 DIV (n - 1) AS BIGINT)").alias(
                "loo"
            ),
        )
    )


def cuped_shape(ev):
    b = ev.agg(F.min("us").alias("mn"), F.max("us").alias("mx")).select(
        F.expr("CAST((mn + mx) DIV 2 AS BIGINT)").alias("mid_us")
    )
    e = ev.crossJoin(F.broadcast(b)).select(
        "user_id",
        (F.col("user_id") % 2).cast("bigint").alias("variant"),
        F.when(F.col("us") <= F.col("mid_us"), F.col("vm")).alias("pre_v"),
        F.when(F.col("us") > F.col("mid_us"), F.col("vm")).alias("post_v"),
    )
    u = (
        e.groupBy("user_id", "variant")
        .agg(
            F.expr("CAST(CAST(sum(pre_v) AS BIGINT) DIV count(pre_v) AS BIGINT)").alias("x"),
            F.expr("CAST(CAST(sum(post_v) AS BIGINT) DIV count(post_v) AS BIGINT)").alias("y"),
            F.count("pre_v").alias("_np"),
            F.count("post_v").alias("_nq"),
        )
        .filter((F.col("_np") > 0) & (F.col("_nq") > 0))
    )
    dec = "DECIMAL(38,0)"
    g = u.agg(
        F.expr(f"CAST(count(1) AS {dec})").alias("n"),
        F.expr(f"CAST(sum(CAST(x AS {dec})) AS {dec})").alias("sx"),
        F.expr(f"CAST(sum(CAST(y AS {dec})) AS {dec})").alias("sy"),
        F.expr(f"CAST(sum(CAST(x AS {dec}) * CAST(y AS {dec})) AS {dec})").alias("sxy"),
        F.expr(f"CAST(sum(CAST(x AS {dec}) * CAST(x AS {dec})) AS {dec})").alias("sxx"),
    )
    v = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.expr(f"CAST(sum(CAST(x AS {dec})) AS {dec})").alias("vsx"),
        F.expr(f"CAST(sum(CAST(y AS {dec})) AS {dec})").alias("vsy"),
    )
    return mat(v.crossJoin(F.broadcast(g)))


def did_shape(ev):
    b = ev.agg(F.min("us").alias("mn"), F.max("us").alias("mx")).select(
        F.expr("CAST((mn + mx) DIV 2 AS BIGINT)").alias("mid_us")
    )
    e = ev.crossJoin(F.broadcast(b)).select(
        (F.col("user_id") % 2).cast("bigint").alias("variant"),
        F.when(F.col("us") <= F.col("mid_us"), 0).otherwise(1).alias("post"),
        "vm",
    )
    return mat(
        e.groupBy("variant", "post").agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("CAST(CAST(sum(vm) AS BIGINT) DIV count(1) AS BIGINT)").alias(
                "mean_micro"
            ),
        )
    )


def walk_shape(edges, steps: int = 3):
    cur = edges.select(F.col("a").alias("node")).distinct()
    carried = ["node"]
    for t in range(1, steps + 1):
        pos = carried[-1]
        key = F.concat(
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(str(t)),
                    F.col(pos).cast("string"),
                    F.col("b").cast("string"),
                )
            ),
            F.lpad(F.col("b").cast("string"), 20, "0"),
        )
        cur = (
            cur.join(edges, cur[pos] == edges["a"])
            .groupBy(*carried)
            .agg(F.min_by("b", key).alias(f"step{t}"))
        )
        carried.append(f"step{t}")
    return mat(cur.select(*carried))


def jsd_shape(docs):
    from etl_cnpjs_spark.functions.text import tokens

    docs = docs.filter(F.length(F.trim("text")) > 0)
    s0f = docs.agg(F.min("source").alias("_s0"))
    d = docs.select("source", F.explode(tokens(F.col("text"))).alias("w"))
    c = (
        d.crossJoin(F.broadcast(s0f))
        .select((F.col("source") != F.col("_s0")).cast("int").alias("s"), "w")
        .groupBy("w")
        .agg(
            F.sum(F.when(F.col("s") == 0, 1).otherwise(0)).cast("bigint").alias("c0"),
            F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).cast("bigint").alias("c1"),
        )
    )
    n = c.agg(
        F.sum("c0").cast("bigint").alias("n0"),
        F.sum("c1").cast("bigint").alias("n1"),
    )
    j = c.crossJoin(F.broadcast(n))
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    m = (p0 + p1) / F.lit(2.0)
    t0 = F.when(
        F.col("c0") > 0, F.floor(p0 * F.log(p0 / m) * 1000000 + 0.5).cast("bigint")
    ).otherwise(F.lit(0))
    t1 = F.when(
        F.col("c1") > 0, F.floor(p1 * F.log(p1 / m) * 1000000 + 0.5).cast("bigint")
    ).otherwise(F.lit(0))
    return mat(
        j.select(t0.alias("t0"), t1.alias("t1")).agg(F.sum("t0"), F.sum("t1"))
    )


def main() -> int:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}

    # 1. target encode — same-category growth (skew axis)
    o1 = (
        table(spark, SF_DIR, "orders")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
        )
        .localCheckpoint()
    )
    rep = F.explode(F.sequence(F.lit(0), F.lit(K - 1))).alias("_rep")
    o10 = (
        o1.select("*", rep)
        .withColumn("o_orderkey", F.col("o_orderkey") * K + F.col("_rep"))
        .drop("_rep")
        .localCheckpoint()
    )
    t1, n1 = timed(lambda: tenc_shape(o1))
    t10, n10 = timed(lambda: tenc_shape(o10))
    out["target_encode_samecat"] = {"t1": t1, "n1": n1, "t10": t10, "n10": n10}

    # 2/3. CUPED (user-shifted copies) and DiD (same users)
    ev1 = (
        table(spark, SF_DIR, "events")
        .select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            F.floor(F.col("value") * 1000000 + 0.5).cast("bigint").alias("vm"),
        )
        .localCheckpoint()
    )
    ev10u = (
        ev1.select("*", rep)
        .withColumn("user_id", F.col("user_id") + F.col("_rep") * F.lit(10_000_000))
        .drop("_rep")
        .localCheckpoint()
    )
    ev10s = ev1.select("*", rep).drop("_rep").localCheckpoint()
    t1, n1 = timed(lambda: cuped_shape(ev1))
    t10, n10 = timed(lambda: cuped_shape(ev10u))
    out["cuped_usergrain"] = {"t1": t1, "n1": n1, "t10": t10, "n10": n10}
    t1, n1 = timed(lambda: did_shape(ev1))
    t10, n10 = timed(lambda: did_shape(ev10s))
    out["did_4cell"] = {"t1": t1, "n1": n1, "t10": t10, "n10": n10}

    # 4. random walk at 10x DENSITY: dense-relabel nodes, modular
    # rotations of the target endpoint multiply average degree by K
    # on the SAME node set.
    from etl_cnpjs_spark.plans.dedup import _exact_pairs

    pairs = _exact_pairs(spark, SF_DIR).select("i", "j")
    nodes = (
        pairs.select(F.col("i").alias("id"))
        .unionAll(pairs.select(F.col("j").alias("id")))
        .distinct()
        .withColumn("d", F.row_number().over(W.orderBy("id")) - 1)
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    di = nodes.select(F.col("id").alias("i"), F.col("d").alias("da"))
    dj = nodes.select(F.col("id").alias("j"), F.col("d").alias("db"))
    dense = (
        pairs.join(F.broadcast(di), "i").join(F.broadcast(dj), "j")
        .select("da", "db")
        .localCheckpoint()
    )
    e1 = dense.select(F.col("da").alias("a"), F.col("db").alias("b")).unionAll(
        dense.select(F.col("db").alias("a"), F.col("da").alias("b"))
    ).localCheckpoint()
    e10 = (
        dense.select("*", rep)
        .select(
            "da",
            ((F.col("db") + F.col("_rep") * F.lit(17)) % F.lit(n_nodes)).alias("db"),
        )
        .select(F.col("da").alias("a"), F.col("db").alias("b"))
        .unionAll(
            dense.select("*", rep).select(
                ((F.col("db") + F.col("_rep") * F.lit(17)) % F.lit(n_nodes)).alias("a"),
                F.col("da").alias("b"),
            )
        )
        .distinct()
        .localCheckpoint()
    )
    ne1, ne10 = e1.count(), e10.count()
    t1, n1 = timed(lambda: walk_shape(e1))
    t10, n10 = timed(lambda: walk_shape(e10))
    out["walk_density"] = {
        "t1": t1, "n1": n1, "t10": t10, "n10": n10,
        "nodes": n_nodes, "edges1": ne1, "edges10": ne10,
    }

    # 5. JSD post-fix — exact-replica corpus growth
    d1 = table(spark, SF_DIR, "documents").select("doc_id", "source", "text").localCheckpoint()
    d10 = (
        d1.select("*", rep)
        .withColumn("doc_id", F.col("doc_id") * K + F.col("_rep"))
        .drop("_rep")
        .localCheckpoint()
    )
    t1, n1 = timed(lambda: jsd_shape(d1))
    t10, n10 = timed(lambda: jsd_shape(d10))
    out["jsd_tokenpass"] = {"t1": t1, "n1": n1, "t10": t10, "n10": n10}

    with open("/tmp/stress_r7.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
