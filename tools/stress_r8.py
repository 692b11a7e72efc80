"""Round-8 stress: (1) the sharded greedy-packing form at 10x (r7
verdict item 2 — the bounded-task production path measured beside the
global fold), and (2) 100x noop-materialized probes over the remaining
bigint-budgeted keys whose docstrings claim sf100 headroom (verdict
item 5: events_burstiness Σg², window_twap Σ x·dt, agg_linreg decimal
sums) — the same honest-materialization discipline that caught the
agg_target_encode int64 boundary live in r7.

Axes:
- pack_sharded / pack_global: 10x docs (doc_id*K+rep replicas). The
  sharded form's task bound is GREEDY_SHARD_WIDTH docs regardless of
  volume; the global form's dominant-language task grows 10x — the
  contrast IS the scale story.
- burstiness / twap: 100x events DENSIFYING the same users (event_id
  remapped, ts jittered inside the span) — the per-user window
  partition grows 100x, the moment budgets must hold.
- linreg: 100x lineitem replicas into the same 3 groups — the decimal
  sufficient-statistics sums absorb the volume; exchange stays
  |groups| rows.

Usage: python tools/stress_r8.py  (writes /tmp/stress_r8.json)
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


def timed(fn):
    t0 = time.time()
    n = fn()
    return round(time.time() - t0, 2), n


def mat(df) -> int:
    # noop sink: materializes EVERY column (a bare count() lets Catalyst
    # prune the expressions under test — NOTES.md round-7 sharp edge)
    df.write.format("noop").mode("overwrite").save()
    return -1


def pack_shape(docs, sharded: bool, width: int | None = None):
    from etl_cnpjs_spark.operators.packing import greedy_pack_bins
    from etl_cnpjs_spark.plans.extended14 import (
        GREEDY_PACK_BUDGET,
        GREEDY_SHARD_WIDTH,
    )

    width = width or GREEDY_SHARD_WIDTH
    pack = greedy_pack_bins(GREEDY_PACK_BUDGET)

    if sharded:
        d = docs.withColumn(
            "shard", F.expr(f"doc_id DIV {width}")
        )
        packed = d.groupBy("lang", "shard").applyInPandas(
            pack, "doc_id long, lang string, n_tokens int, shard long, bin long"
        )
        sb = packed.groupBy("lang", "shard").agg(
            (F.max("bin") + 1).cast("bigint").alias("bins")
        )
        off = sb.select(
            "lang",
            "shard",
            (
                F.sum("bins").over(W.partitionBy("lang").orderBy("shard"))
                - F.col("bins")
            ).alias("offset"),
        )
        out = packed.join(F.broadcast(off), ["lang", "shard"]).select(
            "lang", (F.col("bin") + F.col("offset")).alias("seq_id"), "n_tokens"
        )
    else:
        packed = docs.groupBy("lang").applyInPandas(
            pack, "doc_id long, lang string, n_tokens int, bin long"
        )
        out = packed.select("lang", F.col("bin").alias("seq_id"), "n_tokens")
    return mat(
        out.groupBy("lang", "seq_id").agg(
            F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("seq_tokens")
        )
    )


def burstiness_shape(ev):
    wl = W.partitionBy("user_id").orderBy("s", "event_id")
    g = (
        ev.withColumn("prev_s", F.lag("s").over(wl))
        .filter(F.col("prev_s").isNotNull())
        .select("user_id", (F.col("s") - F.col("prev_s")).alias("gap"))
    )
    m = g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("gap").cast("bigint").alias("sum_g"),
        F.sum(F.col("gap") * F.col("gap")).cast("bigint").alias("sum_g2"),
    )
    mu = "CAST(sum_g AS DOUBLE) / n_gaps"
    var = f"greatest(CAST(sum_g2 AS DOUBLE) / n_gaps - ({mu}) * ({mu}), 0.0)"
    return mat(
        m.filter((F.col("n_gaps") >= 2) & (F.col("sum_g") > 0)).select(
            "user_id",
            "n_gaps",
            F.expr("sum_g DIV n_gaps").alias("mean_gap_s"),
            F.expr(f"CAST(floor(sqrt({var}) * 1000000 + 0.5) AS BIGINT)").alias(
                "std_gap_micro_s"
            ),
            F.expr(
                f"CAST(floor((sqrt({var}) - {mu}) / (sqrt({var}) + {mu})"
                f" * 1000000 + 0.5) AS BIGINT)"
            ).alias("burstiness_ppm"),
        )
    )


def twap_shape(ev):
    wl = W.partitionBy("user_id").orderBy("s", "event_id")
    o = ev.withColumn("next_s", F.lead("s").over(wl))
    h = o.filter(F.col("next_s").isNotNull() & (F.col("next_s") > F.col("s"))).select(
        "user_id", "x_micro", (F.col("next_s") - F.col("s")).alias("dt")
    )
    return mat(
        h.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_holds"),
            F.sum("dt").cast("bigint").alias("span_s"),
            F.expr("sum(x_micro * dt) DIV sum(dt)").alias("twap_micro"),
        )
    )


def linreg_shape(q):
    dec = "decimal(38,0)"
    m = q.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("xs").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("ys").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("xs") * F.col("xs")).cast(dec)).cast("double").alias("sxx"),
        F.sum((F.col("xs") * F.col("ys")).cast(dec)).cast("double").alias("sxy"),
        F.sum((F.col("ys") * F.col("ys")).cast(dec)).cast("double").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return mat(
        m.select(
            "l_returnflag",
            (num / denx).alias("slope"),
            ((num * num) / (denx * deny)).alias("r2"),
        )
    )


def main() -> int:
    from etl_cnpjs_spark.functions.text import tokens

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    K = 10

    # 1. greedy packing: global vs sharded at 1x and 10x
    d1 = (
        table(spark, SF_DIR, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id", "lang", F.size(tokens(F.col("text"))).alias("n_tokens")
        )
        .localCheckpoint()
    )
    rep = F.explode(F.sequence(F.lit(0), F.lit(K - 1))).alias("_rep")
    d10 = (
        d1.select("*", rep)
        .withColumn("doc_id", F.col("doc_id") * K + F.col("_rep"))
        .drop("_rep")
        .localCheckpoint()
    )
    # pre-warm the Arrow/pandas pool so neither variant pays it
    pack_shape(d1, sharded=True)
    docs1, docs10 = d1.count(), d10.count()
    variants = (
        ("pack_global", False, None),
        ("pack_sharded_w64", True, 64),
        ("pack_sharded_w4096", True, 4096),
    )
    for name, sharded, width in variants:
        t1, _ = timed(lambda s=sharded, w=width: pack_shape(d1, s, w))
        t10, _ = timed(lambda s=sharded, w=width: pack_shape(d10, s, w))
        out[name] = {"t1": t1, "t10": t10, "docs1": docs1, "docs10": docs10}

    # 2/3. burstiness + twap at 100x same-user densification
    K2 = 100
    rep2 = F.explode(F.sequence(F.lit(0), F.lit(K2 - 1))).alias("_rep")
    ev1 = (
        table(spark, SF_DIR, "events")
        .select(
            "user_id",
            F.unix_timestamp("ts").cast("bigint").alias("s"),
            F.floor(F.col("value") * 1000000 + 0.5).cast("bigint").alias("x_micro"),
            "event_id",
        )
        .localCheckpoint()
    )
    ev100 = (
        ev1.select("*", rep2)
        .select(
            "user_id",
            (F.col("s") + F.col("_rep") * 7).alias("s"),
            "x_micro",
            (F.col("event_id") * K2 + F.col("_rep")).alias("event_id"),
        )
        .localCheckpoint()
    )
    t1, _ = timed(lambda: burstiness_shape(ev1))
    t100, _ = timed(lambda: burstiness_shape(ev100))
    out["burstiness_100x"] = {
        "t1": t1, "t100": t100, "rows1": ev1.count(), "rows100": ev100.count(),
    }
    t1, _ = timed(lambda: twap_shape(ev1))
    t100, _ = timed(lambda: twap_shape(ev100))
    out["twap_100x"] = {"t1": t1, "t100": t100}

    # 4. linreg at 100x replicas into the same 3 groups
    q1 = (
        table(spark, SF_DIR, "lineitem")
        .select(
            "l_returnflag",
            F.floor(F.col("l_quantity") * 100 + 0.5).cast("bigint").alias("xs"),
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint").alias("ys"),
        )
        .localCheckpoint()
    )
    q100 = q1.select("*", rep2).drop("_rep").localCheckpoint()
    t1, _ = timed(lambda: linreg_shape(q1))
    t100, _ = timed(lambda: linreg_shape(q100))
    out["linreg_100x"] = {
        "t1": t1, "t100": t100, "rows1": q1.count(), "rows100": q100.count(),
    }

    with open("/tmp/stress_r8.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
