"""Round-5 session-4 surface growth: marketing attribution, market-
basket co-occurrence, distribution-drift DQ, and grid-bucketed spatial
radius join.

Reference trace: the reference computes one join+filter aggregate
(ETLCNPJFinalEmpresaEstabelecimentos.py:191-234) and has none of this
surface; these are the event-analytics / data-quality / spatial
operators a production pipeline layers on top (SURVEY.md §2.2b growth
directions), each with a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.plans.registry import quantize, quantize_sql, register

# --- events_attribution -----------------------------------------------------
#
# Last-touch attribution: every purchase is credited to the most recent
# PRECEDING touch event (click or view) by the same user within a 72 h
# lookback, else 'none'. The running carry-forward is the
# (UNBOUNDED PRECEDING, 1 PRECEDING) frame — the cheap incremental
# window class (SCALE.md "Window-frame discipline"), never a
# forward-looking frame.

_ATTR_LOOKBACK_H = 72


@register(
    "events_attribution",
    oracle=f"""
    WITH s AS (
      SELECT user_id, event_id, ts, event_type, value,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS) OVER w AS touch_type,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN ts END IGNORE NULLS) OVER w         AS touch_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT CASE WHEN touch_ts IS NULL
                  OR touch_ts < ts - INTERVAL {_ATTR_LOOKBACK_H} HOUR
                THEN 'none' ELSE touch_type END AS attributed,
           CAST(count(*) AS BIGINT) AS purchases,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS attributed_value
    FROM s WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    tags=("events", "sequence", "window", "attribution"),
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: credit each purchase to the
    most recent preceding click/view by the same user within a 72-hour
    lookback ('none' beyond it), then roll purchases and decimal-exact
    purchase value up per attributed channel. Sequence order is the
    (ts, event_id) total order the whole events family shares, so tied
    timestamps attribute deterministically.

    Scale story: ONE user-keyed window exchange does all the work — the
    carry-forward of the last touch is a running
    (unboundedPreceding, -1) frame, the incremental class, never the
    quadratic unbounded-following class (SCALE.md). The final rollup is
    alphabet-sized (3 rows). Value totals accumulate in DECIMAL(27,6)
    so the double output is partition-order-independent."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type").isin("click", "view"), F.col("event_type")
    )
    touch_ts = F.when(F.col("event_type").isin("click", "view"), F.col("ts"))
    s = ev.select(
        "event_type",
        "ts",
        "value",
        F.last(touch, ignorenulls=True).over(w).alias("touch_type"),
        F.last(touch_ts, ignorenulls=True).over(w).alias("touch_ts"),
    ).filter(F.col("event_type") == "purchase")
    attributed = F.when(
        F.col("touch_ts").isNull()
        | (
            F.col("touch_ts")
            < F.col("ts") - F.expr(f"INTERVAL {_ATTR_LOOKBACK_H} HOURS")
        ),
        F.lit("none"),
    ).otherwise(F.col("touch_type"))
    return (
        s.groupBy(attributed.alias("attributed"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("purchases"),
            F.sum(F.col("value").cast("decimal(27,6)"))
            .cast("double")
            .alias("attributed_value"),
        )
    )


# --- agg_cooccurrence -------------------------------------------------------
#
# Market-basket pair support over (user, event_type) baskets. Counts are
# "how many users did BOTH a and b"; support and lift are bigint-DIV ppm
# (float-free, sharp edge #8). Lift numerator n_ab * N * 1e6 is bounded
# by n_users^2 * 1e6 — fine in bigint to ~3e6 users; beyond that switch
# the ppm arithmetic to DECIMAL(38,0) (documented, not needed at any
# test SF).


@register(
    "agg_cooccurrence",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t FROM u GROUP BY 1),
    tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM u),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM u a JOIN u b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT p.type_a, p.type_b, p.n_ab,
           p.n_ab * 1000000 // tot.n_users                          AS support_ppm,
           (p.n_ab * tot.n_users * 1000000) // (na.n_t * nb.n_t)    AS lift_ppm
    FROM p
    CROSS JOIN tot
    JOIN n na ON na.event_type = p.type_a
    JOIN n nb ON nb.event_type = p.type_b
    """,
    tags=("agg", "ml", "market_basket"),
)
def agg_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: for every unordered pair of event
    types, the number of users who did both, plus support and lift in
    ppm — the frequent-itemset sufficient statistic behind
    recommendation and anomaly rules (lift >> 1e6 means the pair
    travels together).

    Scale story: ONE user-keyed exchange builds every statistic. The
    basket build is groupBy(user).collect_set — the partial aggregate
    dedups map-side and is bounded by the alphabet, so what shuffles is
    (user, partial-set), never raw events. Pair expansion needs NO
    self-join: each sorted basket explodes into its own C(k,2) pairs
    via array transforms, and marginals (n_t) and the user total both
    re-derive from the SAME basket frame (AQE reuses its exchange), so
    the rollups past it are alphabet-sized. A self-join on user_id
    (the oracle's formulation) would shuffle the basket table twice at
    100 TB; this shape reads events once. Support/lift are bigint-DIV
    ppm — float-free, no quantization."""
    ev = table(spark, sf_dir, "events")
    baskets = (
        ev.groupBy("user_id")
        .agg(F.array_sort(F.collect_set("event_type")).alias("types"))
    )
    n = (
        baskets.select(F.explode("types").alias("type_key"))
        .groupBy("type_key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_t"))
    )
    tot = baskets.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(types, (x, i) ->"
                    " transform(slice(types, i + 2, size(types)),"
                    " y -> struct(x AS type_a, y AS type_b))))"
                )
            ).alias("p")
        )
        .select("p.type_a", "p.type_b")
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )
    return (
        pairs.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(n.withColumnRenamed("n_t", "na")),
            F.col("type_a") == F.col("type_key"),
        )
        .drop("type_key")
        .join(
            F.broadcast(n.withColumnRenamed("n_t", "nb")),
            F.col("type_b") == F.col("type_key"),
        )
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.expr("n_ab * 1000000 DIV n_users").alias("support_ppm"),
            F.expr("(n_ab * n_users * 1000000) DIV (na * nb)").alias(
                "lift_ppm"
            ),
        )
    )


# --- dq_drift ---------------------------------------------------------------
#
# Distribution drift between two time windows of the same stream — the
# data-quality gate a training pipeline runs before admitting a new
# snapshot (did the event mix shift?). Chi-square decomposition per
# category (not PSI: PSI needs ln(), a libm sharp edge — NOTES.md #6;
# the chi-square statistic is one exact-input double expression).

_DRIFT_SPLIT = "2024-01-16 00:00:00"


def _chi2_sql(c: str, e: str) -> str:
    return f"((CAST({c} AS DOUBLE) - {e}) * (CAST({c} AS DOUBLE) - {e}) / {e})"


@register(
    "dq_drift",
    oracle=f"""
    WITH c AS (
      SELECT event_type,
             CAST(count(*) FILTER (WHERE ts <  TIMESTAMP '{_DRIFT_SPLIT}') AS BIGINT) AS c1,
             CAST(count(*) FILTER (WHERE ts >= TIMESTAMP '{_DRIFT_SPLIT}') AS BIGINT) AS c2
      FROM events GROUP BY 1),
    t AS (SELECT CAST(SUM(c1) AS BIGINT) AS t1, CAST(SUM(c2) AS BIGINT) AS t2 FROM c),
    e AS (
      SELECT c.event_type, c.c1, c.c2, t.t1, t.t2,
             CAST(c.c1 + c.c2 AS DOUBLE) * t.t1 / (t.t1 + t.t2) AS e1,
             CAST(c.c1 + c.c2 AS DOUBLE) * t.t2 / (t.t1 + t.t2) AS e2
      FROM c, t)
    SELECT event_type, c1, c2,
           c1 * 1000000 // t1 AS rate1_ppm,
           c2 * 1000000 // t2 AS rate2_ppm,
           CAST(floor(({_chi2_sql('c1', 'e1')} + {_chi2_sql('c2', 'e2')})
                      * 1e6 + 0.5) AS BIGINT) AS chi2_micro
    FROM e
    """,
    tags=("dq", "stats", "drift"),
)
def dq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift check between two halves of the event stream:
    per event type, both window counts, both rates (bigint-DIV ppm),
    and the type's chi-square contribution in micro-units — the DQ gate
    that catches a shifted event mix before a bad snapshot trains a
    model. Per-category decomposition (no cross-category float sum →
    no accumulation-order divergence); the total statistic is the exact
    bigint sum of chi2_micro, which either engine can take downstream.

    Float portability: chi-square needs only *, /, - on exact bigint
    inputs — one fixed-shape double expression, identical in both
    engines — where PSI/KL would need ln() (libm-divergent, NOTES #6).
    Micro-quantization (floor(x*1e6+0.5) as BIGINT) makes the output
    integer-exact.

    Scale story: one map-side-combined conditional aggregate over the
    scan (counts per type × window), then everything is alphabet-sized:
    the totals ride a broadcast 1-row frame. No shuffle of events
    beyond the partial-agg combine."""
    ev = table(spark, sf_dir, "events")
    split = F.lit(_DRIFT_SPLIT).cast("timestamp")
    c = ev.groupBy("event_type").agg(
        F.count(F.when(F.col("ts") < split, 1)).cast("bigint").alias("c1"),
        F.count(F.when(F.col("ts") >= split, 1)).cast("bigint").alias("c2"),
    )
    t = c.agg(
        F.sum("c1").cast("bigint").alias("t1"),
        F.sum("c2").cast("bigint").alias("t2"),
    )
    e = c.crossJoin(F.broadcast(t)).select(
        "event_type",
        "c1",
        "c2",
        "t1",
        "t2",
        (
            (F.col("c1") + F.col("c2")).cast("double")
            * F.col("t1")
            / (F.col("t1") + F.col("t2"))
        ).alias("e1"),
        (
            (F.col("c1") + F.col("c2")).cast("double")
            * F.col("t2")
            / (F.col("t1") + F.col("t2"))
        ).alias("e2"),
    )

    def chi2(cc: str, ee: str):
        d = F.col(cc).cast("double") - F.col(ee)
        return d * d / F.col(ee)

    return e.select(
        "event_type",
        "c1",
        "c2",
        F.expr("c1 * 1000000 DIV t1").alias("rate1_ppm"),
        F.expr("c2 * 1000000 DIV t2").alias("rate2_ppm"),
        F.floor((chi2("c1", "e1") + chi2("c2", "e2")) * 1e6 + 0.5)
        .cast("bigint")
        .alias("chi2_micro"),
    )


# --- join_spatial_grid ------------------------------------------------------
#
# Grid-bucketed radius self-join on 2D points (first two embedding
# dims): the standard spatial-join discipline (GeoSpark/Sedona's
# partition-by-cell shape). Cell size == radius, so any pair within r
# lands in the same or an adjacent cell; the smaller-id side explodes
# into its 3x3 neighborhood and candidates meet on a cell equi-join —
# never an all-pairs product.

_SPATIAL_R = 0.02


@register(
    "join_spatial_grid",
    oracle=f"""
    WITH p AS (
      SELECT vec_id,
             CAST(embedding[1] AS DOUBLE) AS x,
             CAST(embedding[2] AS DOUBLE) AS y
      FROM embeddings)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           {quantize_sql('(a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)', 12)} AS dist2
    FROM p a JOIN p b ON a.vec_id < b.vec_id
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          < {_SPATIAL_R} * {_SPATIAL_R}
    """,
    tags=("join", "spatial", "similarity"),
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join on 2D points via grid bucketing: all pairs of
    embedding points whose first-two-dim Euclidean distance is < 0.02,
    with the squared distance (quantized 1e-12). The oracle is the
    exact brute-force SQL — so the driver hash PROVES the grid plan
    loses no pair and adds none.

    Plan shape: cell size == radius ⇒ a qualifying pair's cells differ
    by at most 1 per axis, so the smaller-id side explodes into its 3×3
    neighbor cells (9× of ids+coords, never of payloads) and candidates
    meet on a (cell_x, cell_y) equi-join; the exact-distance residual
    prunes the corner cases. Each unordered pair meets exactly once
    (only one side explodes; the id inequality picks the orientation) —
    no distinct needed.

    Scale story: this is O(n · density) instead of O(n²) — the spatial
    twin of the LSH band-join discipline (SCALE.md "Dedup family").
    Skew = dense cells; the mitigation is the same cap-and-salt used by
    dedup_embedding_lsh's hot buckets. At 100 TB you'd pre-partition by
    coarse cell and bucket-sort within, making the equi-join
    exchange-free."""
    emb = table(spark, sf_dir, "embeddings")
    cell = F.lit(_SPATIAL_R)
    p = emb.select(
        "vec_id",
        F.col("embedding").getItem(0).cast("double").alias("x"),
        F.col("embedding").getItem(1).cast("double").alias("y"),
    ).select(
        "*",
        F.floor(F.col("x") / cell).cast("bigint").alias("cx"),
        F.floor(F.col("y") / cell).cast("bigint").alias("cy"),
    )
    a = p.select(
        F.col("vec_id").alias("a_id"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.explode(
            F.expr("array(cx - 1, cx, cx + 1)")
        ).alias("jx"),
        "cy",
    ).select(
        "a_id",
        "ax",
        "ay",
        "jx",
        F.explode(F.expr("array(cy - 1, cy, cy + 1)")).alias("jy"),
    )
    b = p.select(
        F.col("vec_id").alias("b_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dist2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        a.join(b, ["jx", "jy"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(dist2 < F.lit(_SPATIAL_R * _SPATIAL_R))
        .select("a_id", "b_id", quantize(dist2, 12).alias("dist2"))
    )
