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
    timestamps attribute deterministically. The STREAMING face
    (streaming/stateful.py::last_touch_attribution — 2 scalars of state
    per user, append mode) emits the same attribution per purchase over
    an unbounded stream; tests/test_streaming.py pins its rollup to
    this batch result.

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


# --- graph_jaccard ----------------------------------------------------------
#
# Neighborhood-Jaccard link prediction — the score common_neighbors
# counts normalize into: |N(u) ∩ N(v)| / |N(u) ∪ N(v)| in ppm for
# non-adjacent pairs. Completes the link-prediction pair (raw count →
# normalized score) over the same near-dup graph frame.

_GJ_TOPK = 100


def _gj_oracle() -> str:
    from etl_cnpjs_spark.plans.dedup import _SQL_PAIRS

    return (
        _SQL_PAIRS
        + f"""
      , edges AS (SELECT i AS a, j AS b FROM pairs UNION ALL SELECT j, i FROM pairs),
      deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1),
      two_path AS (
        SELECT e1.a AS u, e2.b AS v, CAST(COUNT(*) AS BIGINT) AS common_cnt
        FROM edges e1 JOIN edges e2 ON e1.b = e2.a AND e1.a < e2.b
        GROUP BY 1, 2),
      nonadj AS (
        SELECT t.u, t.v, t.common_cnt
        FROM two_path t LEFT JOIN pairs p ON t.u = p.i AND t.v = p.j
        WHERE p.i IS NULL)
      SELECT n.u, n.v, n.common_cnt,
             n.common_cnt * 1000000 // (du.d + dv.d - n.common_cnt) AS jaccard_ppm
      FROM nonadj n JOIN deg du ON n.u = du.node JOIN deg dv ON n.v = dv.node
      ORDER BY jaccard_ppm DESC, n.u, n.v LIMIT {_GJ_TOPK}
    """
    )


@register("graph_jaccard", oracle=_gj_oracle(), tags=("graph", "dedup", "ml"))
def graph_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard link prediction on the near-dup graph: for each
    non-adjacent pair sharing ≥1 neighbor, the neighborhood Jaccard
    |N(u)∩N(v)| / |N(u)∪N(v)| in ppm (bigint DIV — float-free);
    top-100 by (score desc, u, v). The normalized companion of
    graph_common_neighbors: raw counts rank hubs first, Jaccard ranks
    proportionally-overlapping neighborhoods first — the score actually
    thresholded in entity-resolution merge queues.

    Scale story: identical 2-path envelope as common_neighbors (edges
    shuffle on the midpoint, u < v halves candidates, anti-join removes
    existing edges); the degree table is node-sized and broadcast here
    — at a scale where nodes outgrow broadcast it becomes two
    co-partitioned joins on the endpoint keys (same discipline as
    dedup_cluster's label joins). Union size derives from the two
    degrees and the intersection count — no second pass over edges."""
    from etl_cnpjs_spark.plans.dedup import _exact_pairs

    pairs = _exact_pairs(spark, sf_dir).select("i", "j")
    fwd = pairs.select(F.col("i").alias("a"), F.col("j").alias("b"))
    rev = pairs.select(F.col("j").alias("a"), F.col("i").alias("b"))
    edges = fwd.unionAll(rev)
    deg = edges.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    e1 = edges.select(F.col("a").alias("u"), F.col("b").alias("x"))
    e2 = edges.select(F.col("a").alias("x"), F.col("b").alias("v"))
    two_path = (
        e1.join(e2, "x")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common_cnt"))
    )
    nonadj = two_path.join(
        pairs,
        (two_path["u"] == pairs["i"]) & (two_path["v"] == pairs["j"]),
        "left_anti",
    )
    scored = (
        nonadj.join(
            F.broadcast(deg.select(F.col("node").alias("u"), F.col("d").alias("du"))),
            "u",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))),
            "v",
        )
        .select(
            "u",
            "v",
            "common_cnt",
            F.expr("common_cnt * 1000000 DIV (du + dv - common_cnt)").alias(
                "jaccard_ppm"
            ),
        )
    )
    return scored.orderBy(F.desc("jaccard_ppm"), "u", "v").limit(_GJ_TOPK)


# --- events_anomaly_mad -----------------------------------------------------
#
# Robust (median/MAD) outlier screen — the heavy-tail-safe twin of
# events_anomaly's mean/stddev z-score. Median-exactness discipline:
# values quantize to integer micro-units FIRST, and a median of
# integers interpolates only at d ∈ {0, 0.5} — (lo+hi)/2 is the same
# exact double in every formulation — so both engines' linear-
# interpolation quantiles are bit-identical with no libm involvement.

_MAD_K = 1.4826  # consistency constant: MAD * k estimates sigma under normality


@register(
    "events_anomaly_mad",
    oracle=f"""
    WITH q AS (
      SELECT user_id, CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v
      FROM events),
    med AS (
      SELECT user_id, quantile_cont(v, 0.5) AS med,
             CAST(count(*) AS BIGINT) AS n
      FROM q GROUP BY user_id),
    dev AS (
      SELECT q.user_id, med.med, med.n, abs(q.v - med.med) AS ad
      FROM q JOIN med ON q.user_id = med.user_id),
    mad AS (
      SELECT user_id, any_value(med) AS med, any_value(n) AS n,
             quantile_cont(ad, 0.5) AS mad, max(ad) AS max_ad
      FROM dev GROUP BY user_id)
    SELECT user_id, n,
           med / 1e6 AS median_value,
           mad / 1e6 AS mad_value,
           CASE WHEN mad = 0 THEN NULL
                ELSE {quantize_sql(f'max_ad / (mad * {_MAD_K})')} END AS max_robust_z
    FROM mad
    """,
    tags=("events", "stats", "dq", "robust"),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user outlier profile: median, MAD (median absolute
    deviation), and the worst point's robust z-score
    max|v - med| / (MAD · 1.4826) — the screen that, unlike
    events_anomaly's mean/stddev version, a single corrupt reading
    cannot drag (breakdown point 50% vs 0%). The pipeline DQ pattern:
    flag users whose max_robust_z blows past ~3.5 for review.

    Float portability: values quantize to integer micro-units BEFORE
    any statistic, so each median interpolates integers at d ∈ {0, 0.5}
    — exact in IEEE no matter how the engine writes the interpolation —
    and every downstream op (subtract, abs, one divide, quantize) is
    the same fixed double sequence in both engines. No stddev, no libm.

    Scale story: two grouped aggregates and one join, ALL keyed on
    user_id — one partitioning reused end-to-end (the med join-back is
    co-partitioned with both groupBys; AQE plans it shuffle-free on the
    agg side). Exact grouped medians are a per-key sort (spillable),
    the same envelope agg_quantile already carries at 100 TB."""
    ev = table(spark, sf_dir, "events")
    q = ev.select(
        "user_id",
        F.floor(F.col("value") * 1e6 + 0.5).cast("bigint").alias("v"),
    )
    med = q.groupBy("user_id").agg(
        F.percentile("v", F.lit(0.5)).alias("med"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    dev = q.join(med, "user_id").select(
        "user_id", "med", "n", F.abs(F.col("v") - F.col("med")).alias("ad")
    )
    mad = dev.groupBy("user_id").agg(
        F.any_value("med").alias("med"),
        F.any_value("n").alias("n"),
        F.percentile("ad", F.lit(0.5)).alias("mad"),
        F.max("ad").alias("max_ad"),
    )
    return mad.select(
        "user_id",
        "n",
        (F.col("med") / 1e6).alias("median_value"),
        (F.col("mad") / 1e6).alias("mad_value"),
        F.when(F.col("mad") == 0, F.lit(None).cast("double"))
        .otherwise(quantize(F.col("max_ad") / (F.col("mad") * _MAD_K)))
        .alias("max_robust_z"),
    )


# --- events_survival_hazard ---------------------------------------------------
#
# Discrete-time churn hazard — the Kaplan-Meier sufficient statistic
# (at-risk n_t, events d_t, hazard d_t/n_t) WITHOUT the float survival
# product: downstream can fold S(t) = Π(1 - h) however it likes; the
# engine emits exact integers and bigint-DIV ppm only.

_SURV_EPOCH = "2024-01-01"


@register(
    "events_survival_hazard",
    oracle=f"""
    WITH lastd AS (
      SELECT user_id,
             CAST(date_diff('day', DATE '{_SURV_EPOCH}', CAST(max(ts) AS DATE)) AS BIGINT) AS last_day
      FROM events GROUP BY user_id),
    d AS (
      SELECT last_day AS day, CAST(count(*) AS BIGINT) AS churned
      FROM lastd GROUP BY 1)
    SELECT day, churned, at_risk,
           churned * 1000000 // at_risk AS hazard_ppm
    FROM (
      SELECT day, churned,
             CAST(SUM(churned) OVER (ORDER BY day DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS at_risk
      FROM d)
    """,
    tags=("events", "stats", "survival", "ml"),
)
def events_survival_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time survival/churn table: for each day (since the
    corpus epoch), how many users were last seen that day (churned),
    how many were still at risk (last seen that day or later), and the
    hazard d/n in ppm — the Kaplan-Meier sufficient statistic. Emitting
    (d_t, n_t, hazard) instead of the survival curve keeps the operator
    float-free (bigint DIV ppm); S(t) is a trivial downstream fold.

    Scale story: one user-keyed max aggregate (map-side combined), then
    everything is day-grain — ≤ a few thousand rows at ANY input
    volume. The at-risk count is a suffix sum = running frame over
    DESCENDING day (the cheap incremental window class, SCALE.md),
    computed on the day-grain frame, so the single-partition window
    WARN is day-table-sized, not data-sized."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    lastd = ev.groupBy("user_id").agg(
        F.datediff(F.max("ts").cast("date"), F.lit(_SURV_EPOCH).cast("date"))
        .cast("bigint")
        .alias("last_day")
    )
    d = lastd.groupBy(F.col("last_day").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("churned")
    )
    w = W.orderBy(F.desc("day")).rowsBetween(W.unboundedPreceding, W.currentRow)
    at_risk = F.sum("churned").over(w).cast("bigint")
    return d.select(
        "day", "churned", at_risk.alias("at_risk")
    ).select(
        "day",
        "churned",
        "at_risk",
        F.expr("churned * 1000000 DIV at_risk").alias("hazard_ppm"),
    )


# --- join_spatial_knn ---------------------------------------------------------
#
# Exact k-nearest-neighbor self-join on the 2D points via TIERED grid
# rings: ring-1 (3×3 cells) answers a point exactly when its k-th
# candidate sits within one cell width (the ring's guaranteed coverage
# disk); stragglers escalate to ring-2 (5×5, coverage 2·cell); anything
# still unresolved falls back to brute force against the full
# (broadcastable) point set. Every tier is a DataFrame op; exactness is
# by construction, and the oracle is the brute-force SQL.

_KNN_K = 3
_KNN_CELL = 0.1


def _knn_oracle() -> str:
    return f"""
    WITH p AS (
      SELECT vec_id,
             CAST(embedding[1] AS DOUBLE) AS x,
             CAST(embedding[2] AS DOUBLE) AS y
      FROM embeddings)
    SELECT a_id, b_id, rank, dist2 FROM (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             CAST(row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y),
                        b.vec_id) AS BIGINT) AS rank,
             {quantize_sql('(a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)', 12)} AS dist2
      FROM p a JOIN p b ON a.vec_id <> b.vec_id)
    WHERE rank <= {_KNN_K}
    """


def _knn_rank(cand: DataFrame) -> DataFrame:
    """Top-k per a_id by (raw dist2, b_id) with the k-th raw distance
    carried alongside (for the coverage acceptance test)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("a_id").orderBy("d2_raw", "b_id")
    return (
        cand.select(
            "a_id",
            "b_id",
            "d2_raw",
            F.row_number().over(w).cast("bigint").alias("rank"),
        )
        .filter(F.col("rank") <= _KNN_K)
        .withColumn(
            "kth_d2",
            F.max(F.when(F.col("rank") == _KNN_K, F.col("d2_raw"))).over(
                W.partitionBy("a_id")
            ),
        )
    )


@register("join_spatial_knn", oracle=_knn_oracle(), tags=("join", "spatial", "similarity", "ml"))
def join_spatial_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN (k=3) self-join on the 2D embedding points, ranked by
    (squared distance, neighbor id): the retrieval primitive under
    recommendation and density estimation. Tiered grid search keeps it
    exact WITHOUT an all-pairs product: a ring answers a point exactly
    when its k-th candidate distance is within the ring's guaranteed
    coverage disk (ring R covers radius R·cell); points the 3×3 ring
    can't certify escalate to 5×5, and the (empirically empty at every
    test SF) remainder brute-forces against a broadcast of the full
    point set — correctness never depends on density tuning.

    Scale story: candidate volume is O(n · ring² · cell density) for
    the overwhelming majority resolved at ring 1, and each tier's
    candidates meet on a (cell_x, cell_y) equi-join. The brute-force
    tail is |unresolved| × n with unresolved ≈ isolated outliers — at
    100 TB you'd bound it by capping escalation (emit radius-limited
    kNN for the tail, the standard ANN contract). Rank ties break on
    neighbor id — a total order, so the output is deterministic."""
    emb = table(spark, sf_dir, "embeddings", parallel=True)
    cell = F.lit(_KNN_CELL)
    p = emb.select(
        "vec_id",
        F.col("embedding").getItem(0).cast("double").alias("x"),
        F.col("embedding").getItem(1).cast("double").alias("y"),
    ).select(
        "*",
        F.floor(F.col("x") / cell).cast("bigint").alias("cx"),
        F.floor(F.col("y") / cell).cast("bigint").alias("cy"),
    )
    b = p.select(
        F.col("vec_id").alias("b_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))

    def ring_candidates(pts: DataFrame, r: int) -> DataFrame:
        offs = list(range(-r, r + 1))
        a = pts.select(
            F.col("vec_id").alias("a_id"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            F.explode(F.array(*[F.col("cx") + o for o in offs])).alias("jx"),
            "cy",
        ).select(
            "a_id",
            "ax",
            "ay",
            "jx",
            F.explode(F.array(*[F.col("cy") + o for o in offs])).alias("jy"),
        )
        return (
            a.join(b, ["jx", "jy"])
            .filter(F.col("a_id") != F.col("b_id"))
            .select("a_id", "b_id", d2.alias("d2_raw"))
        )

    def accepted(ranked: DataFrame, radius: float) -> DataFrame:
        return ranked.filter(
            F.col("kth_d2").isNotNull() & (F.col("kth_d2") <= radius * radius)
        )

    k1 = _knn_rank(ring_candidates(p, 1))
    ok1 = accepted(k1, _KNN_CELL)
    rest1 = p.join(
        ok1.select("a_id").distinct(),
        p["vec_id"] == F.col("a_id"),
        "left_anti",
    )
    k2 = _knn_rank(ring_candidates(rest1, 2))
    ok2 = accepted(k2, 2 * _KNN_CELL)
    rest2 = rest1.join(
        ok2.select("a_id").distinct(),
        rest1["vec_id"] == F.col("a_id"),
        "left_anti",
    )
    brute = _knn_rank(
        rest2.select(
            F.col("vec_id").alias("a_id"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
        )
        .crossJoin(F.broadcast(b.drop("jx", "jy")))
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", d2.alias("d2_raw"))
    )
    out = ok1.unionByName(ok2).unionByName(brute)
    return out.select(
        "a_id", "b_id", "rank", quantize(F.col("d2_raw"), 12).alias("dist2")
    )
