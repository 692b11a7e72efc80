"""Round-5 late surface growth: exact OLS regression as sufficient
statistics, viz-grade point downsampling, and common-neighbor link
prediction over the near-dup graph.

Reference trace: the reference computes one join+filter aggregate
(ETLCNPJFinalEmpresaEstabelecimentos.py:191-234) and has no numeric-
modeling, time-series or graph surface; these keys are the analytics a
training-data/metrics pipeline layers on top (SURVEY.md §2.2b growth
directions), expressed so every one carries a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.plans.registry import quantize, quantize_sql, register

# --- agg_linreg -------------------------------------------------------------
#
# Exact per-group OLS (y = l_extendedprice on x = l_quantity) from
# sufficient statistics. The whole fit reduces to five sums — the classic
# "ML on SQL engines" shape: one map-side-combinable aggregate, no
# iteration, no driver math. Portability discipline (same family as
# agg_skew_kurtosis / graph_pagerank):
#   1. quantize inputs to integer cents: floor(v*100+0.5) — both engines
#      land on the identical bigint;
#   2. per-row products in bigint (bounded: x≤5001c, y≤1e7c → xy≤5e10,
#      y²≤1e14, all << 2^63);
#   3. accumulate in DECIMAL(38,0) — exact, order-insensitive (y² sums
#      reach ~6e19 at sf0.1, past int64);
#   4. cast the exact sums to DOUBLE (correctly rounded in both engines)
#      and run the closed-form fit as a textually mirrored float
#      expression — identical IEEE ops on identical inputs;
#   5. quantize outputs to 1e-6.

_LINREG_FLOAT = {
    # the float-domain fit, shared textually by both engines
    "num": "(n * sxy - sx * sy)",
    "denx": "(n * sxx - sx * sx)",
    "deny": "(n * syy - sy * sy)",
}

_SQL_LINREG = f"""
    WITH q AS (
      SELECT l_returnflag,
             CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)      AS xs,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS ys
      FROM lineitem),
    m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE)                            AS n,
             CAST(SUM(CAST(xs AS DECIMAL(38,0))) AS DOUBLE)      AS sx,
             CAST(SUM(CAST(ys AS DECIMAL(38,0))) AS DOUBLE)      AS sy,
             CAST(SUM(CAST(xs * xs AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(xs * ys AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(ys * ys AS DECIMAL(38,0))) AS DOUBLE) AS syy
      FROM q GROUP BY l_returnflag),
    f AS (
      SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
             {_LINREG_FLOAT["num"]} / {_LINREG_FLOAT["denx"]} AS slope,
             (sy - ({_LINREG_FLOAT["num"]} / {_LINREG_FLOAT["denx"]}) * sx)
               / n / 100.0 AS intercept,
             ({_LINREG_FLOAT["num"]} * {_LINREG_FLOAT["num"]})
               / ({_LINREG_FLOAT["denx"]} * {_LINREG_FLOAT["deny"]}) AS r2
      FROM m)
    SELECT l_returnflag, n_rows,
           {quantize_sql("slope")}     AS slope,
           {quantize_sql("intercept")} AS intercept,
           {quantize_sql("r2")}        AS r2
    FROM f
"""


@register("agg_linreg", oracle=_SQL_LINREG, tags=("agg", "ml", "stats"))
def agg_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares fit of extendedprice on quantity: slope,
    intercept, R² per returnflag — exact, from one aggregation pass.

    Scale story: the expensive part is ONE groupBy over five bigint
    products — partial aggregation collapses each partition to one row
    per group before the shuffle, so the exchange moves |groups| rows
    regardless of input size. No window, no join, no second pass; the
    same sums make the fit incremental (agg_incremental's merge law
    applies verbatim). Slope is scale-invariant under the shared ×100
    input quantization; the intercept descales by /100 at the end."""
    li = table(spark, sf_dir, "lineitem")
    q = li.select(
        "l_returnflag",
        F.floor(F.col("l_quantity") * 100 + 0.5).cast("bigint").alias("xs"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint").alias("ys"),
    )
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
    slope = num / denx
    f = m.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n_rows"),
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n") / F.lit(100.0)).alias(
            "intercept"
        ),
        ((num * num) / (denx * deny)).alias("r2"),
    )
    return f.select(
        "l_returnflag",
        "n_rows",
        quantize(F.col("slope")).alias("slope"),
        quantize(F.col("intercept")).alias("intercept"),
        quantize(F.col("r2")).alias("r2"),
    )


# --- events_downsample_bucket ------------------------------------------------

_DS_BUCKET_S = 900  # 15-minute buckets


@register(
    "events_downsample_bucket",
    oracle=f"""
    WITH r AS (
      SELECT event_type,
             (CAST(floor(epoch(ts)) AS BIGINT) // {_DS_BUCKET_S}) * {_DS_BUCKET_S}
               AS bucket_s,
             event_id, value,
             row_number() OVER (PARTITION BY event_type,
                 (CAST(floor(epoch(ts)) AS BIGINT) // {_DS_BUCKET_S}) * {_DS_BUCKET_S}
                 ORDER BY value, event_id)           AS rn_lo,
             row_number() OVER (PARTITION BY event_type,
                 (CAST(floor(epoch(ts)) AS BIGINT) // {_DS_BUCKET_S}) * {_DS_BUCKET_S}
                 ORDER BY value DESC, event_id DESC) AS rn_hi
      FROM events)
    SELECT event_type, bucket_s, 'lo' AS role, event_id, value
    FROM r WHERE rn_lo = 1
    UNION ALL
    SELECT event_type, bucket_s, 'hi' AS role, event_id, value
    FROM r WHERE rn_hi = 1
    """,
    tags=("events", "timeseries", "downsample"),
)
def events_downsample_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max point downsampling (the LTTB-lite viz reduction): per
    (series, 15-min bucket) keep the ORIGINAL rows holding the bucket's
    extreme values — unlike events_ohlc this selects points (event_id
    preserved for drill-down), it doesn't aggregate them. Deterministic
    under value ties via the event_id tiebreaker, textually mirrored as
    row_number in both engines; a single-event bucket legitimately emits
    the same point twice (once per role) — identical multiset both sides.

    Scale story: one exchange on (event_type, bucket) serves both window
    sorts, and AQE reuses it across the two union branches (the filters
    differ but the windowed child is identical → ReusedExchange). Output
    is 2 rows per populated bucket — input-size-independent per bucket,
    the property that makes this the dashboard-backing reduction. Bucket
    is emitted as epoch seconds (bigint), not a timestamp, so the result
    is timezone-free in both engines."""
    ev = table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    bucket = ((F.unix_timestamp("ts") / _DS_BUCKET_S).cast("bigint") * _DS_BUCKET_S)
    wlo = W.partitionBy("event_type", bucket).orderBy("value", "event_id")
    whi = W.partitionBy("event_type", bucket).orderBy(
        F.desc("value"), F.desc("event_id")
    )
    r = ev.select(
        "event_type",
        bucket.alias("bucket_s"),
        "event_id",
        "value",
        F.row_number().over(wlo).alias("rn_lo"),
        F.row_number().over(whi).alias("rn_hi"),
    )
    lo = r.filter(F.col("rn_lo") == 1).select(
        "event_type", "bucket_s", F.lit("lo").alias("role"), "event_id", "value"
    )
    hi = r.filter(F.col("rn_hi") == 1).select(
        "event_type", "bucket_s", F.lit("hi").alias("role"), "event_id", "value"
    )
    return lo.unionAll(hi)


# --- graph_common_neighbors ---------------------------------------------------

_CN_TOPK = 100


def _cn_oracle() -> str:
    from etl_cnpjs_spark.plans.dedup import _SQL_PAIRS

    return (
        _SQL_PAIRS
        + f"""
      , edges AS (SELECT i AS a, j AS b FROM pairs UNION ALL SELECT j, i FROM pairs),
      two_path AS (
        SELECT e1.a AS u, e2.b AS v, COUNT(*) AS common_cnt
        FROM edges e1 JOIN edges e2 ON e1.b = e2.a AND e1.a < e2.b
        GROUP BY 1, 2),
      nonadj AS (
        SELECT t.u, t.v, t.common_cnt
        FROM two_path t LEFT JOIN pairs p ON t.u = p.i AND t.v = p.j
        WHERE p.i IS NULL)
      SELECT u, v, common_cnt FROM nonadj
      ORDER BY common_cnt DESC, u, v LIMIT {_CN_TOPK}
    """
    )


@register("graph_common_neighbors", oracle=_cn_oracle(), tags=("graph", "dedup", "ml"))
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction on the near-dup graph: for each
    NON-adjacent pair (u < v) sharing ≥1 neighbor, count the shared
    neighbors; top-100 by (count desc, u, v) — the "these two clusters
    are about to merge" review queue a dedup pipeline surfaces to
    humans. Completes the graph family (components / pagerank / label
    propagation / triangles / link prediction).

    Scale story: the same oriented 2-path equi-join discipline as
    graph_triangle_count — edges shuffle on the midpoint key, u < v
    halves the candidate space, and the existing-edge removal is one
    left-anti join on the pair key. Count per candidate pair is exact
    (COUNT(*), no distinct needed: midpoints are unique per (u,x,v) path
    because the edge list is a set). Final top-k is
    TakeOrderedAndProject — no global sort materializes. Candidate
    volume is bounded by Σ_x deg(x)², the triangle-join envelope already
    stress-adjudicated at 10× (SCALE.md); for skew beyond that the
    standard mitigation is capping deg(x) like dedup_stopshingle's
    df-cap (documented, not needed at this corpus's degree ceiling)."""
    from etl_cnpjs_spark.plans.dedup import _exact_pairs

    pairs = _exact_pairs(spark, sf_dir).select("i", "j")
    fwd = pairs.select(F.col("i").alias("a"), F.col("j").alias("b"))
    rev = pairs.select(F.col("j").alias("a"), F.col("i").alias("b"))
    edges = fwd.unionAll(rev)
    e1 = edges.select(F.col("a").alias("u"), F.col("b").alias("x"))
    e2 = edges.select(F.col("a").alias("x"), F.col("b").alias("v"))
    two_path = (
        e1.join(e2, "x")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common_cnt"))
    )
    nonadj = two_path.join(
        pairs,
        (two_path["u"] == pairs["i"]) & (two_path["v"] == pairs["j"]),
        "left_anti",
    )
    return nonadj.orderBy(F.desc("common_cnt"), "u", "v").limit(_CN_TOPK)


# --- agg_corr_matrix ---------------------------------------------------------

_CORR_VARS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_CORR_PAIRS = (
    ("q", "e"), ("q", "d"), ("q", "t"), ("e", "d"), ("e", "t"), ("d", "t")
)
_CORR_SHORT = {"q": "l_quantity", "e": "l_extendedprice", "d": "l_discount", "t": "l_tax"}


def _corr_oracle() -> str:
    scaled = ",\n             ".join(
        f"CAST(floor({col} * 100 + 0.5) AS BIGINT) AS {s}"
        for s, col in _CORR_SHORT.items()
    )
    sums = ",\n             ".join(
        [f"CAST(COUNT(*) AS DOUBLE) AS n"]
        + [
            f"CAST(SUM(CAST({s} AS DECIMAL(38,0))) AS DOUBLE) AS s_{s}"
            for s in _CORR_SHORT
        ]
        + [
            f"CAST(SUM(CAST({a} * {b} AS DECIMAL(38,0))) AS DOUBLE) AS s_{a}{b}"
            for a in _CORR_SHORT
            for b in _CORR_SHORT
            if a <= b
        ]
    )
    corrs = ",\n           ".join(
        quantize_sql(
            f"(n * s_{min(a,b)}{max(a,b)} - s_{a} * s_{b})"
            f" / sqrt((n * s_{a}{a} - s_{a} * s_{a})"
            f" * (n * s_{b}{b} - s_{b} * s_{b}))"
        )
        + f" AS corr_{a}_{b}"
        for a, b in _CORR_PAIRS
    )
    return f"""
    WITH q AS (
      SELECT {scaled}
      FROM lineitem),
    m AS (
      SELECT {sums}
      FROM q)
    SELECT CAST(n AS BIGINT) AS n_rows,
           {corrs}
    FROM m
    """


@register("agg_corr_matrix", oracle=_corr_oracle(), tags=("agg", "ml", "stats"))
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pairwise Pearson correlation matrix over lineitem's four
    numeric measures (quantity, extendedprice, discount, tax) — the
    multivariate sibling of agg_linreg and the feature-screening step an
    ML pipeline runs before training. Same exactness discipline: inputs
    quantized to integer cents (scale factors cancel in Pearson),
    per-row products in bounded bigint, DECIMAL(38,0) accumulation, one
    textually-mirrored float expression per coefficient, 1e-6 output
    quantization.

    Scale story: ALL 15 sufficient statistics ride ONE global aggregate
    — partial (map-side) combine reduces every partition to a single
    15-value row, so the exchange carries |partitions| rows total; the
    d² cross-moment trick is the same one embedding_gram uses for its
    dim² matrix. Adding variables grows the row width, never the
    shuffle row count."""
    li = table(spark, sf_dir, "lineitem")
    q = li.select(
        *[
            F.floor(F.col(col) * 100 + 0.5).cast("bigint").alias(s)
            for s, col in _CORR_SHORT.items()
        ]
    )
    dec = "decimal(38,0)"
    aggs = (
        [F.count(F.lit(1)).cast("double").alias("n")]
        + [F.sum(F.col(s).cast(dec)).cast("double").alias(f"s_{s}") for s in _CORR_SHORT]
        + [
            F.sum((F.col(a) * F.col(b)).cast(dec)).cast("double").alias(f"s_{a}{b}")
            for a in _CORR_SHORT
            for b in _CORR_SHORT
            if a <= b
        ]
    )
    m = q.agg(*aggs)

    def corr(a: str, b: str):
        lo, hi = min(a, b), max(a, b)
        num = F.col("n") * F.col(f"s_{lo}{hi}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        va = F.col("n") * F.col(f"s_{a}{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        vb = F.col("n") * F.col(f"s_{b}{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        return quantize(num / F.sqrt(va * vb))

    return m.select(
        F.col("n").cast("bigint").alias("n_rows"),
        *[corr(a, b).alias(f"corr_{a}_{b}") for a, b in _CORR_PAIRS],
    )


# --- join_asof_nearest -------------------------------------------------------


@register(
    "join_asof_nearest",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id FROM (
        SELECT user_id, ts, event_id,
               row_number() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase') t
      WHERE rn = 1),
    u AS (
      SELECT user_id, ts, 0 AS kind, event_id, NULL AS p_id
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, 1 AS kind, event_id, event_id AS p_id FROM p),
    w AS (
      SELECT user_id, ts, kind, event_id,
             last_value(CASE WHEN kind = 1 THEN ts END IGNORE NULLS)
               OVER wb AS back_ts,
             last_value(p_id IGNORE NULLS) OVER wb AS back_id,
             first_value(CASE WHEN kind = 1 THEN ts END IGNORE NULLS)
               OVER wf AS fwd_ts,
             first_value(p_id IGNORE NULLS) OVER wf AS fwd_id
      FROM u
      WINDOW
        wb AS (PARTITION BY user_id ORDER BY ts, kind DESC, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wf AS (PARTITION BY user_id ORDER BY ts, kind DESC, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
    SELECT event_id, user_id, ts,
           CASE WHEN fwd_ts IS NULL THEN back_id
                WHEN back_ts IS NULL THEN fwd_id
                WHEN epoch_us(ts) - epoch_us(back_ts)
                     <= epoch_us(fwd_ts) - epoch_us(ts) THEN back_id
                ELSE fwd_id END AS near_p_id,
           CASE WHEN fwd_ts IS NULL THEN epoch_us(ts) - epoch_us(back_ts)
                WHEN back_ts IS NULL THEN epoch_us(fwd_ts) - epoch_us(ts)
                ELSE least(epoch_us(ts) - epoch_us(back_ts),
                           epoch_us(fwd_ts) - epoch_us(ts)) END AS near_diff_us
    FROM w WHERE kind = 0
    """,
    tags=("join", "asof", "timeseries"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas merge_asof
    direction='nearest'): each click pairs with its temporally CLOSEST
    purchase by the same user — before OR after — completing the as-of
    family (backward join_asof, tolerance join_asof_tolerance). Ties
    break toward the backward match; same-timestamp purchases dedup to
    max event_id first (join_asof_tolerance's rule).

    Scale story: the union-tag formulation, not a join — both streams
    union with a kind tag, ONE exchange on user_id, and two RUNNING
    window passes (backward last_value IGNORE NULLS to the current row;
    forward as last_value over the exactly-reversed sort ending one row
    before current — a (1, +inf) frame is Spark's quadratic shrinking
    class, see events_interpolate_linear) resolve both candidates; the
    same-ts containment rule is encoded purely in the sort key (ts,
    kind DESC, event_id), so a purchase at the click's exact timestamp
    sorts before it — visible backward, invisible forward, never double
    counted. No per-row probe join, no range join, state is one value
    per direction — this is the shape that survives a billion-event
    partition. Both engines run the identical window program."""
    ev = table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    pr = ev.filter(F.col("event_type") == "purchase")
    rn = F.row_number().over(
        W.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    )
    p = (
        pr.select("user_id", "ts", "event_id", rn.alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        "event_id",
        F.lit(None).cast("long").alias("p_id"),
    )
    purch = p.select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        "event_id",
        F.col("event_id").alias("p_id"),
    )
    u = clicks.unionAll(purch)
    order = [F.col("ts"), F.col("kind").desc(), F.col("event_id")]
    wb = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # forward candidate as a RUNNING frame over the exactly-reversed
    # order, ending one row before current ((1, +inf) frames are the
    # quadratic shrinking-frame class — see events_interpolate_linear)
    order_desc = [F.col("ts").desc(), F.col("kind"), F.col("event_id").desc()]
    wfd = (
        W.partitionBy("user_id")
        .orderBy(*order_desc)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    p_ts = F.when(F.col("kind") == 1, F.col("ts"))
    w = u.select(
        "user_id",
        "ts",
        "kind",
        "event_id",
        F.last(p_ts, ignorenulls=True).over(wb).alias("back_ts"),
        F.last(F.col("p_id"), ignorenulls=True).over(wb).alias("back_id"),
        F.last(p_ts, ignorenulls=True).over(wfd).alias("fwd_ts"),
        F.last(F.col("p_id"), ignorenulls=True).over(wfd).alias("fwd_id"),
    )
    back_d = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("back_ts"))
    fwd_d = F.unix_micros(F.col("fwd_ts")) - F.unix_micros(F.col("ts"))
    return w.filter(F.col("kind") == 0).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("fwd_ts").isNull(), F.col("back_id"))
        .when(F.col("back_ts").isNull(), F.col("fwd_id"))
        .when(back_d <= fwd_d, F.col("back_id"))
        .otherwise(F.col("fwd_id"))
        .alias("near_p_id"),
        F.when(F.col("fwd_ts").isNull(), back_d)
        .when(F.col("back_ts").isNull(), fwd_d)
        .otherwise(F.least(back_d, fwd_d))
        .alias("near_diff_us"),
    )


# --- events_gap_detect -------------------------------------------------------

_GAP_US = 2 * 24 * 3600 * 1_000_000  # report gaps longer than 2 days


@register(
    "events_gap_detect",
    oracle=f"""
    WITH s AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
      FROM events)
    SELECT user_id, prev_ts AS gap_start, ts AS gap_end,
           epoch_us(ts) - epoch_us(prev_ts) AS gap_us
    FROM s
    WHERE prev_ts IS NOT NULL
      AND epoch_us(ts) - epoch_us(prev_ts) > {_GAP_US}
    """,
    tags=("events", "timeseries", "dq"),
)
def events_gap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-data gap detection: per user, consecutive-event spacings
    exceeding 2 days, emitted as (gap_start, gap_end, gap_us) intervals
    — the time-series data-quality complement of events_sessionize
    (which groups activity; this reports the silence between). The lag
    window shares events_sessionize's total order (ts, event_id) so tied
    timestamps are deterministic.

    Scale story: one exchange on user_id, one per-partition sort, one
    lag — the minimal window envelope; the filter keeps only gap rows,
    so output is sparse by construction. Microsecond integer arithmetic
    end to end (unix_micros ≡ DuckDB epoch_us): no float boundary."""
    ev = table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id", "ts", "event_id", F.lag("ts").over(w).alias("prev_ts")
    )
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts"))
    return (
        s.filter(F.col("prev_ts").isNotNull() & (gap > _GAP_US))
        .select(
            "user_id",
            F.col("prev_ts").alias("gap_start"),
            F.col("ts").alias("gap_end"),
            gap.alias("gap_us"),
        )
    )


# --- agg_diversity -----------------------------------------------------------

_DIV_COHORTS = 16


@register(
    "agg_diversity",
    oracle=f"""
    WITH c AS (
      SELECT user_id % {_DIV_COHORTS} AS cohort, event_type,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT cohort,
             CAST(SUM(cnt) AS BIGINT)        AS total,
             CAST(SUM(cnt * cnt) AS BIGINT)  AS sumsq,
             CAST(COUNT(*) AS BIGINT)        AS n_types
      FROM c GROUP BY cohort)
    SELECT cohort, total, n_types,
           1.0 - CAST(sumsq AS DOUBLE) / (CAST(total AS DOUBLE)
                                          * CAST(total AS DOUBLE)) AS gini_simpson
    FROM m
    """,
    tags=("agg", "stats", "diversity"),
)
def agg_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity index per user cohort: the Gini–Simpson
    index 1 − Σpᵢ² of each cohort's event-type mix — the
    category-concentration metric (ecology's Simpson, economics'
    inverse-Herfindahl). Chosen over Shannon entropy deliberately:
    entropy needs log(), which is NOT correctly-rounded libm math and
    can differ by an ulp between the JVM and C runtimes — Gini–Simpson
    is one exact integer ratio (Σcnt², total²) and a single mirrored
    double division, so the oracle holds bit-exact with no quantization.

    Scale story: two stacked map-side-combinable aggregates — the first
    exchange carries (cohort × event_type) partial counts, the second
    |cohorts| rows; AQE coalesces both. The sumsq trick turns a
    per-category distribution metric into plain sums — no window, no
    collect, and sketch-mergeable across days the way agg_countmin_merge
    verifies (Σcnt² of merged counts ≠ Σ of daily Σcnt², so true
    rollups re-merge counts first — documented for the rollup user)."""
    ev = table(spark, sf_dir, "events", parallel=True)
    c = (
        ev.select((F.col("user_id") % _DIV_COHORTS).alias("cohort"), "event_type")
        .groupBy("cohort", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    m = c.groupBy("cohort").agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("sumsq"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    return m.select(
        "cohort",
        "total",
        "n_types",
        (
            F.lit(1.0)
            - F.col("sumsq").cast("double")
            / (F.col("total").cast("double") * F.col("total").cast("double"))
        ).alias("gini_simpson"),
    )


# --- events_forecast_eval ----------------------------------------------------

_SEASON_S = 7 * 24 * 3600  # seasonal-naive lag: same hour last week


@register(
    "events_forecast_eval",
    oracle=f"""
    WITH h AS (
      SELECT event_type,
             (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS hour_s,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    j AS (
      SELECT a.event_type, a.hour_s, a.cnt AS actual, f.cnt AS forecast
      FROM h a JOIN h f
        ON a.event_type = f.event_type AND a.hour_s = f.hour_s + {_SEASON_S})
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)                        AS n_hours,
           CAST(SUM(abs(actual - forecast)) AS BIGINT)     AS abs_err_sum,
           CAST(SUM(actual - forecast) AS BIGINT)          AS bias_sum,
           CAST(SUM(abs(actual - forecast)) AS BIGINT)
             * 1000000 // CAST(COUNT(*) AS BIGINT)         AS mae_ppm
    FROM j GROUP BY event_type
    """,
    tags=("events", "timeseries", "forecast", "ml"),
)
def events_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest: the seasonal-naive baseline (ŷ(h) = actual at
    h − 1 week) evaluated against realized hourly volumes per series —
    the evaluation harness every demand/traffic forecasting pipeline
    runs, and the baseline any model must beat. Reported per series:
    matched hours, total absolute error, signed bias, and MAE in
    parts-per-million (bigint DIV — sharp edge #8's portable ratio
    form; counts are integers so the whole key is float-free).

    Scale story: the hourly rollup is one map-side-combined aggregate
    (hour grain, input-size-independent output); the forecast join is a
    self equi-join on (series, shifted hour) — same-keyed, so AQE plans
    both sides from one exchange-sized frame; the metric rollup
    collapses to |series| rows. No window over raw events, no explode:
    everything past the first aggregate is hour-grain."""
    ev = table(spark, sf_dir, "events")
    hour_s = (F.unix_timestamp("ts") / 3600).cast("bigint") * 3600
    h = (
        ev.select("event_type", hour_s.alias("hour_s"))
        .groupBy("event_type", "hour_s")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    a = h.select("event_type", "hour_s", F.col("cnt").alias("actual"))
    f_ = h.select(
        F.col("event_type").alias("f_type"),
        (F.col("hour_s") + _SEASON_S).alias("f_hour"),
        F.col("cnt").alias("forecast"),
    )
    j = a.join(
        f_,
        (F.col("event_type") == F.col("f_type")) & (F.col("hour_s") == F.col("f_hour")),
    )
    d = F.col("actual") - F.col("forecast")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum(F.abs(d)).cast("bigint").alias("abs_err_sum"),
        F.sum(d).cast("bigint").alias("bias_sum"),
    ).select(
        "event_type",
        "n_hours",
        "abs_err_sum",
        "bias_sum",
        F.expr("abs_err_sum * 1000000 DIV n_hours").alias("mae_ppm"),
    )


# --- fn_collation ------------------------------------------------------------


@register(
    "fn_collation",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                  ELSE lower(c_mktsegment) END AS seg,
             c_acctbal
      FROM customer)
    SELECT lower(seg) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_binary_variants
    FROM mixed GROUP BY lower(seg)
    """,
    tags=("fn", "string", "collation"),
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 COLLATE): a deterministically
    case-mangled segment column groups under UTF8_LCASE so 'BUILDING'
    and 'building' land in ONE group — the engine-level answer to
    case-insensitive keys that the reference handles by hand-lowering
    columns (etl.py's case-insensitive column quirk, SURVEY §2.3). The
    output key is normalized through lower() because a collated GROUP BY
    exposes an arbitrary representative of each equivalence class —
    emitting the raw representative would be nondeterministic across
    partitionings (documented trap). n_binary_variants counts the
    distinct raw spellings folded into each group (2 here: the CASE
    mangle produces exactly upper and lower), pinning that the grouping
    really ran collation-aware, not pre-lowered.

    Scale story — measured, not assumed: Spark 4.1 plans a collated
    GROUP BY as **SortAggregate**, not HashAggregate (collated keys are
    not hash-aggregable yet), so collation costs a per-partition sort on
    top of the one exchange — the "collation tax" (pinned in
    tests/test_plans.py). At 100 TB that argues for pre-folding with
    lower() when the collation is a plain case-fold and reserving
    COLLATE for locale rules lower() can't express — exactly the
    equivalence this key's lower()-based DuckDB oracle verifies."""
    c = table(spark, sf_dir, "customer")
    mixed = c.select(
        F.when(F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment"))
        .otherwise(F.lower("c_mktsegment"))
        .alias("seg")
    )
    g = mixed.groupBy(F.collate(F.col("seg"), "UTF8_LCASE").alias("cseg")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        # seg (binary collation) is still visible pre-aggregation: count
        # the raw spellings folded into each collated group
        F.count_distinct(F.col("seg")).cast("bigint").alias("n_binary_variants"),
    )
    return g.select(
        F.lower(F.col("cseg")).cast("string").alias("segment"),
        "n",
        "n_binary_variants",
    )


# --- bag-semantics set operations -------------------------------------------
#
# set_union/intersect/except (plans/relational.py) are the DISTINCT
# forms; these are their ALL (multiset) twins — the semantics SQL uses
# for reconciliation workloads ("which rows are missing, counting
# multiplicity?"), where collapsing duplicates hides real deltas.

_SETALL_A = "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"
_SETALL_B = "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'"


@register(
    "set_except_all",
    oracle=f"{_SETALL_A} EXCEPT ALL {_SETALL_B}",
    tags=("setop", "bag"),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: per-key multiplicity subtraction — a customer with 5
    'F' orders and 2 'O' orders survives 3 times (the distinct form
    erases them entirely the moment ONE 'O' order exists). Spark's
    exceptAll plans this as a counted anti-semantics via aggregate+
    generate, not a row-by-row loop; one exchange per side on the full
    row key. The reconciliation primitive: diffing a reload against a
    previous load catches dropped DUPLICATES only under bag semantics
    (the reference's rerun-duplication quirk, SURVEY §3.2, is exactly
    such a delta)."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.exceptAll(b)


@register(
    "set_intersect_all",
    oracle=f"{_SETALL_A} INTERSECT ALL {_SETALL_B}",
    tags=("setop", "bag"),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: min-of-multiplicities overlap — how many order
    slots a customer fills in BOTH statuses. Same counted-aggregate
    physical shape as exceptAll."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersectAll(b)


# --- events_markov_transitions ----------------------------------------------


@register(
    "events_markov_transitions",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    t AS (
      SELECT prev_type, event_type AS next_type,
             CAST(count(*) AS BIGINT) AS cnt
      FROM s WHERE prev_type IS NOT NULL
      GROUP BY 1, 2),
    r AS (
      SELECT prev_type,
             CAST(SUM(cnt) AS BIGINT) AS row_total
      FROM t GROUP BY prev_type)
    SELECT t.prev_type, t.next_type, t.cnt,
           t.cnt * 1000000 // r.row_total AS p_ppm
    FROM t JOIN r ON t.prev_type = r.prev_type
    """,
    tags=("events", "sequence", "ml", "stats"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition statistics over user event
    sequences: for each (prev → next) event-type pair, the observed
    count and row-normalized transition probability in ppm — the
    sequence-modeling sufficient statistic behind next-action
    prediction, funnel leak analysis, and bot detection (a user whose
    transition row diverges from the population matrix). Sequences
    order by (ts, event_id) — the same total order sessionize and
    gap_detect share — so tied timestamps are deterministic.

    Scale story: one user-keyed window exchange (the lag), then the
    pair rollup collapses to |types|² rows map-side and the row-total
    join runs on that tiny frame — at any input volume everything past
    the lag is alphabet-sized. Probabilities are bigint DIV ppm (sharp
    edge #8): float-free, so the oracle holds with no quantization."""
    ev = table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    t = (
        s.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    r = t.groupBy("prev_type").agg(F.sum("cnt").cast("bigint").alias("row_total"))
    return (
        t.join(F.broadcast(r), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "cnt",
            F.expr("cnt * 1000000 DIV row_total").alias("p_ppm"),
        )
    )


# --- events_interpolate_linear ----------------------------------------------


def _interp_oracle() -> str:
    interp = (
        "pv + (nv - pv) * (CAST(epoch_us(hour_ts) - epoch_us(pt) AS DOUBLE)"
        " / CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE))"
    )
    return f"""
    WITH b AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS h0,
                      date_trunc('hour', max(ts)) AS h1
      FROM events GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts
      FROM b),
    hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour_ts,
             CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sv
      FROM events GROUP BY 1, 2),
    g AS (
      SELECT gr.user_id, gr.hour_ts, h.sv,
             last_value(h.sv IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN h.sv IS NOT NULL THEN gr.hour_ts END
                        IGNORE NULLS) OVER wb      AS pt,
             first_value(h.sv IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN h.sv IS NOT NULL THEN gr.hour_ts END
                         IGNORE NULLS) OVER wf     AS nt
      FROM grid gr LEFT JOIN hourly h
        ON gr.user_id = h.user_id AND gr.hour_ts = h.hour_ts
      WINDOW
        wb AS (PARTITION BY gr.user_id ORDER BY gr.hour_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wf AS (PARTITION BY gr.user_id ORDER BY gr.hour_ts
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, hour_ts, sv AS observed,
           CASE WHEN sv IS NOT NULL THEN sv
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE floor(({interp}) * 1e6 + 0.5) / 1e6 END AS interp_value
    FROM g
    """


@register(
    "events_interpolate_linear",
    oracle=_interp_oracle(),
    tags=("events", "timeseries", "resample", "ml"),
)
def events_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap interpolation on the dense hourly grid — the
    feature-engineering companion to events_resample's forward fill
    (ffill carries stale values into gaps; ML feature pipelines usually
    want the line between the neighbors instead). Edge cells clamp to
    the nearest observation; observed cells pass through their exact
    value (quantization applies only to genuinely interpolated cells,
    so the key never perturbs real data).

    Scale story (r14 rework, guide §2.4 — the events_resample envelope):
    the dense grid is DERIVED from the hourly aggregate itself, not
    joined onto it. One scan feeds one (user, hour) aggregate; the
    neighbor carries run at HOURLY grain inside one user-keyed
    exchange — an ascending running frame for (pv, pt) plus lead(next
    observed hour), and a descending running frame ENDING AT -1 for
    (nv, nt) strictly after the row (so an all-null-value hour looks
    through itself exactly as the old grid windows did); each observed
    row then explodes sequence(hour, next-1h), and every cell it owns
    shares its carries (no observation sits between two consecutive
    observed hours, so the per-cell prev/next ARE the row's). The old
    shape scanned events twice, joined the grid onto hourly, and
    sorted twice at GRID grain; this is one scan, one exchange, two
    hourly-grain sorts, no join — value-identical at 3 SFs. The
    descending pass stays a RUNNING frame (a [current, +inf) frame is
    Spark-quadratic — the r12 measured 7× note). The interpolation
    weight is an exact integer µs ratio in one mirrored double
    expression; output quantizes to 1e-6 (floor form, never round())."""
    ev = table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("sv"))
    w = W.partitionBy("user_id").orderBy("hour_ts")
    wb = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    # next-side carries over reversed order, frame ending 1 BEFORE the
    # current row: the nearest LATER observed hour with a non-null sum
    wfd = (
        W.partitionBy("user_id")
        .orderBy(F.desc("hour_ts"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    obs_ts = F.when(F.col("sv").isNotNull(), F.col("hour_ts"))
    g = hourly.select(
        "user_id",
        F.col("hour_ts").alias("__obs"),
        "sv",
        F.lead("hour_ts").over(w).alias("__next"),
        F.last("sv", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_ts, ignorenulls=True).over(wb).alias("pt"),
        F.last("sv", ignorenulls=True).over(wfd).alias("nv"),
        F.last(obs_ts, ignorenulls=True).over(wfd).alias("nt"),
    )
    cells = g.select(
        "user_id",
        "__obs",
        "sv",
        "pv",
        "pt",
        "nv",
        "nt",
        F.explode(
            F.when(
                F.col("__next").isNull(), F.array(F.col("__obs"))
            ).otherwise(
                F.expr("sequence(__obs, __next - interval 1 hour, interval 1 hour)")
            )
        ).alias("hour_ts"),
    )
    # the cell's own observation: the owning row's sum at the observed
    # hour, NULL at the gap cells it owns
    sv_c = F.when(F.col("hour_ts") == F.col("__obs"), F.col("sv"))
    num = (F.unix_micros(F.col("hour_ts")) - F.unix_micros(F.col("pt"))).cast("double")
    den = (F.unix_micros(F.col("nt")) - F.unix_micros(F.col("pt"))).cast("double")
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (num / den)
    return cells.select(
        "user_id",
        "hour_ts",
        sv_c.alias("observed"),
        F.when(sv_c.isNotNull(), sv_c)
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.floor(interp * 1e6 + 0.5) / 1e6)
        .alias("interp_value"),
    )


# --- scan_xml ----------------------------------------------------------------


@register(
    "scan_xml",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer WHERE c_nationkey IN (3, 7) AND c_acctbal > 0
    """,
    tags=("scan", "sink", "xml", "format"),
)
def scan_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML FILE FORMAT round trip — Spark 4's built-in XML data source
    (the spark-xml package graduated into core), distinct from fn_xml
    which exercises the from_xml/to_xml STRING kernel on columns. Write
    the slice as <row> elements, read back with a DECLARED schema
    (never inferred — same O5 rule as every reader here). Completes the
    format family: csv / parquet / orc / json / text / binaryfile /
    xml all round-trip or scan with pushdown adjudicated per format
    (XML, like JSON, is a row-parse format: no column pruning at the
    scan, so at 100 TB it's an INGEST format you convert to parquet
    once — the docstring IS that guidance). Doubles survive via
    shortest-round-trip formatting, as with the JSON/CSV sinks."""
    import os
    import tempfile

    from etl_cnpjs_spark.plans.sinks import _slice

    out = os.path.join(tempfile.mkdtemp(prefix="scan_xml_"), "slice_xml")
    (
        _slice(spark, sf_dir)
        .write.format("xml")
        .option("rootTag", "customers")
        .option("rowTag", "customer")
        .save(out)
    )
    return (
        spark.read.format("xml")
        .option("rowTag", "customer")
        .schema(
            "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"
        )
        .load(out)
    )
