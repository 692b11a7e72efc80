"""Round-6 session-2 surface growth: geo distance math, Benford-law DQ
screening, seasonality profiles, two-sample KS drift testing, IQR
outlier fences, degree distributions of the near-dup graph, a JSON
sink round trip, and Zipf rank-frequency slope fitting.

Reference trace: the reference computes one join+filter aggregate
(ETLCNPJFinalEmpresaEstabelecimentos.py:191-234) and has none of this
surface; these extend the fn/dq/events/graph/sink/text families along
the SURVEY.md §2.2b growth directions, each with a full DuckDB oracle.

Determinism notes (registry rules + the libm discipline):
- trig/log chains (haversine, Zipf) are micro-quantized via the
  shared floor(x*10^d + 0.5)/10^d helper BEFORE leaving the row, and
  anything summed across rows is quantized INTO INTEGER units first so
  accumulation is bigint arithmetic (order-insensitive, bit-exact);
- all rates are ppm integers (// in DuckDB, DIV in Spark);
- percentiles are DISCRETE picked elements (percentile_disc ≡
  quantile_disc — the extended7 sharp edge), so the IQR fences are
  arithmetic over exact parquet doubles, identical in both engines;
- Benford expectations are precomputed integer ppm literals (the same
  9 constants in both texts), not runtime log10 calls.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.plans.registry import quantize, quantize_sql, register

# --- fn_geo_haversine -------------------------------------------------------
#
# Great-circle distance (haversine) from a derived store location per
# customer to one reference point — the geo primitive behind
# join_spatial_grid/knn's planar tiers when coordinates are spherical.
# Coordinates are derived deterministically from c_custkey (the testdata
# has no geo columns): integer modular scatter into centi-degrees, so
# lat/lon are exact double quotients of identical integers in both
# engines.

_GEO_LAT0 = "-23.55"   # reference point (São Paulo), textual literal
_GEO_LON0 = "-46.63"   # so both engines parse the identical double
_GEO_PI = "3.141592653589793"
_GEO_R2 = "12742.0"    # 2 * Earth radius (km)


def _hav_sql() -> str:
    rad = f"({_GEO_PI} / 180.0)"
    return f"""
    WITH c AS (
      SELECT c_custkey,
             (c_custkey * 7919 % 18000) / 100.0 - 90.0   AS lat,
             (c_custkey * 104729 % 36000) / 100.0 - 180.0 AS lon
      FROM customer),
    h AS (
      SELECT c_custkey, lat, lon,
             sin((lat - ({_GEO_LAT0})) * {rad} / 2.0) AS sp,
             sin((lon - ({_GEO_LON0})) * {rad} / 2.0) AS sl,
             cos(lat * {rad}) * cos(({_GEO_LAT0}) * {rad}) AS cc
      FROM c)
    SELECT c_custkey, lat, lon,
           {quantize_sql(f"{_GEO_R2} * asin(sqrt(sp * sp + cc * sl * sl))", 4)}
             AS dist_km
    FROM h
    """


@register("fn_geo_haversine", oracle=_hav_sql(), tags=("fn", "geo"))
def fn_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer haversine distance to a fixed reference point.

    Determinism: lat/lon are exact (integer modular scatter ÷ 100),
    the trig chain (sin/cos/asin/sqrt over java.lang.Math vs C libm)
    can drift by ulps, so the FINAL distance is quantized to 1e-4 km
    (10 cm) — far coarser than the ~1e-12 km worst-case drift, same
    posture as text_tfidf's log quantization. Scale story: pure
    narrow-map over the scan — no shuffle, whole-stage codegen
    end-to-end; at 100 TB this is scan-bound and perfectly parallel."""
    rad = F.lit(float(_GEO_PI)) / F.lit(180.0)
    lat0 = F.lit(float(_GEO_LAT0))
    lon0 = F.lit(float(_GEO_LON0))
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7919 % 18000) / 100.0 - 90.0).alias("lat"),
        ((F.col("c_custkey") * 104729 % 36000) / 100.0 - 180.0).alias("lon"),
    )
    sp = F.sin((F.col("lat") - lat0) * rad / 2.0)
    sl = F.sin((F.col("lon") - lon0) * rad / 2.0)
    cc = F.cos(F.col("lat") * rad) * F.cos(lat0 * rad)
    h = c.select(
        "c_custkey", "lat", "lon",
        sp.alias("sp"), sl.alias("sl"), cc.alias("cc"),
    )
    d = F.lit(float(_GEO_R2)) * F.asin(
        F.sqrt(F.col("sp") * F.col("sp") + F.col("cc") * F.col("sl") * F.col("sl"))
    )
    return h.select("c_custkey", "lat", "lon", quantize(d, 4).alias("dist_km"))


# --- agg_benford ------------------------------------------------------------
#
# Benford's-law first-digit screen over order totals — the classic
# forensic DQ test (fraud/fabrication detection on financial facts).
# Expected shares log10(1+1/d) are PRECOMPUTED integer ppm literals
# (no runtime log10 → no libm in the oracle path at all); the first
# digit comes from the integer part via bigint→string (never
# double→string, whose repr rules differ between engines).

_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def _benford_sql() -> str:
    case = " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items())
    return f"""
    WITH f AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1.0),
    g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1)
    SELECT digit, n,
           CAST(n * 1000000 // (SELECT CAST(sum(n) AS BIGINT) FROM g)
                AS BIGINT)                                   AS observed_ppm,
           CAST(CASE digit {case} END AS BIGINT)             AS expected_ppm,
           CAST(n * 1000000 // (SELECT CAST(sum(n) AS BIGINT) FROM g)
             - CAST(CASE digit {case} END AS BIGINT)
                AS BIGINT)                                   AS deviation_ppm
    FROM g
    """


@register("agg_benford", oracle=_benford_sql(), tags=("agg", "dq"))
def agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution vs Benford expectation.

    Shapes: one map-side-combinable 9-group aggregate, then a window
    total over the 9-row result (post-agg, driver-sized — not a data
    shuffle). All output columns are bigint (count, ppm via integer
    DIV, literal expectations) — bit-exact by construction. At 100 TB
    the digit extraction is codegen string ops on the scan; the
    exchange carries 9 partial rows per task."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1.0)
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    g = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    mapping = F.create_map(
        *[F.lit(x) for d, p in _BENFORD_PPM.items() for x in (d, p)]
    )
    g = g.withColumn("_total", F.sum("n").over(Window.partitionBy()))
    return g.select(
        "digit",
        "n",
        F.expr("n * 1000000 DIV _total").cast("bigint").alias("observed_ppm"),
        mapping[F.col("digit")].cast("bigint").alias("expected_ppm"),
        (
            F.expr("n * 1000000 DIV _total")
            - mapping[F.col("digit")].cast("bigint")
        ).cast("bigint").alias("deviation_ppm"),
    )


# --- events_seasonality -----------------------------------------------------
#
# Day-of-week × hour-of-day activity profile per event type — the
# seasonality heatmap behind capacity planning and anomaly baselines
# (events_anomaly's hourly z-scores assume this profile exists). DOW is
# computed as (epoch_days + 4) % 7 (epoch day 0 = Thursday; 0 = Sunday)
# — pure integer arithmetic, immune to the engines' differing
# dayofweek() origin conventions.


_SEASON_SQL = """
    WITH b AS (
      SELECT event_type,
             (datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7 AS dow,
             CAST(hour(ts) AS BIGINT) AS hod
      FROM events),
    g AS (SELECT event_type, dow, hod, CAST(count(*) AS BIGINT) AS n
          FROM b GROUP BY 1, 2, 3)
    SELECT event_type, CAST(dow AS BIGINT) AS dow, hod, n,
           CAST(n * 1000000
                // CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
                AS BIGINT) AS share_ppm
    FROM g
    """


@register("events_seasonality", oracle=_SEASON_SQL, tags=("events", "analytics"))
def events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality profile: counts and within-type share per
    (event_type, dow, hour) cell.

    Shapes: one hash(event_type, dow, hod) aggregate with map-side
    combine (≤ |types|·168 groups — tiny), then a window total over
    the aggregated frame partitioned by event_type. At 100 TB the
    exchange carries at most 168 rows per type per task; the window
    runs over a driver-trivial frame. All-integer output."""
    ev = table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        (
            (F.datediff(F.to_date("ts"), F.lit("1970-01-01")) + 4) % 7
        ).cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hod"),
    )
    g = b.groupBy("event_type", "dow", "hod").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("event_type")
    return g.withColumn("_total", F.sum("n").over(w)).select(
        "event_type", "dow", "hod", "n",
        F.expr("n * 1000000 DIV _total").cast("bigint").alias("share_ppm"),
    )


# --- events_ks_test ---------------------------------------------------------
#
# Two-sample Kolmogorov–Smirnov statistic between the value
# distributions of two user cohorts, per event type — the
# distribution-level A/B screen next to events_ab_ttest's mean-level
# one, and the principled upgrade of dq_drift's fixed-bin PSI. The
# entire statistic is integer arithmetic: with cohort sizes n0, n1 and
# cumulative counts r0, r1 at each distinct value,
# sup|F0 − F1| = max|r0·n1 − r1·n0| / (n0·n1) — computed as a bigint
# max and ONE integer ppm division at the end.


_KS_SQL = """
    WITH b AS (
      SELECT event_type, value, user_id % 2 AS cohort FROM events),
    g AS (
      SELECT event_type, value,
             CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM b GROUP BY 1, 2),
    r AS (
      SELECT event_type,
             sum(c0) OVER (PARTITION BY event_type ORDER BY value
                           ROWS UNBOUNDED PRECEDING) AS r0,
             sum(c1) OVER (PARTITION BY event_type ORDER BY value
                           ROWS UNBOUNDED PRECEDING) AS r1,
             sum(c0) OVER (PARTITION BY event_type) AS n0,
             sum(c1) OVER (PARTITION BY event_type) AS n1
      FROM g)
    SELECT event_type,
           CAST(max(n0) AS BIGINT) AS n0,
           CAST(max(n1) AS BIGINT) AS n1,
           CAST(floor(CAST(max(abs(r0 * n1 - r1 * n0)) AS DOUBLE)
                      / (CAST(max(n0) AS DOUBLE) * CAST(max(n1) AS DOUBLE))
                      * 1000000 + 0.5) AS BIGINT) AS ks_ppm
    FROM r
    GROUP BY event_type
    HAVING max(n0) > 0 AND max(n1) > 0
    """


@register("events_ks_test", oracle=_KS_SQL, tags=("events", "stats", "dq"))
def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic (ppm) per event type, cohorts =
    user_id parity.

    Shapes: one hash(event_type, value) aggregate collapses the scan
    to distinct-value rows (map-side combined), one sort within
    event_type for the cumulative ranks, one final per-type max.
    Everything after the first aggregate is |distinct values| sized.
    Grouping/sorting on raw parquet doubles is bit-stable (identical
    bits in, identical order out — no arithmetic on the values).
    At 100 TB: the value-grid frame is the only exchange; a range
    partitioner on (event_type, value) keeps the window local."""
    ev = table(spark, sf_dir, "events")
    b = ev.select(
        "event_type", "value", (F.col("user_id") % 2).alias("cohort")
    )
    g = b.groupBy("event_type", "value").agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).cast("bigint").alias("c0"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).cast("bigint").alias("c1"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    r = g.select(
        "event_type",
        F.sum("c0").over(wcum).alias("r0"),
        F.sum("c1").over(wcum).alias("r1"),
        F.sum("c0").over(wall).alias("n0"),
        F.sum("c1").over(wall).alias("n1"),
    )
    out = (
        r.groupBy("event_type")
        .agg(
            F.max("n0").cast("bigint").alias("n0"),
            F.max("n1").cast("bigint").alias("n1"),
            F.max(F.abs(F.col("r0") * F.col("n1") - F.col("r1") * F.col("n0"))).alias(
                "_dmax"
            ),
        )
        .filter((F.col("n0") > 0) & (F.col("n1") > 0))
    )
    # ks in ppm via an exact double division (sup-diff and n0·n1 are
    # exact ints < 2^53 through sf100): a bigint `·1e6 DIV` would
    # overflow int64 around sf10 — same class as the ab_ttest fix.
    return out.select(
        "event_type", "n0", "n1",
        F.floor(
            F.col("_dmax").cast("double")
            / (F.col("n0").cast("double") * F.col("n1").cast("double"))
            * 1000000
            + 0.5
        ).cast("bigint").alias("ks_ppm"),
    )


# --- dq_outlier_iqr ---------------------------------------------------------
#
# Tukey-fence outlier screen per event type: Q1/Q3 as DISCRETE picked
# elements (percentile_disc ≡ quantile_disc, the extended7 sharp
# edge), fences at 1.5×IQR, and counts either side. Complements
# events_anomaly_mad (median/MAD robust z) with the boxplot-standard
# rule auditors expect.


_IQR_SQL = """
    WITH q AS (
      SELECT event_type,
             quantile_disc(value, 0.25) AS q1,
             quantile_disc(value, 0.75) AS q3
      FROM events GROUP BY 1)
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           min(q.q1) AS q1,
           min(q.q3) AS q3,
           CAST(sum(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_out_low,
           CAST(sum(CASE WHEN e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_out_high
    FROM events e JOIN q ON e.event_type = q.event_type
    GROUP BY 1
    """


@register("dq_outlier_iqr", oracle=_IQR_SQL, tags=("dq", "stats"))
def dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR (Tukey-fence) outlier counts per event type.

    Determinism: Q1/Q3 are picked elements (exact parquet doubles);
    the fence arithmetic q1 − 1.5·(q3 − q1) is the same three
    correctly-rounded double ops in both engines, so the comparison
    set is identical. Shapes: per-type discrete percentile (sort-agg
    over the type's values), then the fence count re-scans with the
    tiny quantile frame BROADCAST — two passes, one broadcast, no
    big-side shuffle for the second pass at 100 TB."""
    ev = table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").alias("q1"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)").alias("q3"),
    )
    j = ev.join(F.broadcast(q), "event_type")
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("q1").alias("q1"),
        F.min("q3").alias("q3"),
        F.sum(F.when(F.col("value") < lo, 1).otherwise(0)).cast("bigint").alias(
            "n_out_low"
        ),
        F.sum(F.when(F.col("value") > hi, 1).otherwise(0)).cast("bigint").alias(
            "n_out_high"
        ),
    )


# --- graph_degree_stats -----------------------------------------------------
#
# Degree distribution of the near-dup similarity graph — the
# histogram that tells a dedup operator whether the pair graph is
# sparse matching (degrees ≈ 1) or has template blowups (heavy tail),
# i.e. whether dedup_cluster's CC will converge in few rounds.
# Completes the graph family (pagerank/CC/triangles/jaccard/BFS) with
# the O(1)-depth structural profile.


def _deg_sql() -> str:
    from etl_cnpjs_spark.plans.dedup import _SQL_PAIRS

    return (
        _SQL_PAIRS
        + """
      , edges AS (SELECT i AS a FROM pairs UNION ALL SELECT j FROM pairs),
      deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS degree
              FROM edges GROUP BY 1),
      h AS (SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
            FROM deg GROUP BY 1)
      SELECT degree, n_nodes,
             CAST(n_nodes * 1000000
                  // (SELECT CAST(sum(n_nodes) AS BIGINT) FROM h)
                  AS BIGINT) AS share_ppm
      FROM h
    """
    )


@register("graph_degree_stats", oracle=_deg_sql(), tags=("graph", "dedup"))
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram (degree → node count, share in ppm) of the
    exact-Jaccard near-dup graph.

    Shapes: reuses the memoized pairs frame (one shingle+posting job
    per session, `dedup._exact_pairs`); then two map-side-combinable
    integer aggregates (node degrees, then the histogram) and a
    post-agg window total over the ≤ max-degree-row result. At corpus
    scale the degree frame is |nodes| and the histogram is tiny."""
    from etl_cnpjs_spark.plans.dedup import _exact_pairs

    pairs = _exact_pairs(spark, sf_dir)
    nodes = pairs.select(F.col("i").alias("a")).unionAll(
        pairs.select(F.col("j").alias("a"))
    )
    deg = nodes.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    h = deg.groupBy("degree").agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    w = Window.partitionBy()
    return (
        h.withColumn("_total", F.sum("n_nodes").over(w))
        .select(
            "degree", "n_nodes",
            F.expr("n_nodes * 1000000 DIV _total").cast("bigint").alias("share_ppm"),
        )
    )


# --- sink_json --------------------------------------------------------------
#
# JSON sink + scan round trip — the interchange format the sink family
# (parquet/CSV-BOM/partitioned/table/compact/idempotent) was missing.
# Doubles survive textual JSON because both the writer (Jackson
# shortest round-trip repr) and the reader (exact decimal→binary
# parse) are value-preserving; dates travel as ISO strings under an
# explicit read schema (never inferred — SURVEY §1.2 discipline).


_SINK_JSON_SQL = """
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_date
    FROM orders WHERE o_orderkey % 97 = 0
    """


@register("sink_json", oracle=_SINK_JSON_SQL, tags=("sink", "scan"))
def sink_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9-analog over JSON lines: write a keyed slice, read it back
    under a DECLARED schema, return the round-tripped rows.

    Scale story: JSON-lines is splittable — at 100 TB both the write
    (per-partition files, no coalesce in the scale path) and the read
    (line-split tasks) parallelize; schema-on-read skips the
    double-pass inference scan. The slice filter pushes to the
    parquet scan on the way out. The date round-trips as a DATE
    (ISO string in the JSON, DateType under the declared read
    schema) and is formatted to text only at the output boundary —
    the driver canonicalizer sees identical strings from both
    engines (Spark DateType surfaces as datetime.date, DuckDB DATE
    as pandas Timestamp — a type split, not a value one)."""
    from pyspark.sql import types as T

    sl = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.to_date("o_orderdate").alias("o_date"),
        )
    )
    out = os.path.join(tempfile.mkdtemp(prefix="sink_json_"), "slice.json")
    sl.write.mode("overwrite").json(out)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_date", T.DateType()),
        ]
    )
    back = spark.read.schema(schema).json(out)
    return back.withColumn("o_date", F.date_format("o_date", "yyyy-MM-dd"))


# --- text_zipf_slope --------------------------------------------------------
#
# Zipf rank-frequency slope per language: fit ln(freq) ≈ a + s·ln(rank)
# over the top-K token ranks by ordinary least squares. Natural-looking
# corpora give s ≈ −1; template/boilerplate-heavy or synthetic text
# drifts — a corpus-level quality fingerprint next to text_quality's
# per-doc scores. The regression is INTEGER arithmetic end-to-end:
# ln() values are quantized into milli-units (bigint) per rank row, the
# five OLS sums are bigint sums, and the slope is one double division
# of two bigints — order-insensitive and bit-exact.

_ZIPF_TOPK = 500


_ZIPF_SQL = f"""
    WITH tok AS (
      SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents WHERE length(trim(text)) > 0),
    freq AS (
      SELECT lang, w, CAST(count(*) AS BIGINT) AS n
      FROM tok GROUP BY 1, 2),
    ranked AS (
      SELECT lang, n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, w) AS r
      FROM freq),
    pts AS (
      SELECT lang,
             CAST(floor(ln(r) * 1000 + 0.5) AS BIGINT) AS x,
             CAST(floor(ln(n) * 1000 + 0.5) AS BIGINT) AS y
      FROM ranked WHERE r <= {_ZIPF_TOPK}),
    s AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS k,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM pts GROUP BY 1)
    SELECT lang, k,
           CAST(sx AS BIGINT) AS sx_milli, CAST(sy AS BIGINT) AS sy_milli,
           CAST(k * sxy - sx * sy AS DOUBLE)
             / CAST(k * sxx - sx * sx AS DOUBLE) AS zipf_slope
    FROM s
    """


@register("text_zipf_slope", oracle=_ZIPF_SQL, tags=("text", "north_star"))
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf slope per language over the top-{K} token ranks.

    Shapes: one hash(lang, token) aggregate (map-side combined — the
    big exchange, |vocab| sized), one per-lang top-K rank window over
    the vocab frame, then a 5-sum OLS aggregate per lang. The token
    explode never shuffles raw text — only (lang, token) pairs. At
    100 TB the vocab aggregate is the cost center and partial
    aggregation collapses it scan-side; K bounds everything after.
    Integer OLS: milli-quantized ln() per row (identical in both
    engines after quantization), bigint sums, one final division."""
    from etl_cnpjs_spark.functions.text import tokens

    d = (
        table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("lang", F.explode(tokens(F.col("text"))).alias("w"))
    )
    freq = d.groupBy("lang", "w").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wr = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("w"))
    ranked = freq.withColumn("r", F.row_number().over(wr)).filter(
        F.col("r") <= _ZIPF_TOPK
    )
    pts = ranked.select(
        "lang",
        F.floor(F.log(F.col("r").cast("double")) * 1000 + 0.5).cast("bigint").alias("x"),
        F.floor(F.log(F.col("n").cast("double")) * 1000 + 0.5).cast("bigint").alias("y"),
    )
    s = pts.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return s.select(
        "lang",
        "k",
        F.col("sx").cast("bigint").alias("sx_milli"),
        F.col("sy").cast("bigint").alias("sy_milli"),
        (
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        ).alias("zipf_slope"),
    )
