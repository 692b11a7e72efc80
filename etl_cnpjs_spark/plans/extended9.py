"""Round-6 session-2 batch 2: n-gram LM training counts, gzip CSV
scans, chi-square independence testing, graph assortativity, character
entropy, class-balanced sampling, and winsorized/trimmed robust means.

Reference trace: none of this surface exists in the reference
(ETLCNPJFinalEmpresaEstabelecimentos.py computes one join+filter
aggregate); these extend the text/scan/stats/graph/sample families
along the SURVEY.md §2.2b growth directions, each with a full DuckDB
oracle.

Determinism notes (registry rules + the libm discipline):
- every libm call (ln) is quantized INTO INTEGER units per row before
  any cross-row accumulation, so sums are bigint — order-insensitive;
- Pearson/assortativity arithmetic runs on bigint sums with a FIXED
  final double-op sequence (mul/sub/div/sqrt are IEEE-correctly
  rounded — identical in both engines with the same operand order);
- rates are ppm integers (// in DuckDB, DIV in Spark; window/scalar
  sums CAST to BIGINT first — DuckDB sum() yields HUGEINT whose //
  result would widen to DOUBLE);
- double means go through decimal(27,6) accumulation (module rule in
  plans/registry.py);
- sampling orders are md5-of-key strings (engine-identical), never
  random().
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.plans.registry import register

_DEC = "decimal(27,6)"

# --- text_lm_train ----------------------------------------------------------
#
# Bigram language-model training counts — the table text_lm_score
# SCORES against, now BUILT by the engine: corpus bigram counts,
# context totals, and integer-ppm conditional probabilities. This is
# the KenLM-ish count pass of an LLM-data pipeline (the model that
# powers perplexity filtering), kept at order 2 with a min-count
# floor so the output is the real head of the distribution.

_LM_MIN_COUNT = 3


_LM_SQL = f"""
    WITH d AS (
      SELECT string_split_regex(trim(text), '\\s+') AS t
      FROM documents WHERE length(trim(text)) > 0),
    bg AS (
      SELECT unnest(list_transform(
               generate_series(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM d WHERE len(t) >= 2),
    bc AS (
      SELECT bigram, CAST(count(*) AS BIGINT) AS n
      FROM bg GROUP BY 1 HAVING count(*) >= {_LM_MIN_COUNT}),
    sp AS (
      SELECT split_part(bigram, ' ', 1) AS w1,
             split_part(bigram, ' ', 2) AS w2, n
      FROM bc),
    cx AS (
      SELECT w1, CAST(sum(n) AS BIGINT) AS ctx_n FROM sp GROUP BY 1)
    SELECT sp.w1, sp.w2, sp.n, cx.ctx_n,
           CAST(sp.n * 1000000 // cx.ctx_n AS BIGINT) AS cond_ppm
    FROM sp JOIN cx ON sp.w1 = cx.w1
    """


@register("text_lm_train", oracle=_LM_SQL, tags=("text", "north_star", "lm"))
def text_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram count table with conditional probabilities (ppm).

    Bigrams come from zipping two shifted token-array slices (the
    shingles() discipline — no lambda-captured retokenization), kept
    NON-distinct so counts carry within-doc multiplicity. Shapes: one
    hash(bigram) aggregate (map-side combined — the big exchange),
    then a context rollup OVER THE COUNTED FRAME (vocab-sized, not
    corpus-sized) re-joined on w1. The min-count floor prunes the
    long tail before the context join, which is what keeps the
    shuffled frame small at 100 TB; the conditional probability is
    integer DIV — note ctx_n sums only SURVIVING bigrams, the same
    convention in both texts."""
    from etl_cnpjs_spark.functions.text import tokens

    d = (
        table(spark, sf_dir, "documents", parallel=True)
        .filter(F.length(F.trim("text")) > 0)
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
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .filter(F.col("n") >= _LM_MIN_COUNT)
    )
    sp = bc.select(
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("w2"),
        "n",
    )
    cx = sp.groupBy("w1").agg(F.sum("n").cast("bigint").alias("ctx_n"))
    return sp.join(cx, "w1").select(
        "w1", "w2", "n", "ctx_n",
        F.expr("n * 1000000 DIV ctx_n").cast("bigint").alias("cond_ppm"),
    )


# --- scan_csv_gzip ----------------------------------------------------------
#
# Compressed-CSV round trip — the scan family (csv/permissive/json/
# nested/orc/xml/text/binary/parquet) plus transparent gzip codec
# handling, which is how crawl drops actually arrive. gzip is NOT
# splittable: at scale the unit of parallelism is the FILE, so the
# posture is many medium .gz files, never one giant one (docstring
# contract; the test slice writes per-partition files).


_CSV_GZ_SQL = """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % 89 = 0
    """


@register("scan_csv_gzip", oracle=_CSV_GZ_SQL, tags=("scan", "sink"))
def scan_csv_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a keyed slice as gzip CSV, read it back under a declared
    schema. Doubles survive the text round trip via shortest
    round-trip repr on write + exact decimal→binary parse on read.

    Scale story: the writer emits one .gz per partition (splittable
    parallelism by file count); the reader schedules one task per
    file — the documented posture for non-splittable codecs. Schema
    declared on read: no inference pass over compressed bytes."""
    from pyspark.sql import types as T

    sl = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 89 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    out = os.path.join(tempfile.mkdtemp(prefix="scan_csv_gz_"), "slice.csv")
    sl.write.mode("overwrite").option("header", True).option(
        "compression", "gzip"
    ).csv(out)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    return spark.read.schema(schema).option("header", True).csv(out)


# --- events_chi2_independence ----------------------------------------------
#
# Chi-square test of independence over the event_type × cohort
# contingency table — the categorical counterpart of events_ks_test's
# continuous drift screen (is event mix independent of the assignment
# cohort?). Each cell contribution (o − e)²/e is computed from bigint
# inputs with an identical double-op sequence in both engines, then
# micro-quantized into an INTEGER per cell, so the cross-cell sum is
# bigint — order-insensitive.


_CHI2_SQL = """
    WITH b AS (
      SELECT event_type, user_id % 2 AS cohort FROM events),
    cell AS (
      SELECT event_type, cohort, CAST(count(*) AS BIGINT) AS o
      FROM b GROUP BY 1, 2),
    t AS (
      SELECT event_type, cohort, o,
             CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
             CAST(sum(o) OVER (PARTITION BY cohort) AS BIGINT)     AS ct,
             CAST(sum(o) OVER () AS BIGINT)                        AS n
      FROM cell),
    q AS (
      SELECT n,
             CAST(floor(
               (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                  / CAST(n AS DOUBLE))
               * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                  / CAST(n AS DOUBLE))
               / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT) AS contrib_micro,
             CAST((SELECT count(DISTINCT event_type) FROM cell) AS BIGINT) AS nr,
             CAST((SELECT count(DISTINCT cohort) FROM cell) AS BIGINT)     AS nc
      FROM t)
    SELECT CAST(max(n) AS BIGINT)                   AS n,
           (max(nr) - 1) * (max(nc) - 1)            AS dof,
           CAST(sum(contrib_micro) AS BIGINT)       AS chi2_micro,
           CAST(sum(contrib_micro) AS DOUBLE) / 1e6 AS chi2
    FROM q
    """


@register("events_chi2_independence", oracle=_CHI2_SQL, tags=("events", "stats", "dq"))
def events_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square statistic for event_type ⟂ cohort.

    Shapes: one tiny contingency aggregate (|types|·2 cells,
    map-side combined), window totals over the cell frame, one
    single-row reduce. All heavy lifting is the first aggregate —
    everything after is constant-sized, and the dof cardinalities
    (nr, nc) are countDistinct columns of that SAME final reduce —
    not eager driver-side .distinct().count() jobs, which would
    re-run the contingency aggregate (a full fact-table scan each)
    before the real job starts. At 100 TB: one exchange of
    per-task partial cells."""
    ev = table(spark, sf_dir, "events")
    cell = (
        ev.select("event_type", (F.col("user_id") % 2).alias("cohort"))
        .groupBy("event_type", "cohort")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    t = cell.select(
        "event_type",
        "cohort",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).cast("bigint").alias("rt"),
        F.sum("o").over(Window.partitionBy("cohort")).cast("bigint").alias("ct"),
        F.sum("o").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    e = F.col("rt").cast("double") * F.col("ct").cast("double") / F.col("n").cast(
        "double"
    )
    dev = F.col("o").cast("double") - e
    contrib = F.floor(dev * dev / e * 1000000 + 0.5).cast("bigint")
    q = t.select("event_type", "cohort", "n", contrib.alias("contrib_micro"))
    return q.agg(
        F.max("n").cast("bigint").alias("n"),
        ((F.countDistinct("event_type") - 1) * (F.countDistinct("cohort") - 1))
        .cast("bigint")
        .alias("dof"),
        F.sum("contrib_micro").cast("bigint").alias("chi2_micro"),
        (F.sum("contrib_micro").cast("double") / F.lit(1e6)).alias("chi2"),
    )


# --- graph_assortativity ----------------------------------------------------
#
# Degree assortativity of the near-dup graph: Pearson correlation of
# endpoint degrees over directed edges — one scalar that says whether
# high-degree template hubs attach to each other (assortative, CC
# blowup risk) or to leaves. The whole statistic reduces to six bigint
# sums over edges; the final Pearson arithmetic is a fixed sequence of
# correctly-rounded double ops (mul/sub/sqrt/div) — bit-exact without
# quantization.


def _assort_sql() -> str:
    from etl_cnpjs_spark.plans.dedup import _SQL_PAIRS

    return (
        _SQL_PAIRS
        + """
      , edges AS (SELECT i AS a, j AS b FROM pairs
                  UNION ALL SELECT j, i FROM pairs),
      deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS d
              FROM edges GROUP BY 1),
      ed AS (
        SELECT du.d AS dx, dv.d AS dy
        FROM edges e JOIN deg du ON e.a = du.node JOIN deg dv ON e.b = dv.node),
      s AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
               CAST(sum(dx * dy) AS BIGINT) AS sxy,
               CAST(sum(dx * dx) AS BIGINT) AS sxx,
               CAST(sum(dy * dy) AS BIGINT) AS syy
        FROM ed)
      SELECT m,
             CAST(m * sxy - sx * sy AS DOUBLE)
               / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(m * syy - sy * sy AS DOUBLE))) AS assortativity
      FROM s
    """
    )


@register("graph_assortativity", oracle=_assort_sql(), tags=("graph", "dedup"))
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity coefficient of the exact-Jaccard graph.

    Shapes: reuses the memoized pairs frame; degree table joins back
    onto edges twice (both joins broadcast — the degree frame is
    |nodes| and keyed), then ONE six-sum reduce. At corpus scale the
    only exchange is the degree aggregate; the edge re-join
    broadcasts. Symmetric edge list ⇒ sx = sy by construction — kept
    as separate sums so the formula is the textbook one."""
    from etl_cnpjs_spark.plans.dedup import _exact_pairs

    pairs = _exact_pairs(spark, sf_dir)
    edges = pairs.select(F.col("i").alias("a"), F.col("j").alias("b")).unionAll(
        pairs.select(F.col("j").alias("a"), F.col("i").alias("b"))
    )
    deg = edges.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    du = deg.select(F.col("node").alias("a"), F.col("d").alias("dx"))
    dv = deg.select(F.col("node").alias("b"), F.col("d").alias("dy"))
    ed = edges.join(F.broadcast(du), "a").join(F.broadcast(dv), "b")
    # Σd·d' reaches 2m·d_max² (worst case 2m³) — decimal(38,0)
    # accumulation keeps the sums exact on template-hub graphs where a
    # bigint would overflow past ~1.6M edges (DuckDB's SUM(BIGINT) is
    # HUGEINT-exact already; identical after the double cast).
    s = ed.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("dx").cast("bigint").alias("sx"),
        F.sum("dy").cast("bigint").alias("sy"),
        F.sum((F.col("dx") * F.col("dy")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("dx") * F.col("dx")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("dy") * F.col("dy")).cast("decimal(38,0)")).alias("syy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = F.sqrt((F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    deny = F.sqrt((F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return s.select("m", (num / (denx * deny)).alias("assortativity"))


# --- text_char_entropy ------------------------------------------------------
#
# Character-level Shannon entropy per document — the gibberish /
# encoding-garbage screen next to text_quality's ratio features (low
# entropy = repeated filler, high = random bytes; both are cut in
# curation). Per-character positions come from an explicit
# 1..length(text) sequence + substr in BOTH engines (never
# split-on-empty-regex, whose edge semantics differ); the p·ln p sum
# is micro-quantized per distinct character THEN bigint-summed.


_ENTROPY_SQL = """
    WITH d AS (
      SELECT doc_id, text FROM documents WHERE length(text) > 0),
    ch AS (
      SELECT doc_id, substr(text, CAST(i.g AS INT), 1) AS c
      FROM d, (SELECT unnest(generate_series(1, 4000)) AS g) i
      WHERE i.g <= length(text)),
    hist AS (
      SELECT doc_id, c, CAST(count(*) AS BIGINT) AS n
      FROM ch GROUP BY 1, 2),
    tot AS (
      SELECT doc_id, CAST(sum(n) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_distinct
      FROM hist GROUP BY 1),
    terms AS (
      SELECT h.doc_id, t.total, t.n_distinct,
             h.n * CAST(floor(ln(CAST(h.n AS DOUBLE) / CAST(t.total AS DOUBLE))
                              * 1000000 + 0.5) AS BIGINT) AS term_micro
      FROM hist h JOIN tot t ON h.doc_id = t.doc_id)
    SELECT doc_id, CAST(max(total) AS BIGINT) AS n_chars,
           CAST(max(n_distinct) AS BIGINT) AS n_distinct,
           CAST(-sum(term_micro) // max(total) AS BIGINT) AS entropy_micro_nats
    FROM terms GROUP BY doc_id
    """


@register("text_char_entropy", oracle=_ENTROPY_SQL, tags=("text", "north_star", "dq"))
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character entropy in micro-nats (integer).

    Determinism: ln(p) is floor-quantized to micro-units per DISTINCT
    character (a handful of libm calls per doc), multiplied by the
    bigint count, bigint-summed, and integer-divided by doc length —
    no cross-row float accumulation anywhere. Shapes: the char
    explode shuffles (doc_id, char) partial counts (map-side
    combined, alphabet-bounded per doc); everything after is
    histogram-sized. The 4000-cap on the position sequence mirrors
    the oracle's generate_series bound (documents.n_chars ≤ 800 in
    the testdata; a production corpus raises the constant or chunks)."""
    d = (
        table(spark, sf_dir, "documents", parallel=True)
        .filter(F.length("text") > 0)
        .select("doc_id", "text")
    )
    ch = d.select(
        "doc_id",
        F.expr(
            "explode(sequence(1, least(length(text), 4000)))"
        ).alias("g"),
        "text",
    ).select("doc_id", F.expr("substr(text, g, 1)").alias("c"))
    hist = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = hist.groupBy("doc_id").agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
    )
    terms = hist.join(tot, "doc_id").select(
        "doc_id",
        "total",
        "n_distinct",
        (
            F.col("n")
            * F.floor(
                F.log(F.col("n").cast("double") / F.col("total").cast("double"))
                * 1000000
                + 0.5
            ).cast("bigint")
        ).alias("term_micro"),
    )
    return terms.groupBy("doc_id").agg(
        F.max("total").cast("bigint").alias("n_chars"),
        F.max("n_distinct").cast("bigint").alias("n_distinct"),
        F.expr("-sum(term_micro) DIV max(total)").cast("bigint").alias(
            "entropy_micro_nats"
        ),
    )


# --- sample_balanced --------------------------------------------------------
#
# Class-balanced downsampling: cap every event_type at the minority
# class's count, selecting survivors by md5-of-key order — the
# classifier-training rebalance primitive (sample_stratified draws
# fixed fractions; this EQUALIZES). Deterministic: md5 order is
# engine-identical and independent of physical row order.


_BALANCED_SQL = """
    WITH k AS (
      SELECT CAST(min(cnt) AS BIGINT) AS kmin
      FROM (SELECT count(*) AS cnt FROM events GROUP BY event_type)),
    r AS (
      SELECT event_id, event_type, user_id,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
      FROM events)
    SELECT event_id, event_type, user_id
    FROM r, k WHERE r.rn <= k.kmin
    """


@register("sample_balanced", oracle=_BALANCED_SQL, tags=("sample", "north_star"))
def sample_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equalize class sizes at the minority count via hash-ordered
    row_number.

    Shapes: one count aggregate (broadcast as a 1-row scalar), one
    hash(event_type) window for the ranked cap. At 100 TB the window
    sort is the cost — the scale path replaces full ranking with a
    two-pass hash-threshold selection (rank only within the ≈k
    hash-smallest band; same survivors) exactly as sample_reservoir
    documents; kept as the ranked form here because k ≈ class size
    at test scale."""
    ev = table(spark, sf_dir, "events")
    kmin = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.min("cnt").cast("bigint").alias("kmin"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    r = ev.select("event_id", "event_type", "user_id").withColumn(
        "rn", F.row_number().over(w)
    )
    return (
        r.join(F.broadcast(kmin))
        .filter(F.col("rn") <= F.col("kmin"))
        .select("event_id", "event_type", "user_id")
    )


# --- agg_winsorized_mean ----------------------------------------------------
#
# Winsorized and trimmed means per event type — the robust location
# estimators that survive the heavy tails dq_outlier_iqr flags.
# Bounds are DISCRETE picked percentiles (engine-identical doubles);
# clamped/trimmed sums go through decimal(27,6) accumulation (the
# registry's order-insensitivity rule for double sums).


_WINSOR_SQL = f"""
    WITH q AS (
      SELECT event_type,
             quantile_disc(value, 0.05) AS p05,
             quantile_disc(value, 0.95) AS p95
      FROM events GROUP BY 1)
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           min(q.p05) AS p05,
           min(q.p95) AS p95,
           CAST(SUM(CAST(greatest(q.p05, least(q.p95, e.value)) AS {_DEC}))
                AS DOUBLE) / count(*) AS winsor_mean,
           CAST(SUM(CASE WHEN e.value >= q.p05 AND e.value <= q.p95
                         THEN CAST(e.value AS {_DEC}) ELSE CAST(0 AS {_DEC}) END)
                AS DOUBLE)
             / sum(CASE WHEN e.value >= q.p05 AND e.value <= q.p95
                        THEN 1 ELSE 0 END) AS trimmed_mean
    FROM events e JOIN q ON e.event_type = q.event_type
    GROUP BY 1
    """


@register("agg_winsorized_mean", oracle=_WINSOR_SQL, tags=("agg", "stats"))
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5–95% winsorized and trimmed means per event type.

    Shapes: per-type discrete percentiles (sort-agg), broadcast the
    tiny bound frame, one clamped aggregate over the re-scan — the
    dq_outlier_iqr two-pass pattern with a decimal-accumulated mean
    on top. Exactly two passes at any scale, second pass
    shuffle-free below the final per-type combine."""
    ev = table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY value)").alias("p05"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias("p95"),
    )
    j = ev.join(F.broadcast(q), "event_type")
    clamped = F.greatest(F.col("p05"), F.least(F.col("p95"), F.col("value")))
    inb = (F.col("value") >= F.col("p05")) & (F.col("value") <= F.col("p95"))
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("p05").alias("p05"),
        F.min("p95").alias("p95"),
        (F.sum(clamped.cast(_DEC)).cast("double") / F.count(F.lit(1))).alias(
            "winsor_mean"
        ),
        (
            F.sum(F.when(inb, F.col("value").cast(_DEC)).otherwise(F.lit(0).cast(_DEC)))
            .cast("double")
            / F.sum(F.when(inb, 1).otherwise(0))
        ).alias("trimmed_mean"),
    )


# --- agg_autocorr -----------------------------------------------------------
#
# Lag-1 autocorrelation of the hourly event-count series per event
# type — the "is this series bursty or memoryless" scalar that decides
# whether events_anomaly's i.i.d. z-scores are even valid, and the
# time-series counterpart of graph_assortativity's Pearson form: six
# bigint sums + one fixed double-op finish. Consecutive-hour pairs
# come from a self-join on h+1 (a lag() over existing rows would
# silently pair across gaps in sparse hours).


_AUTOCORR_SQL = """
    WITH b AS (
      SELECT event_type,
             epoch_us(ts) // 3600000000 AS h
      FROM events),
    c AS (
      SELECT event_type, h, CAST(count(*) AS BIGINT) AS n
      FROM b GROUP BY 1, 2),
    pr AS (
      SELECT a.event_type, a.n AS x, b.n AS y
      FROM c a JOIN c b ON a.event_type = b.event_type AND b.h = a.h + 1),
    s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pr GROUP BY 1)
    SELECT event_type, m,
           CAST(m * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(m * syy - sy * sy AS DOUBLE))) AS autocorr_lag1
    FROM s
    """


@register("agg_autocorr", oracle=_AUTOCORR_SQL, tags=("events", "stats", "timeseries"))
def agg_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Pearson autocorrelation of hourly counts per event type.

    Shapes: one hash(event_type, hour) count aggregate (map-side
    combined) collapses the scan to |types|·|hours| rows; the
    consecutive-pair self-join and six-sum reduce run on that tiny
    frame. Counts are exact bigints; the Pearson finish is the same
    fixed mul/sub/sqrt/div sequence both engines execute on identical
    operands (hour counts stay < 2^26 through sf100, so every product
    here fits int64 with 12 bits to spare — documented bound, with
    DECIMAL(38,0) the swap if a series ever 4000×'s that)."""
    ev = table(spark, sf_dir, "events")
    c = (
        ev.select("event_type", F.expr("unix_micros(ts) DIV 3600000000").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    a = c.select("event_type", F.col("h").alias("ha"), F.col("n").alias("x"))
    b = c.select("event_type", (F.col("h") - 1).alias("ha"), F.col("n").alias("y"))
    pr = a.join(b, ["event_type", "ha"])
    s = pr.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = F.sqrt(
        (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    deny = F.sqrt(
        (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return s.select("event_type", "m", (num / (denx * deny)).alias("autocorr_lag1"))


# --- text_hashing_tf --------------------------------------------------------
#
# Feature-hashed document vectors (HashingTF): token → md5-prefix hash
# → bucket 0..63, term counts per (doc, bucket) — the fixed-width
# vectorization that feeds linear quality classifiers without a vocab
# table (no global dictionary state, the whole point at corpus scale).
# Emitted exploded (doc_id, bucket, tf) — the driver boundary takes no
# top-level arrays; assembling the dense vector is one groupBy away.

_HTF_BUCKETS = 64


_HTF_SQL = f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents WHERE length(trim(text)) > 0),
    h AS (
      SELECT doc_id,
             ('0x' || substr(md5(w), 1, 8))::BIGINT % {_HTF_BUCKETS} AS bucket
      FROM tok)
    SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS tf
    FROM h GROUP BY 1, 2
    """


@register("text_hashing_tf", oracle=_HTF_SQL, tags=("text", "north_star", "ml"))
def text_hashing_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HashingTF: md5-prefix feature hashing into {B} buckets.

    The hash is the repo's portable scheme (md5 hex prefix → bigint —
    operators/dedup.py::_SIMHASH_EXPR discipline), so both engines
    bucket identically; Spark's murmur-based hash() would not
    cross-check. Shapes: explode → one hash(doc_id, bucket) aggregate
    with map-side combine; output is ≤ {B} rows per doc regardless of
    doc length. At 100 TB this is the classic one-exchange
    vectorization pass; no vocabulary build, no broadcast state."""
    from etl_cnpjs_spark.functions.text import tokens

    d = (
        table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("bigint")
        % _HTF_BUCKETS
    )
    return (
        d.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
