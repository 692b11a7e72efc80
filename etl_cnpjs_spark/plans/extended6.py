"""Round-5 session-5 surface growth: cohort/RFM/AB-test product
analytics, decay-weighted engagement, training-set negative sampling,
streaming top-k, and voice-activity segmentation.

Reference trace: the reference computes one join+filter aggregate
(ETLCNPJFinalEmpresaEstabelecimentos.py:191-234) and has none of this
surface; these extend the events/corpus/multimodal families along the
SURVEY.md §2.2b growth directions, each with a full DuckDB oracle.

Determinism: counts and ppm rates are bigint arithmetic (// in DuckDB,
DIV in Spark); money goes through DECIMAL accumulation; float values
are micro-quantized BEFORE any division; decay weights are exact
powers of two (double multiply by 2^-k is exponent arithmetic — no
rounding — and here even that is avoided: decay is integer division
by 2^k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.plans.registry import register

# --- events_cohort_matrix ---------------------------------------------------
#
# events_retention (extended3) reports fixed D1/D7 checkpoints; this is
# the full weekly cohort × age matrix a growth dashboard actually
# renders: cohort week (user's first active week) by week-age, active
# users and retention rate (ppm). Week index = epoch-days // 7 — a pure
# integer bucketing both engines compute identically.


@register(
    "events_cohort_matrix",
    oracle="""
    WITH weeks AS (
      SELECT DISTINCT user_id,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS week
      FROM events),
    cohort AS (
      SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY user_id),
    m AS (
      SELECT c.cohort_week, w.week - c.cohort_week AS week_age,
             COUNT(DISTINCT w.user_id) AS n_active
      FROM weeks w JOIN cohort c ON w.user_id = c.user_id
      GROUP BY 1, 2),
    sz AS (SELECT cohort_week, n_active AS cohort_size FROM m WHERE week_age = 0)
    SELECT CAST(m.cohort_week AS BIGINT)  AS cohort_week,
           CAST(m.week_age AS BIGINT)     AS week_age,
           CAST(m.n_active AS BIGINT)     AS n_active,
           CAST(s.cohort_size AS BIGINT)  AS cohort_size,
           m.n_active * 1000000 // s.cohort_size AS retention_ppm
    FROM m JOIN sz s ON m.cohort_week = s.cohort_week
    """,
    tags=("events", "retention", "analytics"),
)
def events_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix. Shapes: distinct (user, week)
    collapses the event volume first (the same reducer
    events_retention uses); the per-user cohort min is a window over
    user_id whose partitioning AQE chains off distinct's (no
    groupBy+self-join back, see the inline note); the matrix rollup
    then shuffles only (cohort_week, user) pairs; cohort_size is the age-0 cell
    read back via a max-when window over the tiny matrix itself — no
    join at all (the self-join form clones the whole upstream subtree;
    measured 6 exchanges vs 4, see the inline note).
    All-integer output: week indices, counts, bigint-DIV ppm."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    weeks = (
        ev.select(
            "user_id",
            F.expr("CAST(datediff(to_date(ts), DATE '1970-01-01') DIV 7 AS BIGINT)").alias(
                "week"
            ),
        )
        .distinct()
    )
    # cohort assignment as a per-user window min — no groupBy+self-join
    # (saves two exchanges; the window's user_id partitioning is the
    # sub-partitioning of distinct's (user_id, week), so AQE chains them)
    wk = weeks.withColumn(
        "cohort_week", F.min("week").over(W.partitionBy("user_id"))
    )
    m = wk.groupBy(
        "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_age")
    ).agg(F.countDistinct("user_id").alias("n_active"))
    # cohort_size = the age-0 cell, read back via a window over the tiny
    # matrix itself — NOT a self-join (Catalyst would clone the whole
    # scan→distinct→window subtree for the filtered branch; measured 6
    # exchanges that way vs 4 this way). Age 0 always exists: each
    # cohort's defining user is active in their own first week.
    return m.select(
        "cohort_week",
        "week_age",
        "n_active",
        F.max(F.when(F.col("week_age") == 0, F.col("n_active")))
        .over(W.partitionBy("cohort_week"))
        .alias("cohort_size"),
    ).withColumn("retention_ppm", F.expr("n_active * 1000000 DIV cohort_size"))


# --- agg_rfm ----------------------------------------------------------------
#
# RFM segmentation: recency / frequency / monetary quartile scores per
# customer, rolled up to segment counts. The quartile rank is ntile(4)
# over a TOTAL order (metric, custkey) so tied metrics score
# deterministically in both engines. Scale note: ntile over all
# customers is a single-partition sort of the ALREADY-AGGREGATED
# per-customer table (|customers| ≪ |orders|); past ~10⁸ customers the
# production swap is quartile BOUNDARIES from approx_percentile
# broadcast back as a range join — same scores, two scans, no global
# sort. The oracle-checked semantics are the ntile form.


@register(
    "agg_rfm",
    oracle="""
    WITH anchor AS (SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
    per AS (
      SELECT o_custkey,
             datediff('day', max(CAST(o_orderdate AS DATE)),
                      (SELECT maxd FROM anchor))               AS recency_days,
             COUNT(*)                                          AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(27,6)))          AS monetary_dec
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT o_custkey,
             CAST(ntile(4) OVER (ORDER BY recency_days ASC,  o_custkey) AS BIGINT) AS r_score,
             CAST(ntile(4) OVER (ORDER BY frequency   DESC, o_custkey) AS BIGINT) AS f_score,
             CAST(ntile(4) OVER (ORDER BY monetary_dec DESC, o_custkey) AS BIGINT) AS m_score,
             monetary_dec
      FROM per)
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT)                    AS n_customers,
           CAST(SUM(monetary_dec) AS DOUBLE)           AS segment_value
    FROM scored GROUP BY 1, 2, 3
    """,
    tags=("agg", "window", "analytics"),
)
def agg_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile segmentation over orders. The per-customer reduce
    (one shuffle on o_custkey) comes FIRST, so the three global ntile
    windows sort only customer-grain rows; the anchor date is a 1-row
    broadcast. Money stays DECIMAL through both aggregation levels and
    casts to double only at the output boundary."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    anchor = o.agg(F.max(F.to_date("o_orderdate")).alias("maxd"))
    per = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("lastd"),
            F.count("*").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(27,6)")).alias("monetary_dec"),
        )
        .join(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("maxd", "lastd").alias("recency_days"),
            "frequency",
            "monetary_dec",
        )
    )
    scored = per.select(
        "o_custkey",
        "monetary_dec",
        F.ntile(4)
        .over(W.orderBy(F.col("recency_days").asc(), F.col("o_custkey")))
        .cast("long")
        .alias("r_score"),
        F.ntile(4)
        .over(W.orderBy(F.col("frequency").desc(), F.col("o_custkey")))
        .cast("long")
        .alias("f_score"),
        F.ntile(4)
        .over(W.orderBy(F.col("monetary_dec").desc(), F.col("o_custkey")))
        .cast("long")
        .alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_customers"),
        F.sum("monetary_dec").cast("double").alias("segment_value"),
    )


# --- events_ab_lift ----------------------------------------------------------
#
# A/B conversion readout: deterministic 50/50 variant assignment by
# multiplicative user-id hash (the sample_hash family's Knuth constant
# — stable across runs and engines, no random()), user-grain conversion
# (any purchase), rates and cross-variant lift in bigint-DIV ppm.

_KNUTH = 2654435761
_MOD = 4294967296  # 2^32
_HALF = 2147483648  # 2^31


@register(
    "events_ab_lift",
    oracle=f"""
    WITH conv AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id),
    u AS (
      SELECT CASE WHEN (user_id * {_KNUTH}) % {_MOD} < {_HALF}
                  THEN 'A' ELSE 'B' END AS variant,
             converted
      FROM conv),
    v AS (
      SELECT variant,
             CAST(COUNT(*) AS BIGINT)       AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_converted,
             CAST(SUM(converted) * 1000000 // COUNT(*) AS BIGINT) AS cr_ppm
      FROM u GROUP BY variant)
    SELECT a.variant, a.n_users, a.n_converted, a.cr_ppm,
           CAST(CASE WHEN b.cr_ppm = 0 THEN NULL
                ELSE a.cr_ppm * 1000000 // b.cr_ppm END AS BIGINT)
             AS lift_vs_other_ppm
    FROM v a JOIN v b ON a.variant <> b.variant
    """,
    tags=("events", "analytics", "sample"),
)
def events_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant conversion + lift. Shapes: one shuffle to user grain
    (map-side partial max), variant derived from the key — no second
    shuffle for assignment; the 2-row variant table self-joins as a
    broadcast. All-integer rates; lift guards the zero-rate edge with
    NULL in both engines."""
    ev = table(spark, sf_dir, "events")
    conv = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        )
    )
    v = (
        conv.select(
            F.when((F.col("user_id") * _KNUTH) % _MOD < _HALF, "A")
            .otherwise("B")
            .alias("variant"),
            "converted",
        )
        .groupBy("variant")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("converted").alias("n_converted"),
            F.expr("sum(converted) * 1000000 DIV count(*)").alias("cr_ppm"),
        )
    )
    other = v.select(
        F.col("variant").alias("variant_b"), F.col("cr_ppm").alias("cr_ppm_b")
    )
    return (
        v.join(F.broadcast(other), F.col("variant") != F.col("variant_b"))
        .select(
            "variant",
            "n_users",
            "n_converted",
            "cr_ppm",
            F.when(F.col("cr_ppm_b") == 0, F.lit(None)).otherwise(
                F.expr("cr_ppm * 1000000 DIV cr_ppm_b")
            ).alias("lift_vs_other_ppm"),
        )
    )


# --- agg_decay_sum ------------------------------------------------------------
#
# Half-life-decayed engagement score — the recency weighting every
# recommendation/feature pipeline applies. Float-free: value is
# micro-quantized FIRST (floor(v·1e6 + 0.5), the registry.quantize
# idiom), then decayed by INTEGER division by 2^k (k = age in weeks,
# capped) — no pow/exp libm edge anywhere, sums are exact bigints, and
# the one double division (by 1e6) happens identically at the output
# boundary of both engines.


@register(
    "agg_decay_sum",
    oracle="""
    WITH anchor AS (SELECT max(CAST(ts AS DATE)) AS maxd FROM events),
    e AS (
      SELECT event_type,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS micro,
             LEAST(datediff('day', CAST(ts AS DATE),
                            (SELECT maxd FROM anchor)) // 7, 20) AS k
      FROM events WHERE value IS NOT NULL)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(micro // CAST(power(2, k) AS BIGINT)) AS BIGINT)
             AS decayed_micro,
           CAST(SUM(micro // CAST(power(2, k) AS BIGINT)) AS DOUBLE) / 1000000
             AS decay_score
    FROM e GROUP BY event_type
    """,
    tags=("agg", "events", "analytics"),
)
def agg_decay_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type half-life (7-day) decayed value sum. Scan-side
    expressions + one map-side-combinable groupBy — the cheapest
    aggregate class; the anchor date is a 1-row broadcast. 2^k for
    k ≤ 20 is exact in double and exact after the bigint cast, so the
    per-row decay is pure integer division."""
    ev = table(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.to_date("ts")).alias("maxd"))
    e = (
        ev.filter(F.col("value").isNotNull())
        .join(F.broadcast(anchor))
        .select(
            "event_type",
            F.expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)").alias("micro"),
            F.expr("LEAST(datediff(maxd, to_date(ts)) DIV 7, 20)").alias("k"),
        )
    )
    return (
        e.withColumn("dec1", F.expr("micro DIV CAST(pow(2, k) AS BIGINT)"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("dec1").alias("decayed_micro"),
            (F.sum("dec1").cast("double") / 1000000).alias("decay_score"),
        )
    )


# --- stream_topk --------------------------------------------------------------
#
# Streaming leaderboard: top-k users by lifetime purchase value — the
# complete-output-mode aggregation+sort+limit face Structured Streaming
# supports natively (unlike append mode, where sorting is illegal).
# Batch form here is the oracle contract; tests/test_streaming.py runs
# the IDENTICAL transform under readStream and pins equality.

_TOPK_USERS = 10


@register(
    "stream_topk",
    oracle=f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY SUM(CAST(value AS DECIMAL(27,6))) DESC, user_id
    LIMIT {_TOPK_USERS}
    """,
    tags=("streaming", "sort", "agg"),
)
def stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} users by decimal-exact total event value (ties broken by
    user_id — a total order, so the cut line is deterministic). Batch
    plan: partial-agg shuffle to user grain, then TakeOrderedAndProject
    (no global sort materialization). Streaming face: the same
    groupBy→orderBy→limit under complete output mode."""
    from etl_cnpjs_spark.streaming.windows import top_users_by_value

    return top_users_by_value(table(spark, sf_dir, "events"), _TOPK_USERS)


# --- sample_negative ----------------------------------------------------------
#
# Negative sampling for training pairs (retrieval / recommendation):
# positives = distinct (customer, part) interactions from their orders;
# per user, 3 deterministic pseudo-random candidate items from the
# multiplicative hash stream; candidates that collide with a positive
# are dropped by anti-join. Hash-derived (not random()) so the sample
# is reproducible across runs, engines, and retries — the property the
# sample_hash/sample_reservoir family establishes.

_NEG_K = 3
_NEG_STEP = 40503  # odd 16-bit mix constant, coprime with 2^32


@register(
    "sample_negative",
    oracle=f"""
    WITH pos AS (
      SELECT DISTINCT o.o_custkey AS user_id, l.l_partkey AS item
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    users AS (SELECT DISTINCT user_id FROM pos),
    np AS (SELECT COUNT(*) AS n_items FROM part),
    cand AS (
      SELECT u.user_id,
             CAST(j.j AS BIGINT) AS neg_rank,
             CAST((u.user_id * {_KNUTH} + (j.j + 1) * {_NEG_STEP})
                  % (SELECT n_items FROM np) AS BIGINT) AS item
      FROM users u CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) j)
    SELECT c.user_id, c.neg_rank, c.item AS neg_partkey
    FROM cand c
    WHERE NOT EXISTS (SELECT 1 FROM pos p
                      WHERE p.user_id = c.user_id AND p.item = c.item)
    """,
    tags=("sample", "ml", "corpus"),
)
def sample_negative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user deterministic negative samples. Shapes: the positives
    distinct is the one real shuffle (user, item); candidates explode
    3× the USER list (already user-grain, tiny); the anti-join hits the
    positives on the same (user, item) keys. The item-count modulus is
    a 1-row broadcast scalar, so the candidate formula adapts to any
    SF without a hardcoded catalog size. Part keys are 0-based
    contiguous (0..n-1) in this dataset, so hash % n is a valid key."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    pos = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item"))
        .distinct()
    )
    users = pos.select("user_id").distinct()
    n_items = p.agg(F.count("*").alias("n_items"))
    cand = (
        users.join(F.broadcast(n_items))
        .select(
            "user_id",
            F.explode(F.array(*[F.lit(j) for j in range(_NEG_K)])).alias("j"),
            "n_items",
        )
        .select(
            "user_id",
            F.col("j").cast("long").alias("neg_rank"),
            ((F.col("user_id") * _KNUTH + (F.col("j") + 1) * _NEG_STEP) % F.col("n_items"))
            .cast("long")
            .alias("item"),
        )
    )
    return cand.join(pos, ["user_id", "item"], "left_anti").select(
        "user_id", "neg_rank", F.col("item").alias("neg_partkey")
    )


# --- mm_audio_vad -------------------------------------------------------------
#
# Voice-activity detection over DECODED PCM: the gated sawtooth
# (operators/multimodal.py::synth_wav_gated — alternating 400-sample
# voice/silence blocks) is synthesized, parsed BACK from container
# bytes, framed (80 samples), energy-gated, and run-length segmented —
# the real curation step that routes only voiced spans to downstream
# transcription. The oracle re-derives frame/segment counts in closed
# form from the gating arithmetic (block = 5 exact frames), so the
# compare proves encode → byte-walk → PCM decode → frame → segment end
# to end. Verified against the numpy path for the full edge grid in
# tests (partial tails, sub-block docs).


@register(
    "mm_audio_vad",
    oracle="""
    WITH p AS (SELECT doc_id, n_chars * 10 AS n FROM documents WHERE n_chars > 0),
    d AS (SELECT doc_id, n // 80 AS frames FROM p),
    b AS (SELECT doc_id, frames, frames // 5 AS nb, frames % 5 AS r FROM d)
    SELECT doc_id,
           CAST(frames AS BIGINT) AS n_frames,
           CAST(5 * ((nb + 1) // 2)
                + CASE WHEN nb % 2 = 0 THEN r ELSE 0 END AS BIGINT) AS n_active,
           CAST((nb + 1) // 2
                + CASE WHEN r > 0 AND nb % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
             AS n_segments,
           CAST(CASE WHEN nb >= 1 THEN 5 ELSE r END AS BIGINT) AS longest_seg
    FROM b
    """,
    tags=("north_star", "multimodal", "udf"),
)
def mm_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-energy VAD segmentation over decoded WAV bytes. Scale
    shape: scan-side mapInPandas, zero shuffle; bytes are born and die
    inside the task, only the 5-integer segment summary crosses out —
    the SCALE.md multimodal rule."""
    from etl_cnpjs_spark.operators.multimodal import vad_segments_map_in_pandas

    d = (
        table(spark, sf_dir, "documents", parallel=True)
        .select("doc_id", (F.col("n_chars") * 10).alias("n_samples"))
        .filter(F.col("n_samples") > 0)
    )
    return vad_segments_map_in_pandas(d)
