"""Round-6 session-3 batch 1: graph link-prediction/local-structure
(clustering coefficient, Adamic–Adar), interval coalescing
(gaps-and-islands), RFM segmentation, freshness DQ, and readability
scoring.

Reference trace: none of this surface exists in the reference
(ETLCNPJFinalEmpresaEstabelecimentos.py); these extend the
graph/events/dq/text families along SURVEY.md §2.2b, each with a full
DuckDB oracle.

Determinism notes (house rules, registry.py module docstring):
- everything integer where possible (counts, epoch seconds, ppm via
  bigint DIV);
- the one log-weighted score (Adamic–Adar) micro-quantizes ln() PER
  DISTINCT DEGREE before any summation — the exact discipline
  text_char_entropy proved green across engines (JVM Math.log ≡
  DuckDB ln at 1e-6 quantization on this box, NOTES.md);
- orderings are total (unique-key tiebreakers); top-k is
  TakeOrderedAndProject on the Spark side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.plans.registry import register

# --- graph_clustering_coeff -------------------------------------------------
#
# Local clustering coefficient on the near-dup doc graph (same edge
# list every graph_* key uses: exact-Jaccard pairs, plans/dedup.py):
# lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) for deg ≥ 2, in ppm. The
# "how clique-ish is this node's neighborhood" feature that separates
# template-burst duplicates (lcc → 1) from chain-shaped drift
# (lcc → 0) in a dedup review queue.


def _lcc_oracle() -> str:
    from etl_cnpjs_spark.plans.dedup import _SQL_PAIRS

    return (
        _SQL_PAIRS
        + """
      , tri AS (
        SELECT p1.i AS a, p1.j AS b, p2.j AS c
        FROM pairs p1 JOIN pairs p2 ON p1.j = p2.i
        JOIN pairs p3 ON p3.i = p1.i AND p3.j = p2.j),
      corner AS (
        SELECT a AS v FROM tri UNION ALL
        SELECT b FROM tri UNION ALL
        SELECT c FROM tri),
      tcnt AS (SELECT v, CAST(count(*) AS BIGINT) AS tri_cnt FROM corner GROUP BY 1),
      und AS (SELECT i AS v FROM pairs UNION ALL SELECT j FROM pairs),
      deg AS (SELECT v, CAST(count(*) AS BIGINT) AS degree FROM und GROUP BY 1)
      SELECT d.v AS node_id, d.degree,
             CAST(coalesce(t.tri_cnt, 0) AS BIGINT) AS tri_cnt,
             CAST(2 * coalesce(t.tri_cnt, 0) * 1000000
                  // (d.degree * (d.degree - 1)) AS BIGINT) AS lcc_ppm
      FROM deg d LEFT JOIN tcnt t ON d.v = t.v
      WHERE d.degree >= 2
    """
    )


@register("graph_clustering_coeff", oracle=_lcc_oracle(), tags=("graph", "dedup"))
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient (ppm, integer).

    Shapes: triangles enumerate ONCE in oriented a<b<c form (the
    Suri–Vassilvitskii discipline graph_triangle_count adjudicated at
    10×: two-path equi-join keyed on the midpoint + one semi-join on
    the closing edge), then each triangle credits its 3 corners via a
    3-way unionAll — no per-node neighborhood self-join (which would
    be Σ deg² per node instead of per graph). Degree is one unionAll +
    groupBy on the same edge frame. All-integer output."""
    from etl_cnpjs_spark.plans.dedup import _exact_pairs

    pairs = _exact_pairs(spark, sf_dir).select("i", "j")
    p1 = pairs.select(F.col("i").alias("a"), F.col("j").alias("b"))
    p2 = pairs.select(F.col("i").alias("b"), F.col("j").alias("c"))
    closing = pairs.select(F.col("i").alias("a"), F.col("j").alias("c"))
    tri = (
        p1.join(p2, "b")
        .join(closing, ["a", "c"], "semi")
        .select("a", "b", "c")
    )
    corner = (
        tri.select(F.col("a").alias("v"))
        .unionAll(tri.select(F.col("b").alias("v")))
        .unionAll(tri.select(F.col("c").alias("v")))
    )
    tcnt = corner.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("tri_cnt"))
    und = pairs.select(F.col("i").alias("v")).unionAll(
        pairs.select(F.col("j").alias("v"))
    )
    deg = und.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    out = (
        deg.filter(F.col("degree") >= 2)
        .join(tcnt, "v", "left")
        .select(
            F.col("v").alias("node_id"),
            "degree",
            F.coalesce(F.col("tri_cnt"), F.lit(0)).cast("bigint").alias("tri_cnt"),
        )
    )
    return out.select(
        "node_id",
        "degree",
        "tri_cnt",
        F.expr("2 * tri_cnt * 1000000 DIV (degree * (degree - 1))")
        .cast("bigint")
        .alias("lcc_ppm"),
    )


# --- graph_adamic_adar ------------------------------------------------------
#
# Adamic–Adar link prediction on the same graph: for non-adjacent
# (u < v), score = Σ_{x ∈ N(u)∩N(v)} 1/ln(deg(x)) — the
# frequency-damped refinement of graph_common_neighbors (a shared
# hub midpoint is weak evidence; a shared rare midpoint is strong).
# Midpoints on a 2-path always have deg ≥ 2, so ln(deg) > 0.

_AA_TOPK = 100


def _aa_oracle() -> str:
    from etl_cnpjs_spark.plans.dedup import _SQL_PAIRS

    return (
        _SQL_PAIRS
        + f"""
      , edges AS (SELECT i AS a, j AS b FROM pairs UNION ALL SELECT j, i FROM pairs),
      deg AS (SELECT a AS x, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1),
      w AS (SELECT x, CAST(floor(1000000 / ln(CAST(d AS DOUBLE)) + 0.5) AS BIGINT)
                 AS w_micro FROM deg WHERE d >= 2),
      two_path AS (
        SELECT e1.a AS u, e2.b AS v, CAST(sum(w.w_micro) AS BIGINT) AS aa_micro,
               CAST(count(*) AS BIGINT) AS common_cnt
        FROM edges e1 JOIN edges e2 ON e1.b = e2.a AND e1.a < e2.b
        JOIN w ON w.x = e1.b
        GROUP BY 1, 2),
      nonadj AS (
        SELECT t.u, t.v, t.aa_micro, t.common_cnt
        FROM two_path t LEFT JOIN pairs p ON t.u = p.i AND t.v = p.j
        WHERE p.i IS NULL)
      SELECT u, v, common_cnt, aa_micro FROM nonadj
      ORDER BY aa_micro DESC, u, v LIMIT {_AA_TOPK}
    """
    )


@register("graph_adamic_adar", oracle=_aa_oracle(), tags=("graph", "dedup", "ml"))
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar scores for the top-100 non-adjacent pairs (micro
    units, integer).

    Determinism: 1/ln(deg) is floor-quantized to micro PER DISTINCT
    MIDPOINT (one libm call per node — the text_char_entropy ln()
    discipline), then bigint-summed per pair; no cross-row float
    accumulation. Shapes: degree frame is node-count sized and
    broadcast onto the 2-path join (midpoint key, the triangle-join
    envelope); existing-edge removal is one left-anti; final top-k is
    TakeOrderedAndProject."""
    from etl_cnpjs_spark.plans.dedup import _exact_pairs

    pairs = _exact_pairs(spark, sf_dir).select("i", "j")
    fwd = pairs.select(F.col("i").alias("a"), F.col("j").alias("b"))
    rev = pairs.select(F.col("j").alias("a"), F.col("i").alias("b"))
    edges = fwd.unionAll(rev)
    deg = edges.groupBy(F.col("a").alias("x")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    w = deg.filter(F.col("d") >= 2).select(
        "x",
        F.floor(F.lit(1000000.0) / F.log(F.col("d").cast("double")) + 0.5)
        .cast("bigint")
        .alias("w_micro"),
    )
    e1 = edges.select(F.col("a").alias("u"), F.col("b").alias("x"))
    e2 = edges.select(F.col("a").alias("x"), F.col("b").alias("v"))
    two_path = (
        e1.join(e2, "x")
        .filter(F.col("u") < F.col("v"))
        .join(F.broadcast(w), "x")
        .groupBy("u", "v")
        .agg(
            F.sum("w_micro").cast("bigint").alias("aa_micro"),
            F.count(F.lit(1)).cast("bigint").alias("common_cnt"),
        )
    )
    nonadj = two_path.join(
        pairs,
        (two_path["u"] == pairs["i"]) & (two_path["v"] == pairs["j"]),
        "left_anti",
    )
    return nonadj.select("u", "v", "common_cnt", "aa_micro").orderBy(
        F.desc("aa_micro"), "u", "v"
    ).limit(_AA_TOPK)


# --- events_interval_merge --------------------------------------------------
#
# Gaps-and-islands interval coalescing: each event opens a
# [ts, ts+300 s) activity interval; per user, overlapping/touching
# intervals merge into maximal busy periods. THE classic sessionless
# "when was this entity active" rollup (uptime stitching, meeting
# overlap, GPU-busy spans) — distinct from events_sessionize (gap
# threshold between POINTS) in that it merges INTERVALS, the form that
# generalizes to duration-carrying input.

_IM_PAD_S = 300


_IM_SQL = f"""
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT) + {_IM_PAD_S} AS f, event_id
      FROM events),
    m AS (
      SELECT user_id, s, f, event_id,
             max(f) OVER (PARTITION BY user_id ORDER BY s, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_f
      FROM e),
    fl AS (
      SELECT user_id, s, f, event_id,
             CASE WHEN prev_max_f IS NULL OR s > prev_max_f THEN 1 ELSE 0 END
               AS new_island
      FROM m),
    isl AS (
      SELECT user_id, s, f,
             sum(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                                   ROWS UNBOUNDED PRECEDING) AS island
      FROM fl)
    SELECT user_id, CAST(island AS BIGINT) AS island,
           CAST(min(s) AS BIGINT) AS start_s,
           CAST(max(f) AS BIGINT) AS end_s,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(f) - min(s) AS BIGINT) AS span_s
    FROM isl GROUP BY 1, 2
    """


@register("events_interval_merge", oracle=_IM_SQL, tags=("events", "timeseries"))
def events_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping per-user activity intervals (epoch-second
    integers throughout).

    Shapes: ONE exchange on user_id serves both window passes (the
    running max(end) that detects island starts and the running sum
    that numbers them share partitioning AND ordering → a single sort,
    no second shuffle) plus the final (user, island) groupBy, which is
    a prefix of the same ordering. Island starts are well-defined
    under ts ties (tied rows see the same prev_max_f; the event_id
    tiebreaker makes the running sum total-ordered)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").cast("bigint").alias("s"),
        (F.unix_timestamp("ts").cast("bigint") + _IM_PAD_S).alias("f"),
        "event_id",
    )
    ws = W.partitionBy("user_id").orderBy("s", "event_id")
    m = ev.withColumn(
        "prev_max_f", F.max("f").over(ws.rowsBetween(W.unboundedPreceding, -1))
    )
    fl = m.withColumn(
        "new_island",
        F.when(
            F.col("prev_max_f").isNull() | (F.col("s") > F.col("prev_max_f")), 1
        ).otherwise(0),
    )
    isl = fl.withColumn(
        "island",
        F.sum("new_island").over(ws.rowsBetween(W.unboundedPreceding, 0)),
    )
    return isl.groupBy("user_id", F.col("island").cast("bigint").alias("island")).agg(
        F.min("s").cast("bigint").alias("start_s"),
        F.max("f").cast("bigint").alias("end_s"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max("f") - F.min("s")).cast("bigint").alias("span_s"),
    )


# --- events_rfm -------------------------------------------------------------
#
# RFM segmentation: per user, Recency (days since last event, vs the
# corpus max date), Frequency (event count), Monetary (Σ value in
# micro). Quintile scores via ntile(5) with user_id tiebreakers
# (ntile's SQL-standard fill — larger buckets first — is identical in
# Spark and DuckDB once the order is total), composed into the
# classic 3-digit segment code.


_RFM_SQL = """
    WITH mx AS (SELECT max(ts) AS mts FROM events),
    u AS (
      SELECT user_id,
             CAST(date_diff('day', max(e.ts), mx.mts) AS BIGINT) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
               AS monetary_micro
      FROM events e, mx GROUP BY user_id, mx.mts),
    q AS (
      SELECT user_id, recency_days, frequency, monetary_micro,
             CAST(ntile(5) OVER (ORDER BY recency_days ASC, user_id) AS BIGINT)
               AS r_q,
             CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS BIGINT)
               AS f_q,
             CAST(ntile(5) OVER (ORDER BY monetary_micro DESC, user_id) AS BIGINT)
               AS m_q
      FROM u)
    SELECT user_id, recency_days, frequency, monetary_micro, r_q, f_q, m_q,
           CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS rfm_code
    FROM q
    """


@register("events_rfm", oracle=_RFM_SQL, tags=("events", "ml"))
def events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation per user (all-integer: days, counts,
    micro-money, 1–5 scores).

    Shapes: one user-keyed aggregate (map-side combined; value goes
    through micro-integer accumulation so the Σ is order-insensitive),
    then three ntile windows over the user-grain frame — user-grain is
    the SMALL frame (|users| ≪ |events|), so the unpartitioned windows
    sort a dimension-sized input, not the fact table; at 1000-executor
    scale the same scores come from a 2-pass percentile cut if the
    user frame itself outgrows a sort, documented here as the scale
    escape hatch. Corpus max(ts) is a 1-row broadcast cross join."""
    ev = table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mts"))
    u = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id", "mts")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(F.floor(F.col("value") * 1000000 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("monetary_micro"),
        )
        .select(
            "user_id",
            F.datediff(F.to_date("mts"), F.to_date("last_ts"))
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            "monetary_micro",
        )
    )
    q = u.select(
        "*",
        F.ntile(5).over(W.orderBy(F.asc("recency_days"), F.asc("user_id")))
        .cast("bigint")
        .alias("r_q"),
        F.ntile(5).over(W.orderBy(F.desc("frequency"), F.asc("user_id")))
        .cast("bigint")
        .alias("f_q"),
        F.ntile(5).over(W.orderBy(F.desc("monetary_micro"), F.asc("user_id")))
        .cast("bigint")
        .alias("m_q"),
    )
    return q.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_micro",
        "r_q",
        "f_q",
        "m_q",
        (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"))
        .cast("bigint")
        .alias("rfm_code"),
    )


# --- dq_freshness -----------------------------------------------------------
#
# Per-partition staleness report: for each event_type, the newest
# event vs the corpus watermark, in seconds, plus a stale flag at 24 h
# — the "did source X stop delivering" check every scheduled pipeline
# fronts its SLAs with (complements dq_check's value rules and
# events_gap_detect's intra-series holes).

_FRESH_STALE_S = 86400


_FRESH_SQL = f"""
    WITH mx AS (SELECT max(ts) AS wm FROM events),
    p AS (
      SELECT event_type, max(ts) AS newest, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1)
    SELECT p.event_type, CAST(floor(epoch(p.newest)) AS BIGINT) AS newest_epoch_s,
           CAST(floor(epoch(mx.wm)) - floor(epoch(p.newest)) AS BIGINT) AS lag_s,
           CAST(CASE WHEN floor(epoch(mx.wm)) - floor(epoch(p.newest))
                          > {_FRESH_STALE_S}
                     THEN 1 ELSE 0 END AS BIGINT) AS is_stale,
           p.n_events
    FROM p, mx
    """


@register("dq_freshness", oracle=_FRESH_SQL, tags=("dq", "events"))
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness lag per event_type vs the corpus watermark (epoch
    seconds, integer).

    Shapes: one map-side-combined groupBy on event_type (cardinality ≈
    a handful) and a 1-row broadcast for the watermark; at 100 TB this
    reads the partition column's metadata path (max(ts) per partition
    prunes to footer stats under a ts-partitioned layout —
    sink_partitioned is the writer counterpart)."""
    ev = table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("wm"))
    p = ev.groupBy("event_type").agg(
        F.max("ts").alias("newest"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    out = p.crossJoin(F.broadcast(mx))
    lag = F.unix_timestamp("wm") - F.unix_timestamp("newest")
    return out.select(
        "event_type",
        F.unix_timestamp("newest").cast("bigint").alias("newest_epoch_s"),
        lag.cast("bigint").alias("lag_s"),
        F.when(lag > _FRESH_STALE_S, 1).otherwise(0).cast("bigint").alias(
            "is_stale"
        ),
        "n_events",
    )


# --- text_readability -------------------------------------------------------
#
# Surface readability features per document: sentence count (split on
# [.!?]+ runs), words/sentence, chars/word, long-word (≥7 chars)
# share, and a LIX-style difficulty score — the standard
# syllable-free readability family (LIX = words/sentences +
# 100·longwords/words), all in integer ppm so both engines agree
# bit-for-bit.


_READ_SQL = """
    WITH d AS (
      SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0),
    sent AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
                                  s -> length(trim(s)) > 0)) AS BIGINT)
               AS n_sentences
      FROM d),
    tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM d),
    wrd AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(length(w)) AS BIGINT) AS n_word_chars,
             CAST(sum(CASE WHEN length(w) >= 7 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_long
      FROM tok GROUP BY 1)
    SELECT w.doc_id, s.n_sentences, w.n_words, w.n_long,
           CAST(w.n_words * 1000000 // greatest(s.n_sentences, 1) AS BIGINT)
             AS words_per_sentence_ppm,
           CAST(w.n_word_chars * 1000000 // w.n_words AS BIGINT)
             AS chars_per_word_ppm,
           CAST(w.n_long * 1000000 // w.n_words AS BIGINT) AS long_word_ppm,
           CAST(w.n_words * 1000000 // greatest(s.n_sentences, 1)
                + w.n_long * 100000000 // w.n_words AS BIGINT) AS lix_ppm
    FROM wrd w JOIN sent s ON w.doc_id = s.doc_id
    """


@register("text_readability", oracle=_READ_SQL, tags=("text", "north_star"))
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIX-style readability features per document (integer ppm).

    Shapes: sentence counting is a per-row expression (no explode);
    the word rollup reuses the one (doc, token) explode+aggregate path
    every text_* feature shares, map-side combined on doc_id; the
    final join is doc-grain ⋈ doc-grain on the same key. Sentence
    split is [.!?]+ with empty-segment filtering, textually mirrored
    in both engines (never split-on-empty-regex)."""
    from etl_cnpjs_spark.functions.text import tokens

    d = table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    sent = d.select(
        "doc_id",
        F.expr(
            "size(filter(split(text, '[.!?]+'), s -> length(trim(s)) > 0))"
        )
        .cast("bigint")
        .alias("n_sentences"),
    )
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    wrd = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum(F.length("w")).cast("bigint").alias("n_word_chars"),
        F.sum(F.when(F.length("w") >= 7, 1).otherwise(0))
        .cast("bigint")
        .alias("n_long"),
    )
    out = wrd.join(sent, "doc_id")
    return out.select(
        "doc_id",
        "n_sentences",
        "n_words",
        "n_long",
        F.expr("n_words * 1000000 DIV greatest(n_sentences, 1)")
        .cast("bigint")
        .alias("words_per_sentence_ppm"),
        F.expr("n_word_chars * 1000000 DIV n_words")
        .cast("bigint")
        .alias("chars_per_word_ppm"),
        F.expr("n_long * 1000000 DIV n_words").cast("bigint").alias("long_word_ppm"),
        F.expr(
            "n_words * 1000000 DIV greatest(n_sentences, 1)"
            " + n_long * 100000000 DIV n_words"
        )
        .cast("bigint")
        .alias("lix_ppm"),
    )
