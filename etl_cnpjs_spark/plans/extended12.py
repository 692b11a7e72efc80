"""Round-6 session-4 batches: exact-substring span dedup (the Lee et
al. ExactSubstr form), ML feature engineering (leave-one-out target
encoding), and the experimentation kit's causal pair (difference-in-
differences, CUPED variance reduction).

Reference trace: none of this surface exists in the reference
(ETLCNPJFinalEmpresaEstabelecimentos.py); these extend the
text/agg/events families along SURVEY.md §2.2b, each with a full
DuckDB oracle.

Determinism notes (house rules, registry.py module docstring):
- everything integer where possible (token positions, cents, micro
  values, ppm via bigint DIV);
- any double arithmetic runs the SAME formula text over identical
  integer inputs on both engines and quantizes at the output boundary
  (the graph_assortativity "fixed Pearson finish" discipline);
- orderings are total (unique-key tiebreakers); no row-order reliance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.plans.registry import register

# --- text_exact_substr_spans -------------------------------------------------
#
# ExactSubstr deduplication (Lee et al., "Deduplicating Training Data
# Makes Language Models Better", 2022): find the maximal token spans of
# each document whose every k-gram occurs MORE THAN ONCE in the corpus
# (including intra-document repeats — the suffix-array criterion is
# global occurrence count > 1). The paper builds a suffix array; the
# distributed re-expression is positional k-gram postings + a
# gaps-and-islands merge, which computes the identical span set for
# runs of >= 2 overlapping duplicated k-grams:
#   a span [a, b+k-1] is emitted  <=>  gram positions a..b are all
#   duplicated and a-1, b+1 are not (or fall off the doc).
# Downstream, these spans are what a curation pipeline CUTS from the
# corpus (text_dup_span_frac reports the fraction; this key emits the
# actionable byte ranges).

_SUBSTR_K = 8  # tokens per gram; spans are >= _SUBSTR_K + 1 tokens

_SUBSTR_SQL = rf"""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    gp AS (
      SELECT doc_id, toks,
             unnest(generate_series(
               1, greatest(len(toks) - {_SUBSTR_K - 1}, 0))) AS pos
      FROM d
    ),
    g AS (
      SELECT doc_id, pos,
             array_to_string(toks[pos:pos + {_SUBSTR_K - 1}], ' ') AS gram
      FROM gp
    ),
    dup AS (
      SELECT doc_id, pos
      FROM (SELECT doc_id, pos,
                   count(*) OVER (PARTITION BY gram) AS c
            FROM g)
      WHERE c >= 2
    ),
    isl AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM dup
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT)                         AS start_tok,
           CAST(max(pos) + {_SUBSTR_K - 1} AS BIGINT)       AS end_tok,
           CAST(max(pos) - min(pos) + {_SUBSTR_K} AS BIGINT) AS n_tokens
    FROM isl
    GROUP BY doc_id, grp
    HAVING count(*) >= 2
"""


@register(
    "text_exact_substr_spans",
    oracle=_SUBSTR_SQL,
    tags=("text", "dedup", "north_star"),
)
def text_exact_substr_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated token spans per document (ExactSubstr dedup).

    Shapes, in order: (1) positional k-grams built by zipping k shifted
    slices — every `toks` reference sits OUTSIDE the lambda (sharp edge
    #10: no CSE inside higher-order lambdas), so tokenization runs a
    constant k+2 times per row, not once per element; (2) duplicated-
    gram detection is a count window over the gram key — ONE
    gram-keyed exchange, no groupBy+rejoin (the dedup_stopshingle
    discipline); (3) the islands merge is a doc-keyed window pair
    (row_number diff → groupBy), the interval-merge discipline on the
    SECOND exchange. Total: two exchanges, both on natural keys.

    Scale: postings are LINEAR in corpus tokens (~n_tokens rows of
    (gram, doc, pos)); there is no pair enumeration anywhere — this is
    the member of the dedup family that survives past where even
    banded pair generation gets expensive, which is exactly why the
    ExactSubstr form is used at the largest corpus scales. Skewed
    grams (boilerplate) cost only window-count time, not candidate
    pairs. At 100 TB the gram exchange is the cost; a df-cap is NOT
    applied because dropping hot grams would split true spans —
    instead hot grams stay cheap by never being joined, only counted.
    """
    k = _SUBSTR_K
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
    )
    # positional (NON-distinct) k-grams, slices+zip_with form
    ngrams = F.slice(
        F.col("toks"), 1, F.greatest(F.size("toks") - (k - 1), F.lit(0))
    )
    for i in range(1, k):
        part = F.slice(
            F.col("toks"),
            i + 1,
            F.greatest(F.size("toks") - (k - 1), F.lit(0)),
        )
        ngrams = F.zip_with(ngrams, part, lambda a, b: F.concat_ws(" ", a, b))
    g = (
        docs.filter(F.size("toks") >= k)
        .select("doc_id", F.posexplode(ngrams).alias("pos0", "gram"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    )
    dup = (
        g.withColumn("c", F.count(F.lit(1)).over(W.partitionBy("gram")))
        .filter(F.col("c") >= 2)
        .select("doc_id", "pos")
    )
    isl = dup.withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(W.partitionBy("doc_id").orderBy("pos")),
    )
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("bigint").alias("start_tok"),
            (F.max("pos") + (k - 1)).cast("bigint").alias("end_tok"),
            (F.max("pos") - F.min("pos") + k).cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).alias("_n"),
        )
        .filter(F.col("_n") >= 2)
        .select("doc_id", "start_tok", "end_tok", "n_tokens")
    )


# --- agg_target_encode -------------------------------------------------------
#
# Leave-one-out target encoding — the ML feature-engineering staple for
# high-cardinality categoricals: each row's encoding is the target mean
# of its category EXCLUDING the row itself, so the feature carries no
# leakage of its own label. Exact integer form: target in cents,
# encoding in micro-cents via bigint floor division.

_TENC_SQL = """
    WITH o AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    w AS (
      SELECT o_orderkey, o_orderpriority, cents,
             CAST(sum(cents) OVER (PARTITION BY o_orderpriority) AS BIGINT)
               AS s,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM o
    )
    SELECT o_orderkey, o_orderpriority,
           CAST((s - cents) * 1000000 // (n - 1) AS BIGINT)
             AS loo_mean_microcents
    FROM w
    WHERE n > 1
"""


@register("agg_target_encode", oracle=_TENC_SQL, tags=("agg", "ml"))
def agg_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of o_orderpriority against
    o_totalprice (cents), emitted per row in micro-cents.

    Shape: ONE category-keyed exchange serves both window aggregates
    (sum and count share the partition); the per-row arithmetic is
    scan-side codegen. No self-join, no second pass — the (sum − y) /
    (n − 1) identity is what makes LOO encoding a single-window
    operation instead of an n-fold recompute.

    Integer bound (documented, not latent): (s − cents) ≤ ~7.5e11 per
    category at sf0.1, ×1e6 = 7.5e17 < 2^63; holds through sf1. Past
    that, the sum accumulates in DECIMAL(38,0) (house pattern) and the
    multiplier drops to 1e3. DuckDB twin must CAST(sum(...) AS BIGINT)
    before `//` or HUGEINT widens the division to DOUBLE (sharp edge,
    NOTES.md round-6 session 2)."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("bigint")
        .alias("cents"),
    )
    w = W.partitionBy("o_orderpriority")
    return (
        o.withColumn("s", F.sum("cents").over(w))
        .withColumn("n", F.count(F.lit(1)).over(w))
        .filter(F.col("n") > 1)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.expr("CAST((s - cents) * 1000000 DIV (n - 1) AS BIGINT)").alias(
                "loo_mean_microcents"
            ),
        )
    )


# --- events_did --------------------------------------------------------------
#
# Difference-in-differences over the events stream: users hash-split
# into control (user_id % 2 = 0) / treatment (1), time split at the
# corpus midpoint timestamp; the DiD estimate is
#   (treat_post − treat_pre) − (ctrl_post − ctrl_pre)
# over floored micro-means. Completes the experimentation kit's causal
# face beside events_ab_lift / _ab_ttest / power / SRM / CUPED.

_DID_SQL = """
    WITH b AS (
      SELECT CAST((min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS BIGINT)
               AS mid_us
      FROM events
    ),
    e AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS variant,
             CASE WHEN epoch_us(ts) <= b.mid_us
                  THEN 0 ELSE 1 END AS post,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vmicro
      FROM events, b
    ),
    cell AS (
      SELECT variant, post,
             count(*) AS n,
             CAST(CAST(sum(vmicro) AS BIGINT) // count(*) AS BIGINT)
               AS mean_micro
      FROM e GROUP BY 1, 2
    ),
    piv AS (
      SELECT variant,
             CAST(sum(CASE WHEN post = 0 THEN n END) AS BIGINT)   AS n_pre,
             CAST(sum(CASE WHEN post = 1 THEN n END) AS BIGINT)   AS n_post,
             min(CASE WHEN post = 0 THEN mean_micro END)          AS mean_pre_micro,
             min(CASE WHEN post = 1 THEN mean_micro END)          AS mean_post_micro
      FROM cell GROUP BY 1
    )
    SELECT variant, n_pre, n_post, mean_pre_micro, mean_post_micro,
           CAST(mean_post_micro - mean_pre_micro AS BIGINT) AS delta_micro,
           CAST(sum(CASE WHEN variant = 1
                         THEN mean_post_micro - mean_pre_micro
                         ELSE -(mean_post_micro - mean_pre_micro) END)
                OVER () AS BIGINT) AS did_micro
    FROM piv
"""


@register("events_did", oracle=_DID_SQL, tags=("events", "ml", "stats"))
def events_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: per-variant pre/post floored
    micro-means and the DiD estimate (identical on both rows — the
    2-row frame IS the report).

    Shapes: the midpoint is a 1-row global aggregate broadcast onto the
    scan (the text_tfidf n_docs discipline — no driver collect); the
    cell aggregate is ONE map-side-combined groupBy over 4 cells; the
    pivot and DiD window run on 4→2 rows. Exactly one real exchange at
    any scale. Micro-means use bigint floor division — identical in
    both engines, no float means anywhere."""
    ev = table(spark, sf_dir, "events")
    us_spark = F.unix_micros("ts")  # exact-integer twin of epoch_us()
    b = ev.agg(
        F.min(us_spark).alias("mn"), F.max(us_spark).alias("mx")
    ).select(F.expr("CAST((mn + mx) DIV 2 AS BIGINT)").alias("mid_us"))
    e = ev.crossJoin(F.broadcast(b)).select(
        (F.col("user_id") % 2).cast("bigint").alias("variant"),
        F.when(us_spark <= F.col("mid_us"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("post"),
        F.floor(F.col("value") * 1000000 + 0.5).cast("bigint").alias("vmicro"),
    )
    cell = e.groupBy("variant", "post").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(sum(vmicro) DIV count(1) AS BIGINT)").alias("mean_micro"),
    )
    piv = cell.groupBy("variant").agg(
        F.sum(F.when(F.col("post") == 0, F.col("n")))
        .cast("bigint")
        .alias("n_pre"),
        F.sum(F.when(F.col("post") == 1, F.col("n")))
        .cast("bigint")
        .alias("n_post"),
        F.min(F.when(F.col("post") == 0, F.col("mean_micro"))).alias(
            "mean_pre_micro"
        ),
        F.min(F.when(F.col("post") == 1, F.col("mean_micro"))).alias(
            "mean_post_micro"
        ),
    )
    delta = F.col("mean_post_micro") - F.col("mean_pre_micro")
    return piv.select(
        "variant",
        "n_pre",
        "n_post",
        "mean_pre_micro",
        "mean_post_micro",
        delta.cast("bigint").alias("delta_micro"),
        F.sum(
            F.when(F.col("variant") == 1, delta).otherwise(-delta)
        )
        .over(W.partitionBy())
        .cast("bigint")
        .alias("did_micro"),
    )
