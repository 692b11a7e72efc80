"""Text-analysis plans (north_star): stats, token counting, quality
scoring, language ID, fingerprinting — over the `documents` table.

Everything is Catalyst higher-order expressions (functions/text.py) — the
100 TB posture for text: no Python UDFs, no vocabulary shuffle; every
metric computes inside the row in whole-stage codegen, so the stage is a
single scan with zero exchanges.

Each plan has an exact DuckDB oracle: the heuristics are deliberately
defined over engine-portable primitives (token membership counts, integer
ratios, md5) so the correctness gate can hash-match them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.functions.text import (
    char_count_no_ws,
    normalized_text,
    token_overlap_count,
    tokens,
)
from etl_cnpjs_spark.plans.registry import register

STOPWORDS = ["the", "a", "of", "and", "is", "to", "in"]

# marker vocabularies for the n-gram/stopword language heuristic
_LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "los", "las", "una", "es"],
    "fr": ["le", "la", "les", "des", "est"],
}
_CJK = "[一-鿿]"

_SQL_TOKS = r"string_split_regex(trim(text), '\s+')"


def _sql_hits(vocab: list[str]) -> str:
    lits = ",".join(f"'{w}'" for w in vocab)
    return f"len(list_filter({_SQL_TOKS}, t -> t IN ({lits})))"


@register(
    "text_stats",
    oracle=f"""
    SELECT doc_id,
           length(text)                                  AS n_chars_raw,
           length(regexp_replace(text, '\\s+', '', 'g')) AS n_chars,
           len({_SQL_TOKS})                              AS n_tokens,
           len(list_distinct({_SQL_TOKS}))               AS n_distinct_tokens,
           length(regexp_replace(text, '\\s+', '', 'g'))
             / len({_SQL_TOKS})                          AS avg_token_len
    FROM documents
    """,
    tags=("north_star", "text"),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document size/token statistics in one codegen stage."""
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_raw"),
        char_count_no_ws(F.col("text")).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (char_count_no_ws(F.col("text")) / F.size(toks)).alias("avg_token_len"),
    )


@register(
    "text_tokens",
    oracle=r"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\s+'))                    AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))  AS re_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT)                      AS bpe_est_tokens
    FROM documents
    """,
    tags=("north_star", "text"),
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, BPE-ish regex lexer
    (word-or-single-punct — a tokenizer-shaped superset of whitespace),
    and the chars/4 estimator used for quick budget accounting."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0)).alias(
            "re_tokens"
        ),
        F.ceil(F.length("text") / 4.0).alias("bpe_est_tokens"),
    )


@register(
    "text_quality",
    oracle=f"""
    SELECT doc_id,
           len({_SQL_TOKS}) AS n_tokens,
           {_sql_hits(STOPWORDS)} / len({_SQL_TOKS}) AS stopword_ratio,
           list_sum(list_transform({_SQL_TOKS}, t -> length(t)))
             / len({_SQL_TOKS})                      AS mean_token_len,
           len(list_distinct({_SQL_TOKS}))
             / len({_SQL_TOKS})                      AS distinct_ratio,
           CASE
             WHEN len({_SQL_TOKS}) >= 20
                  AND len(list_distinct({_SQL_TOKS})) / len({_SQL_TOKS}) >= 0.2
               THEN 'good'
             WHEN len({_SQL_TOKS}) >= 5 THEN 'fair'
             ELSE 'junk'
           END AS quality
    FROM documents
    """,
    tags=("north_star", "text"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length / stopword ratio / vocabulary
    diversity — the standard pretraining-corpus filters, as pure column
    math (compare: Gopher/C4-style rules)."""
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    mean_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)) / n
    quality = (
        F.when((n >= 20) & ((n_distinct / n) >= 0.2), "good")
        .when(n >= 5, "fair")
        .otherwise("junk")
    )
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        (token_overlap_count(toks, STOPWORDS) / n).alias("stopword_ratio"),
        mean_len.alias("mean_token_len"),
        (n_distinct / n).alias("distinct_ratio"),
        quality.alias("quality"),
    )


def _lang_sql() -> str:
    hits = {lang: _sql_hits(vocab) for lang, vocab in _LANG_MARKERS.items()}
    return f"""
    SELECT doc_id, lang AS labeled_lang,
           {hits["en"]} AS en_hits, {hits["de"]} AS de_hits,
           {hits["es"]} AS es_hits, {hits["fr"]} AS fr_hits,
           CASE
             WHEN regexp_matches(text, '{_CJK}') THEN 'zh'
             WHEN {hits["en"]} = 0 AND {hits["de"]} = 0
                  AND {hits["es"]} = 0 AND {hits["fr"]} = 0 THEN 'und'
             WHEN {hits["en"]} >= greatest({hits["de"]}, {hits["es"]}, {hits["fr"]}) THEN 'en'
             WHEN {hits["de"]} >= greatest({hits["es"]}, {hits["fr"]}) THEN 'de'
             WHEN {hits["es"]} >= {hits["fr"]} THEN 'es'
             ELSE 'fr'
           END AS predicted_lang
    FROM documents
    """


@register("text_lang_id", oracle=_lang_sql(), tags=("north_star", "text"))
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (CJK-script check + per-language stopword
    hit counts, fixed precedence on ties). Deterministic by construction —
    the oracle re-derives the identical decision procedure."""
    d = table(spark, sf_dir, "documents", parallel=True)
    toks = tokens(F.col("text"))
    hits = {lang: token_overlap_count(toks, vocab) for lang, vocab in _LANG_MARKERS.items()}
    predicted = (
        F.when(F.col("text").rlike(_CJK), "zh")
        .when(
            (hits["en"] == 0) & (hits["de"] == 0) & (hits["es"] == 0) & (hits["fr"] == 0), "und"
        )
        .when(hits["en"] >= F.greatest(hits["de"], hits["es"], hits["fr"]), "en")
        .when(hits["de"] >= F.greatest(hits["es"], hits["fr"]), "de")
        .when(hits["es"] >= hits["fr"], "es")
        .otherwise("fr")
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        hits["en"].alias("en_hits"),
        hits["de"].alias("de_hits"),
        hits["es"].alias("es_hits"),
        hits["fr"].alias("fr_hits"),
        predicted.alias("predicted_lang"),
    )


@register(
    "text_fingerprint",
    oracle=r"""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))      AS fp_content,
           md5(array_to_string(
                 list_sort(list_distinct(string_split_regex(trim(text), '\s+'))),
                 ' '))                                                  AS fp_bag,
           substr(md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), 1, 8)
                                                                        AS fp_short
    FROM documents
    """,
    tags=("north_star", "text", "dedup"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: md5 of whitespace-normalized content (exact
    dedup key robust to formatting) + md5 of the sorted token bag
    (order-insensitive near-exact key). md5 is engine-portable, so both
    fingerprints oracle-match bit-for-bit; grouping by fp_* is the
    shuffle-light exact-dedup path at scale (16-byte keys, not documents)."""
    d = table(spark, sf_dir, "documents")
    norm = normalized_text(F.col("text"))
    bag = F.array_join(F.array_sort(F.array_distinct(tokens(F.col("text")))), " ")
    return d.select(
        "doc_id",
        F.md5(norm).alias("fp_content"),
        F.md5(bag).alias("fp_bag"),
        F.substring(F.md5(norm), 1, 8).alias("fp_short"),
    )


_MIN_TOKENS = 10
_MIN_DISTINCT_RATIO = 0.15
_MIN_STOP_RATIO = 0.02


@register(
    "text_filter_pipeline",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, lang,
             len({_SQL_TOKS})                                  AS n_tokens,
             len(list_distinct({_SQL_TOKS}))
               / greatest(len({_SQL_TOKS}), 1)                 AS distinct_ratio,
             {_sql_hits(STOPWORDS)}
               / greatest(len({_SQL_TOKS}), 1)                 AS stop_ratio
      FROM documents)
    SELECT doc_id, lang, n_tokens,
           coalesce(array_to_string(list_sort(
             list_filter([
               CASE WHEN n_tokens < {_MIN_TOKENS} THEN 'too_short' END,
               CASE WHEN distinct_ratio < {_MIN_DISTINCT_RATIO} THEN 'repetitive' END,
               CASE WHEN stop_ratio < {_MIN_STOP_RATIO} THEN 'no_stopwords' END
             ], x -> x IS NOT NULL)), ','), '')               AS reject_reasons,
           (n_tokens >= {_MIN_TOKENS}
            AND distinct_ratio >= {_MIN_DISTINCT_RATIO}
            AND stop_ratio >= {_MIN_STOP_RATIO})               AS keep
    FROM q
    """,
    tags=("north_star", "text", "pipeline"),
)
def text_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus filter a cleaning pipeline actually ships (C4/Gopher
    style): compose the quality signals into a keep/drop decision WITH
    per-rule reject reasons — auditability is the point; a bare boolean
    can't tell you which rule is eating your corpus. Pure column math,
    one scan, no shuffle; downstream: `.filter("keep")` for the corpus,
    split + explode of reject_reasons + count for the rule report.
    reject_reasons is array_join'ed to a csv scalar at the output
    boundary (driver canonicalizer can't sort raw array columns)."""
    d = table(spark, sf_dir, "documents", parallel=True)
    toks = tokens(F.col("text"))
    n = F.size(toks)
    safe_n = F.greatest(n, F.lit(1))
    distinct_ratio = F.size(F.array_distinct(toks)) / safe_n
    stop_ratio = token_overlap_count(toks, STOPWORDS) / safe_n
    reasons = F.array_join(
        F.array_sort(
            F.filter(
                F.array(
                    F.when(n < _MIN_TOKENS, F.lit("too_short")),
                    F.when(distinct_ratio < _MIN_DISTINCT_RATIO, F.lit("repetitive")),
                    F.when(stop_ratio < _MIN_STOP_RATIO, F.lit("no_stopwords")),
                ),
                lambda x: x.isNotNull(),
            )
        ),
        ",",
    )
    return d.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        reasons.alias("reject_reasons"),
        (
            (n >= _MIN_TOKENS)
            & (distinct_ratio >= _MIN_DISTINCT_RATIO)
            & (stop_ratio >= _MIN_STOP_RATIO)
        ).alias("keep"),
    )


# --- text_lm_score ---------------------------------------------------------
#
# Bigram-LM fluency score — the perplexity-proxy member of the quality
# family (stats/quality/repetition gate on surface shape; this gates on
# SEQUENCE likelihood, the signal an actual LM-based quality filter uses).
# Everything stays in INTEGER arithmetic so the score is engine-portable
# and the oracle bit-exact: a float chain (log-probs summed in partition
# order) would drift between engines, so each conditional probability
# P(w_i | w_{i-1}) = c(bigram)/c(prev) is quantized to parts-per-1e9 with
# bigint floor-division, and the per-doc mean is again a bigint DIV — no
# double is ever produced on either side.

_SQL_LM_SCORE = rf"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(CASE WHEN len(toks) >= 2
                    THEN list_transform(generate_series(1, len(toks) - 1),
                                        i -> toks[i] || ' ' || toks[i + 1])
                    ELSE [] END) AS bigram
      FROM t),
    cb AS (SELECT bigram, count(*) AS cb FROM bg GROUP BY 1),
    cp AS (SELECT split_part(bigram, ' ', 1) AS prev, sum(cb) AS cp
           FROM cb GROUP BY 1),
    sc AS (SELECT doc_id, (cb.cb * 1000000000) // cp.cp AS q9
           FROM bg JOIN cb USING (bigram)
           JOIN cp ON split_part(bg.bigram, ' ', 1) = cp.prev)
    SELECT doc_id,
           CAST(count(*) AS BIGINT)            AS n_bigrams,
           CAST(sum(q9) // count(*) AS BIGINT) AS lm_q9
    FROM sc GROUP BY doc_id
"""


@register("text_lm_score", oracle=_SQL_LM_SCORE, tags=("north_star", "text", "lm"))
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-model fluency score: mean conditional bigram probability
    per document, in parts-per-1e9 (higher = the document's word
    transitions are typical of the corpus; boilerplate and shuffled-word
    spam score low). lm_q9 = mean_i floor(1e9·c(w_{i-1}w_i)/c(w_{i-1}·)),
    docs with ≥1 bigram.

    Scale shape: the bigram model is ONE groupBy over exploded bigrams
    (the training pass — at 100 TB it runs offline and persists); the
    context model derives from the BIGRAM model (sum of cb grouped by
    prefix — model-sized, never re-shuffles the postings); both join
    back by broadcast, so scoring is scan-side and the only corpus-grain
    exchange is the final doc_id aggregate. The broadcast presumes a
    BOUNDED model — the production form every LM quality filter uses
    (top-V vocabulary with backoff; KenLM-style pruning), which is why
    model size is independent of corpus size. Scoring against an
    UNPRUNED corpus-scale bigram table (~10^11 entries at 100 TB) would
    instead shuffle-join on bigram — swap the two broadcast() hints for
    a hash(bigram) repartition of the postings in that regime. Integer
    quantization (not log-prob doubles) keeps the whole pipeline
    oracle-checkable — same convention as graph_pagerank's 1e15
    contributions."""
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    # zip of two shifted slices, NOT transform(sequence, i ->
    # element_at(toks, i)): a toks reference inside the lambda
    # re-tokenizes the text per element (no CSE in lambda bodies —
    # functions/text.py::shingles docstring); measured 7.8× faster,
    # bit-identical
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    make = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bigrams = F.when(F.size(toks) >= 2, make).otherwise(
        F.array().cast("array<string>")
    )
    bg = d.select("doc_id", F.explode(bigrams).alias("bigram"))
    # the model frame has two consumers (context derivation + broadcast
    # scoring join); materialize it so the posting-grain groupBy runs
    # once (localCheckpoint per the repo's multi-consumer convention —
    # persist/staged parquet on a cluster)
    cb = (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cb"))
        .localCheckpoint()
    )
    cp = (
        cb.withColumn("prev", F.substring_index(F.col("bigram"), " ", 1))
        .groupBy("prev")
        .agg(F.sum("cb").alias("cp"))
    )
    scored = (
        bg.join(F.broadcast(cb), "bigram")
        .join(
            F.broadcast(cp),
            F.substring_index(F.col("bigram"), " ", 1) == F.col("prev"),
        )
        .select("doc_id", F.expr("cb * 1000000000L DIV cp").alias("q9"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.expr("sum(q9) DIV count(1)").cast("bigint").alias("lm_q9"),
    )


# --- text_sentiment --------------------------------------------------------

# Keyword polarity lexicon over this corpus's vocabulary (the synthetic
# docs talk about query execution; fast = praise, slow/dup = complaint).
# In production the lexicon is a curated dictionary (AFINN/VADER-style);
# the MECHANISM — lexicon hits as pure column math, no model runtime —
# is what the key demonstrates (PAPERS.md: Spark sentiment at scale).
_SENT_POS = ["fast"]
_SENT_NEG = ["slow", "dup"]


@register(
    "text_sentiment",
    oracle=rf"""
    WITH s AS (
      SELECT doc_id,
             CAST({_sql_hits(_SENT_POS)} AS BIGINT) AS pos_hits,
             CAST({_sql_hits(_SENT_NEG)} AS BIGINT) AS neg_hits
      FROM documents)
    SELECT doc_id, pos_hits, neg_hits,
           pos_hits - neg_hits AS polarity,
           CASE WHEN pos_hits > neg_hits THEN 'positive'
                WHEN neg_hits > pos_hits THEN 'negative'
                ELSE 'neutral' END AS label
    FROM s
    """,
    tags=("north_star", "text", "sentiment"),
)
def text_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon sentiment classification — the sentiment-style keyword
    classifier SURVEY §2.2 plans against the Spark-sentiment paper
    (PAPERS.md): positive/negative lexicon hit counts via a single
    array filter per row, integer polarity, CASE label. Pure codegen
    column math — no model, no UDF, no shuffle; the 100 TB form is
    identical (a bigger lexicon broadcasts as an array literal or a
    map_filter against a broadcast set)."""
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    pos = token_overlap_count(toks, _SENT_POS).cast("bigint")
    neg = token_overlap_count(toks, _SENT_NEG).cast("bigint")
    out = d.select(
        "doc_id",
        pos.alias("pos_hits"),
        neg.alias("neg_hits"),
        (pos - neg).alias("polarity"),
    )
    return out.select(
        "doc_id",
        "pos_hits",
        "neg_hits",
        "polarity",
        F.when(F.col("pos_hits") > F.col("neg_hits"), "positive")
        .when(F.col("neg_hits") > F.col("pos_hits"), "negative")
        .otherwise("neutral")
        .alias("label"),
    )


# --- text_quality_classifier -----------------------------------------------
#
# Model-based quality gate, the shape production corpus filters actually
# run (fastText/logreg over cheap features — cf. CCNet, Gopher): a LINEAR
# scorer whose weights are a broadcast model artifact, not code. Features
# and weights stay in BIGINT fixed-point (ratios pre-scaled to ppm via
# floor division) so the score — and therefore the decision boundary —
# is bit-identical across engines and oracle-checkable, unlike a float
# dot product whose summation order drifts.
_QC_WEIGHTS = {  # (feature -> integer weight); score unit: micro-points
    "n_tokens": 500,  # longer docs mildly favored
    "distinct_ppm": 3,  # vocabulary diversity (ppm of tokens)
    "stop_ppm": 2,  # stopword rate ~ natural prose (ppm)
    "meanlen_q3": -40,  # very long tokens ~ code/garbage (milli-chars)
}
_QC_BIAS = -1_500_000
_QC_KEEP = 1_000_000  # score >= keep -> 'keep'
_QC_REVIEW = 0  # keep > score >= review -> 'review', else 'drop'


@register(
    "text_quality_classifier",
    oracle=f"""
    WITH w(w_ntok, w_dist, w_stop, w_mlen) AS (
      VALUES ({_QC_WEIGHTS["n_tokens"]}, {_QC_WEIGHTS["distinct_ppm"]},
              {_QC_WEIGHTS["stop_ppm"]}, {_QC_WEIGHTS["meanlen_q3"]})
    ),
    f AS (
      SELECT doc_id,
             len({_SQL_TOKS}) AS n_tokens,
             (len(list_distinct({_SQL_TOKS})) * 1000000)
               // len({_SQL_TOKS}) AS distinct_ppm,
             ({_sql_hits(STOPWORDS)} * 1000000)
               // len({_SQL_TOKS}) AS stop_ppm,
             (CAST(list_sum(list_transform({_SQL_TOKS}, t -> length(t)))
                   AS BIGINT) * 1000)
               // len({_SQL_TOKS}) AS meanlen_q3
      FROM documents
    )
    SELECT doc_id, n_tokens, distinct_ppm, stop_ppm, meanlen_q3,
           CAST({_QC_BIAS} + w_ntok * n_tokens + w_dist * distinct_ppm
                + w_stop * stop_ppm + w_mlen * meanlen_q3 AS BIGINT)
             AS score_micro,
           CASE
             WHEN {_QC_BIAS} + w_ntok * n_tokens + w_dist * distinct_ppm
                  + w_stop * stop_ppm + w_mlen * meanlen_q3
                  >= {_QC_KEEP} THEN 'keep'
             WHEN {_QC_BIAS} + w_ntok * n_tokens + w_dist * distinct_ppm
                  + w_stop * stop_ppm + w_mlen * meanlen_q3
                  >= {_QC_REVIEW} THEN 'review'
             ELSE 'drop'
           END AS decision
    FROM f CROSS JOIN w
    """,
    tags=("north_star", "text", "classifier"),
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier over per-doc features with the weight
    vector as a BROADCAST 1-row model frame — the operational shape of a
    trained filter: retraining ships a new weights artifact, the plan
    doesn't change. Features are scan-side codegen (one pass, no
    exchange); the crossJoin(broadcast(weights)) is the scalar-
    subquery/model-broadcast shape used throughout the repo — at 100 TB
    the model rides the broadcast variable to every executor and scoring
    stays embarrassingly parallel, zero shuffles. Fixed-point bigint
    features × integer weights ⇒ the decision boundary is exact, so the
    full three-way decision column carries a hash-green oracle (a float
    scorer could flip 'review'/'drop' on summation order)."""
    w = F.broadcast(
        spark.createDataFrame(
            [
                (
                    _QC_WEIGHTS["n_tokens"],
                    _QC_WEIGHTS["distinct_ppm"],
                    _QC_WEIGHTS["stop_ppm"],
                    _QC_WEIGHTS["meanlen_q3"],
                )
            ],
            "w_ntok long, w_dist long, w_stop long, w_mlen long",
        )
    )
    d = table(spark, sf_dir, "documents", parallel=True)
    toks = tokens(F.col("text"))
    n = F.size(toks).cast("long")
    charsum = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    # true bigint floor division (DIV), NOT floor(a / b): long / long is
    # a DOUBLE divide in Spark and can land one ulp under an exact
    # integer quotient — the lm_score convention
    feats = d.select(
        "doc_id",
        n.alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("long") * 1_000_000).alias("__dn"),
        (token_overlap_count(toks, STOPWORDS).cast("long") * 1_000_000).alias("__sn"),
        (charsum * 1_000).alias("__cn"),
    ).select(
        "doc_id",
        "n_tokens",
        F.expr("__dn DIV n_tokens").alias("distinct_ppm"),
        F.expr("__sn DIV n_tokens").alias("stop_ppm"),
        F.expr("__cn DIV n_tokens").alias("meanlen_q3"),
    )
    score = (
        F.lit(_QC_BIAS)
        + F.col("w_ntok") * F.col("n_tokens")
        + F.col("w_dist") * F.col("distinct_ppm")
        + F.col("w_stop") * F.col("stop_ppm")
        + F.col("w_mlen") * F.col("meanlen_q3")
    ).cast("bigint")
    return (
        feats.crossJoin(w)
        .withColumn("score_micro", score)
        .select(
            "doc_id",
            "n_tokens",
            "distinct_ppm",
            "stop_ppm",
            "meanlen_q3",
            "score_micro",
            F.when(F.col("score_micro") >= _QC_KEEP, "keep")
            .when(F.col("score_micro") >= _QC_REVIEW, "review")
            .otherwise("drop")
            .alias("decision"),
        )
    )


# --- text_perplexity_bucket ------------------------------------------------
#
# Fluency-tiering capstone: lm_score's per-doc bigram likelihood, bucketed
# into FIXED fluency tiers, rolled up to a corpus mixture report — the
# "perplexity bucket" step of CCNet-style pipelines (head/middle/tail by
# LM perplexity), which decides how much of each tier enters training.
# Fixed thresholds (not quantiles) keep the tiering deterministic and the
# whole composite bigint-exact end to end.
_PPL_TIERS = [  # (upper bound on lm_q9 in parts-per-1e9, tier name)
    (50_000_000, "tail"),
    (200_000_000, "middle"),
    (500_000_000, "head"),
]
_PPL_TOP = "fluent"


def _ppl_case_sql(col: str) -> str:
    out = "CASE "
    for ub, name in _PPL_TIERS:
        out += f"WHEN {col} < {ub} THEN '{name}' "
    return out + f"ELSE '{_PPL_TOP}' END"


@register(
    "text_perplexity_bucket",
    oracle=f"""
    WITH lm AS ({_SQL_LM_SCORE})
    SELECT {_ppl_case_sql("lm_q9")} AS tier,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(lm_q9) // count(*) AS BIGINT) AS mean_lm_q9,
           CAST(sum(n_bigrams) AS BIGINT) AS total_bigrams
    FROM lm
    GROUP BY 1
    """,
    tags=("north_star", "text", "lm", "composite"),
)
def text_perplexity_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-tier mixture report: score every document with the
    corpus bigram model (text_lm_score), assign a fluency tier by fixed
    lm_q9 thresholds, aggregate docs/mean-score/bigram-mass per tier.
    Downstream, sample_weighted_mix consumes exactly this shape to
    up/down-sample tiers into a training mix.

    Scale shape: tier assignment is a zero-shuffle CASE over lm_score's
    output, and the rollup groups on a 4-value key — the final exchange
    moves ≤ 4 partial rows per task (map-side combine), so the composite
    adds NOTHING to lm_score's cost profile. Means are bigint DIV (the
    lm_score convention), so the oracle is hash-exact."""
    lm = text_lm_score(spark, sf_dir)
    tier = F.col("lm_q9")
    expr = None
    for ub, name in _PPL_TIERS:
        cond = tier < ub
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = expr.otherwise(_PPL_TOP)
    return (
        lm.select(expr.alias("tier"), "lm_q9", "n_bigrams")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr("sum(lm_q9) DIV count(1)").cast("bigint").alias("mean_lm_q9"),
            F.sum("n_bigrams").cast("bigint").alias("total_bigrams"),
        )
    )
