"""End-to-end corpus curation — the north-star composite pipeline.

The TPC-H trio (plans/tpch.py) is the composite workload for the
relational side; this is its twin for the training-data side: the full
curation funnel a 100 TB text pipeline ships, as ONE plan with ONE
oracle-checked summary:

    documents
      → quality filter        (C4/Gopher rules — text_filter_pipeline)
      → exact dedup           (md5 content fingerprint, keep smallest id)
      → near-dup removal      (3-gram Jaccard ≥ 0.8, keep-first greedy)
      → per-(lang, source) funnel report + surviving token counts

Near-dup drop rule (deterministic, single-pass): drop doc j when ANY
pair (i, j), i < j, exists whose i survived exact dedup — even if i was
itself near-dup-dropped. Stricter than sequential keep-first streaming
greedy (which only compares against the kept set) and cheaper: one
anti-join against the pair list, no iteration. The transitive-closure
form is `dedup_canonical`; all three are real pipeline choices, this is
the cheapest.

Funnel counts are nested subsets computed as per-doc flags then ONE
aggregation — at scale the report costs a single small shuffle on
(lang, source) after the pair join; the expensive stage (shingle posting
join) is shared machinery with the dedup family (memoized per session).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.functions.text import normalized_text, token_overlap_count, tokens
from etl_cnpjs_spark.plans.dedup import (
    _SQL_PAIRS,
    _SQL_SHINGLES,
    JACCARD_THRESHOLD,
    _doc_shingles,
    _exact_pairs,
)
from etl_cnpjs_spark.plans.registry import register
from etl_cnpjs_spark.plans.text import (
    _MIN_DISTINCT_RATIO,
    _MIN_STOP_RATIO,
    _MIN_TOKENS,
    _SQL_TOKS,
    STOPWORDS,
    _sql_hits,
)

_ORACLE = (
    _SQL_PAIRS
    + rf"""
  , q AS (
    SELECT doc_id, lang, source,
           len({_SQL_TOKS}) AS n_tokens,
           (len({_SQL_TOKS}) >= {_MIN_TOKENS}
            AND len(list_distinct({_SQL_TOKS}))
                  / greatest(len({_SQL_TOKS}), 1) >= {_MIN_DISTINCT_RATIO}
            AND {_sql_hits(STOPWORDS)}
                  / greatest(len({_SQL_TOKS}), 1) >= {_MIN_STOP_RATIO}) AS keep_q,
           md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
    FROM documents),
  ex AS (SELECT doc_id, (doc_id = min(doc_id) OVER (PARTITION BY fp)) AS is_exact
         FROM q WHERE keep_q),
  drops AS (SELECT DISTINCT p2.j AS doc_id
            FROM pairs p2 JOIN ex ON p2.i = ex.doc_id AND ex.is_exact),
  fin AS (
    SELECT q.lang, q.source, q.n_tokens, q.keep_q,
           COALESCE(ex.is_exact, FALSE) AS is_exact,
           (COALESCE(ex.is_exact, FALSE) AND drops.doc_id IS NULL) AS is_final
    FROM q LEFT JOIN ex ON q.doc_id = ex.doc_id
           LEFT JOIN drops ON q.doc_id = drops.doc_id)
  SELECT lang, source,
         COUNT(*) AS n_docs,
         CAST(sum(CASE WHEN keep_q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         CAST(sum(CASE WHEN is_exact THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
         CAST(sum(CASE WHEN is_final THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
         CAST(sum(CASE WHEN is_final THEN n_tokens ELSE 0 END) AS BIGINT)
           AS tokens_final
  FROM fin GROUP BY lang, source
"""
)


@register("corpus_curate", oracle=_ORACLE, tags=("north_star", "text", "dedup", "pipeline"))
def corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality filter → exact dedup → greedy near-dup drop → funnel
    report. See module docstring for stage semantics."""
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    safe_n = F.greatest(n, F.lit(1))
    keep_q = (
        (n >= _MIN_TOKENS)
        & (F.size(F.array_distinct(toks)) / safe_n >= _MIN_DISTINCT_RATIO)
        & (token_overlap_count(toks, STOPWORDS) / safe_n >= _MIN_STOP_RATIO)
    )
    # barrier: base feeds three join branches (itself, ex, drops-via-ex);
    # unmaterialized, Spark would re-scan + re-tokenize the corpus per
    # branch (same rationale as dedup.py::_doc_shingles)
    base = d.select(
        "doc_id",
        "lang",
        "source",
        n.alias("n_tokens"),
        keep_q.alias("keep_q"),
        F.md5(normalized_text(F.col("text"))).alias("fp"),
    ).localCheckpoint()

    # exact dedup among quality survivors: smallest doc_id per fingerprint
    ex = (
        base.filter("keep_q")
        .withColumn("is_exact", F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("fp")))
        .select("doc_id", "is_exact")
    )

    # greedy near-dup drop: j goes when its smaller partner i survived
    pairs = _exact_pairs(spark, sf_dir)
    drops = (
        pairs.join(ex.filter("is_exact").withColumnRenamed("doc_id", "i"), "i")
        .select(F.col("j").alias("doc_id"))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )

    fin = (
        base.join(ex, "doc_id", "left")
        .join(drops, "doc_id", "left")
        .select(
            "lang",
            "source",
            "n_tokens",
            "keep_q",
            F.coalesce("is_exact", F.lit(False)).alias("is_exact"),
            (F.coalesce("is_exact", F.lit(False)) & F.col("__dropped").isNull()).alias(
                "is_final"
            ),
        )
    )
    flag = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0))  # noqa: E731
    return fin.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        flag("keep_q").alias("n_quality"),
        flag("is_exact").alias("n_exact"),
        flag("is_final").alias("n_final"),
        F.sum(F.when(F.col("is_final"), F.col("n_tokens")).otherwise(0)).alias("tokens_final"),
    )


# --- corpus preparation kernels ---------------------------------------------

# PII patterns kept to the RE2 ∩ Java-regex common subset (no lookaround,
# no backrefs) so both engines compile them identically.
_PII_EMAIL = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+\d{1,2}-\d{3}-\d{4}"


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH a AS (
      SELECT doc_id,
             substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
               || '@example.com or +1-555-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
      FROM documents)
    SELECT doc_id,
           regexp_replace(
             regexp_replace(aug, '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_PHONE}', '<PHONE>', 'g')                       AS scrubbed,
           CAST(len(regexp_extract_all(aug, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(aug, '{_PII_PHONE}')) AS BIGINT) AS n_phones
    FROM a
    """,
    tags=("north_star", "text", "pii"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction kernel — the compliance pass every training corpus
    goes through before the tokenizer sees it. The synthetic corpus has
    no PII, so the plan plants deterministic emails/phones first (same
    build-then-process pattern as fn_url), then redacts with anchored
    regexes and reports per-doc redaction counts (the audit metric).
    All regexp work is JVM codegen; one scan, no shuffle."""
    d = table(spark, sf_dir, "documents")
    aug = F.concat(
        F.substring("text", 1, 40),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    a = d.select("doc_id", aug.alias("aug"))
    scrub = F.regexp_replace(
        F.regexp_replace(F.col("aug"), _PII_EMAIL, "<EMAIL>"),
        _PII_PHONE,
        "<PHONE>",
    )
    return a.select(
        "doc_id",
        scrub.alias("scrubbed"),
        F.size(F.regexp_extract_all("aug", F.lit(_PII_EMAIL), F.lit(0))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("aug", F.lit(_PII_PHONE), F.lit(0))).cast("long").alias("n_phones"),
    )


_CHUNK_W = 16  # tokens per chunk
_CHUNK_S = 12  # stride (4-token overlap)


@register(
    "doc_chunk",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    s AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
    c AS (SELECT doc_id, toks, n,
                 unnest(generate_series(1, n, {_CHUNK_S})) AS chunk_start
          FROM s)
    SELECT doc_id,
           CAST(chunk_start AS BIGINT) AS chunk_start,
           CAST(len(list_slice(toks, chunk_start,
                    least(chunk_start + {_CHUNK_W} - 1, n))) AS BIGINT) AS chunk_len,
           array_to_string(list_slice(toks, chunk_start,
                    least(chunk_start + {_CHUNK_W} - 1, n)), ' ') AS chunk_text
    FROM c
    """,
    tags=("north_star", "text", "chunk"),
)
def doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (window {W}, stride {S}) — how a
    corpus becomes training/RAG samples. sequence() generates the chunk
    starts per doc, explode fans them out, slice() cuts each window: all
    codegen array expressions, no UDF, no shuffle; output grain is
    (doc_id, chunk_start) so downstream joins stay key-addressable. At
    100 TB the fan-out factor is n_tokens/stride ≈ constant per doc, so
    the stage scales linearly with corpus size."""
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    s = d.select("doc_id", toks.alias("toks"), F.size(toks).alias("n")).filter("n > 0")
    c = s.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(1), F.col("n"), F.lit(_CHUNK_S))).alias("chunk_start"),
    )
    chunk = F.slice(F.col("toks"), F.col("chunk_start"), _CHUNK_W)
    return c.select(
        "doc_id",
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.size(chunk).cast("long").alias("chunk_len"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# --- mixture sampling ------------------------------------------------------

# Per-language keep rates for the target training mixture. Thresholds are
# exact integers on the same multiplicative-hash ring as sample_hash /
# sample_stratified (Knuth 2654435761 mod 2^32), so membership is a pure
# bigint comparison both engines compute identically.
_MIX_KNUTH = 2654435761
_MIX_MOD = 4294967296  # 2^32
_MIX_RATES = {"en": 1.0, "zh": 0.75, "de": 0.5, "fr": 0.5, "es": 0.25}
_MIX_THRESH = {k: int(v * _MIX_MOD) for k, v in _MIX_RATES.items()}

_MIX_CASE_SQL = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {t}" for k, t in _MIX_THRESH.items()
) + " ELSE 0 END"


@register(
    "sample_weighted_mix",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE (doc_id * {_MIX_KNUTH}) % {_MIX_MOD} < {_MIX_CASE_SQL}
    """,
    tags=("north_star", "sampling", "pipeline"),
)
def sample_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling: down/up-weight sources to a target
    training mix (here per-language rates: en 100%, zh 75%, de/fr 50%,
    es 25%) — the step that turns a curated pool into the corpus a run
    actually trains on. Membership is a hash of the stable key, NOT
    rand(): re-runs, backfills, and a resumed 100 TB job all select the
    same rows, and changing one rate re-decides only that stratum.
    Physically a scan-side filter — no shuffle, no state, prunes to the
    three needed columns.

    Key-domain caveat (same as extended.py::sample_hash): the Knuth
    multiplicative hash runs in BIGINT, so doc_id must stay < 2^63 /
    2654435761 ≈ 3.47e9 or the product overflows (errors under Spark
    ANSI and DuckDB alike). Fine for this corpus's dense ids; above
    ~2^31 keys switch the PRF to a portable 64-bit hash (e.g. the
    md5-half scheme operators/dedup.py uses for SimHash)."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", "source").filter(
        (F.col("doc_id") * _MIX_KNUTH) % _MIX_MOD < _mix_threshold_col()
    )


# --- sequence packing ------------------------------------------------------

_PACK_BUDGET = 512  # tokens per training sequence


@register(
    "doc_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens
      FROM documents
    ), o AS (
      SELECT doc_id, lang, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM t
    )
    SELECT lang, CAST(off // {_PACK_BUDGET} AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM o GROUP BY lang, seq_id
    """,
    tags=("north_star", "pipeline", "window"),
)
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, concat-then-chunk semantics: documents are
    concatenated per language in stable doc_id order and the token
    stream is cut into fixed 512-token training sequences; a doc
    belongs to the sequence its START offset falls in. That start
    offset is an exclusive running sum — one window, one shuffle on
    lang — and the report (docs and tokens per sequence) reuses the
    same partitioning for its groupBy, so the whole op is a single
    exchange. At 100 TB packing runs per (lang, shard) with exactly
    this plan per shard; the greedy stateful variant (reset the counter
    at each boundary) needs applyInPandasWithState and buys <2% fewer
    padding tokens at these doc lengths."""
    d = table(spark, sf_dir, "documents")
    return _pack_report(
        d.select("doc_id", "lang", F.size(tokens(F.col("text"))).alias("n_tokens"))
    )


# --- benchmark decontamination ---------------------------------------------

_BENCH_MOD = 13  # doc_id % 13 == 0 stands in for the benchmark/eval set


@register(
    "text_decontaminate",
    oracle=_SQL_SHINGLES
    + f"""
  , e AS (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE len(shingles) > 0),
  bench AS (SELECT doc_id AS bench_id, s FROM e WHERE doc_id % {_BENCH_MOD} = 0)
  SELECT e.doc_id,
         COUNT(DISTINCT bench.bench_id) AS n_bench_docs,
         COUNT(DISTINCT e.s)            AS n_shared_shingles
  FROM e JOIN bench ON e.s = bench.s
  WHERE e.doc_id % {_BENCH_MOD} <> 0
  GROUP BY e.doc_id
    """,
    tags=("north_star", "text", "dedup", "pipeline"),
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word 3-gram with the eval/benchmark set (stand-in: doc_id % 13 == 0)
    — the screen every serious pretraining pipeline runs so test sets
    don't leak into training data. The benchmark side is SMALL by
    construction (eval suites are thousands of docs, the corpus is
    billions), so its exploded n-gram set broadcasts and the corpus is
    screened scan-side with NO shuffle of corpus rows; only the matches
    (rare) reach the per-doc aggregate. Shares the memoized shingle
    frame with the dedup family — one tokenize+shingle pass per session
    feeds both screens."""
    probe, bench = _bench_ngram_frames(spark, sf_dir)
    return (
        probe.join(F.broadcast(bench), probe.s == bench.bs)
        .groupBy("doc_id")
        .agg(
            F.countDistinct("bench_id").alias("n_bench_docs"),
            F.countDistinct("s").alias("n_shared_shingles"),
        )
    )


# --- shared curation helpers ------------------------------------------------


def _mix_threshold_col():
    """Per-language keep-threshold column on the hash ring (shared by
    sample_weighted_mix and corpus_training_set so the two can never
    de-sync on rates)."""
    thresh = F.lit(0)
    for lang, t in _MIX_THRESH.items():
        thresh = F.when(F.col("lang") == lang, F.lit(t)).otherwise(thresh)
    return thresh


def _bench_ngram_frames(spark: SparkSession, sf_dir: str):
    """(probe, bench) exploded-shingle frames for decontamination:
    probe = non-benchmark postings, bench = benchmark postings renamed
    (bench_id, bs). One definition feeds text_decontaminate and
    corpus_training_set."""
    sh = _doc_shingles(spark, sf_dir)
    e = sh.select("doc_id", F.explode("sh").alias("s"))
    bench = e.filter(F.col("doc_id") % _BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), F.col("s").alias("bs")
    )
    probe = e.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return probe, bench


def _contaminated_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct non-benchmark doc_ids sharing ≥1 shingle with the
    benchmark set (the composite's drop list)."""
    probe, bench = _bench_ngram_frames(spark, sf_dir)
    return (
        probe.join(F.broadcast(bench), probe.s == bench.bs)
        .select("doc_id")
        .distinct()
    )


def _pack_report(docs: DataFrame) -> DataFrame:
    """Concat-then-chunk packing report over (doc_id, lang, n_tokens):
    exclusive running sum per language, sequence = offset div budget,
    grouped stats. Shared by doc_pack_sequences (whole corpus) and
    corpus_training_set (survivors)."""
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = docs.withColumn("off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return packed.groupBy(
        "lang", F.expr(f"off div {_PACK_BUDGET}").alias("seq_id")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# --- full training-set materialization -------------------------------------

_TRAIN_ORACLE = (
    _SQL_SHINGLES
    + rf"""
  , e AS (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE len(shingles) > 0),
  bench AS (SELECT doc_id AS bench_id, s FROM e WHERE doc_id % {_BENCH_MOD} = 0),
  contaminated AS (
    SELECT DISTINCT e.doc_id FROM e JOIN bench ON e.s = bench.s
    WHERE e.doc_id % {_BENCH_MOD} <> 0),
  q AS (
    SELECT doc_id, lang,
           len({_SQL_TOKS}) AS n_tokens,
           (len({_SQL_TOKS}) >= {_MIN_TOKENS}
            AND len(list_distinct({_SQL_TOKS}))
                  / greatest(len({_SQL_TOKS}), 1) >= {_MIN_DISTINCT_RATIO}
            AND {_sql_hits(STOPWORDS)}
                  / greatest(len({_SQL_TOKS}), 1) >= {_MIN_STOP_RATIO}) AS keep_q,
           md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
    FROM documents WHERE doc_id % {_BENCH_MOD} <> 0),
  ex AS (SELECT doc_id, lang, n_tokens,
                (doc_id = min(doc_id) OVER (PARTITION BY fp)) AS is_exact
         FROM q WHERE keep_q),
  surv AS (
    SELECT ex.doc_id, ex.lang, ex.n_tokens
    FROM ex LEFT JOIN contaminated c ON ex.doc_id = c.doc_id
    WHERE ex.is_exact AND c.doc_id IS NULL
      AND (ex.doc_id * {_MIX_KNUTH}) % {_MIX_MOD} < {_MIX_CASE_SQL}),
  packed AS (
    SELECT lang, n_tokens, doc_id,
           COALESCE(SUM(n_tokens) OVER (
             PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
    FROM surv)
  SELECT lang, CAST(off // {_PACK_BUDGET} AS BIGINT) AS seq_id,
         COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
         MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
  FROM packed GROUP BY lang, seq_id
"""
)


@register(
    "corpus_training_set",
    oracle=_TRAIN_ORACLE,
    tags=("north_star", "text", "dedup", "pipeline", "sampling"),
)
def corpus_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-set materialization as ONE oracle-checked
    plan: quality gates → exact dedup (canonical = smallest doc_id per
    fingerprint) → benchmark exclusion + n-gram decontamination →
    per-language mixture sampling → 512-token sequence packing. This is
    the composite a pretraining data job actually ships; every stage
    reuses the verified standalone operator's code — the contamination
    drop list, mixture threshold, and packing report are the SAME
    helper functions the standalone keys call
    (_contaminated_ids / _mix_threshold_col / _pack_report), so the
    composite cannot drift from what the driver verified.

    Distributed shape, end to end: one corpus scan builds the flag
    frame (doc_id, lang, n_tokens, keep_q, fp — ~50 bytes/doc; the
    TEXT never moves again after this scan). What shuffles is only
    that flag frame: once on fp for the canonical-min window, once on
    doc_id for the contamination anti-join (sort-merge — the drop list
    is corpus-bounded, so no broadcast assumption; AQE promotes it
    when it is small), once on lang for the packing window whose
    groupBy reuses the same partitioning. The benchmark n-gram set
    broadcasts inside _contaminated_ids, and the mixture filter is
    scan-side arithmetic — zero extra exchanges."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % _BENCH_MOD != 0)
    toks = tokens(F.col("text"))
    n = F.size(toks)
    safe_n = F.greatest(n, F.lit(1))
    keep_q = (
        (n >= _MIN_TOKENS)
        & (F.size(F.array_distinct(toks)) / safe_n >= _MIN_DISTINCT_RATIO)
        & (token_overlap_count(toks, STOPWORDS) / safe_n >= _MIN_STOP_RATIO)
    )
    base = d.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        keep_q.alias("keep_q"),
        F.md5(normalized_text(F.col("text"))).alias("fp"),
    )

    ex = (
        base.filter("keep_q")
        .withColumn(
            "is_exact",
            F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("fp")),
        )
        .filter("is_exact")
        .select("doc_id", "lang", "n_tokens")
    )

    surv = ex.join(
        _contaminated_ids(spark, sf_dir), "doc_id", "left_anti"
    ).filter((F.col("doc_id") * _MIX_KNUTH) % _MIX_MOD < _mix_threshold_col())

    return _pack_report(surv)


# --- recursive contamination closure ---------------------------------------

_CLOSURE_MAX_DEPTH = 4


@register(
    "sql_recursive_closure",
    oracle=_SQL_PAIRS
    + f"""
  , edges AS (SELECT i AS src, j AS dst FROM pairs
              UNION ALL SELECT j, i FROM pairs),
  seeds AS (SELECT DISTINCT src AS doc_id FROM edges WHERE src % {_BENCH_MOD} = 0)
  SELECT doc_id, CAST(MIN(depth) AS INT) AS depth FROM (
    WITH RECURSIVE closure(doc_id, depth) AS (
      SELECT doc_id, 0 FROM seeds
      UNION ALL
      SELECT e2.dst, c.depth + 1
      FROM closure c JOIN edges e2 ON e2.src = c.doc_id
      WHERE c.depth < {_CLOSURE_MAX_DEPTH}
    )
    SELECT * FROM closure
  ) GROUP BY doc_id
    """,
    tags=("sql", "recursive", "graph", "dedup"),
)
def sql_recursive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4 recursive CTEs): transitive contamination
    closure — a document that near-duplicates a near-duplicate of a
    benchmark doc is itself suspect, so the drop list is the
    REACHABLE SET over the near-dup graph, not one hop. Seeds are
    benchmark members that appear in any pair; edges are the symmetric
    jaccard-≥0.8 pairs; depth caps at 4 (near-dup clusters are
    shallow — SCALE.md's CC diameter note), and MIN(depth) per doc
    collapses the path multiplicity UNION ALL leaves behind. Both
    engines run the textually identical recursive query over the same
    edge list; each recursion level is one join of the frontier
    against the edge view — the same per-round cost envelope as the
    connected-components operator, declared instead of hand-rolled."""
    pairs = _exact_pairs(spark, sf_dir).select("i", "j")
    edges = pairs.unionByName(
        pairs.select(F.col("j").alias("i"), F.col("i").alias("j"))
    ).select(F.col("i").alias("src"), F.col("j").alias("dst"))
    edges.createOrReplaceTempView("__nd_edges")
    return spark.sql(
        f"""
        WITH seeds AS (
          SELECT DISTINCT src AS doc_id FROM __nd_edges
          WHERE src % {_BENCH_MOD} = 0
        )
        SELECT doc_id, CAST(MIN(depth) AS INT) AS depth FROM (
          WITH RECURSIVE closure(doc_id, depth) AS (
            SELECT doc_id, 0 FROM seeds
            UNION ALL
            SELECT e.dst, c.depth + 1
            FROM closure c JOIN __nd_edges e ON e.src = c.doc_id
            WHERE c.depth < {_CLOSURE_MAX_DEPTH}
          )
          SELECT * FROM closure
        ) GROUP BY doc_id
        """
    )


# --- corpus_dedup_sweep ------------------------------------------------------
#
# The dedup-family capstone (round-6 queue item landed in round 5): the
# whole dedup arsenal chained as ONE pipeline over the corpus —
#
#     documents
#       → exact dedup        (identical text, keep min doc_id)
#       → near-dup removal   (Jaccard ≥ 0.8 pairs → connected components,
#                             keep the component-min doc — dedup_canonical's
#                             transitive rule)
#       → containment prune  (drop a survivor whose shingles are ≥ 90%
#                             contained in ANOTHER stage-2 survivor —
#                             quotes/excerpts/doc-in-doc that Jaccard's
#                             size-ratio crushing structurally misses)
#       → per-source funnel report (one row per source, four nested counts)
#
# Stage composition is sound without iteration: a component's min doc_id
# is always an exact-dedup keeper (identical texts share shingle sets, so
# they are jaccard-1 neighbors — the component min IS its text-group min),
# and mutual ≥ 0.9 containment forces Jaccard ≥ 0.9·max/(min+0.1·max) >
# 0.8, so two stage-2 survivors can never contain each other — the
# containment drop is well-defined with no tie-break needed. The prune
# checks against STAGE-2 survivors (one anti-join, no iteration), the
# same single-pass discipline corpus_curate documents for its near-dup
# rule.

_SWEEP_CONTAIN = 0.9  # == plans.dedup.CONTAINMENT_THRESHOLD (asserted below)


def _sweep_oracle() -> str:
    from etl_cnpjs_spark.plans.dedup import _SQL_CLUSTER, CONTAINMENT_THRESHOLD

    assert _SWEEP_CONTAIN == CONTAINMENT_THRESHOLD
    ctes = _SQL_CLUSTER.replace(
        "SELECT d2.doc_id, coalesce(c.component, d2.doc_id) AS component\n"
        "  FROM documents d2 LEFT JOIN comp c ON d2.doc_id = c.a",
        "",
    ).rstrip().rstrip(",")
    return (
        ctes
        + f"""
  , tmin AS (SELECT text, min(doc_id) AS keeper FROM documents GROUP BY text),
  fl AS (
    SELECT d.doc_id, d.source,
           (d.doc_id = t.keeper)                          AS ex_keep,
           (coalesce(c.component, d.doc_id) = d.doc_id)   AS comp_keep
    FROM documents d
    JOIN tmin t ON d.text = t.text
    LEFT JOIN comp c ON d.doc_id = c.a),
  surv AS (SELECT doc_id FROM fl WHERE ex_keep AND comp_keep),
  cont AS (
    SELECT b2.src
    FROM (SELECT i AS src, j AS dst, inter FROM p
          UNION ALL SELECT j, i, inter FROM p) b2
    JOIN sz s1 ON b2.src = s1.doc_id
    JOIN surv su ON b2.src = su.doc_id
    JOIN surv sd ON b2.dst = sd.doc_id
    WHERE b2.inter / s1.n >= {CONTAINMENT_THRESHOLD}
    GROUP BY b2.src)
  SELECT f.source,
         COUNT(*) AS n_docs,
         COUNT(CASE WHEN f.ex_keep THEN 1 END) AS kept_exact,
         COUNT(CASE WHEN f.ex_keep AND f.comp_keep THEN 1 END) AS kept_near,
         COUNT(CASE WHEN f.ex_keep AND f.comp_keep AND ct.src IS NULL
               THEN 1 END) AS kept_final
  FROM fl f LEFT JOIN cont ct ON f.doc_id = ct.src
  GROUP BY f.source
"""
    )


@register(
    "corpus_dedup_sweep",
    oracle=_sweep_oracle(),
    tags=("north_star", "dedup", "pipeline", "capstone"),
)
def corpus_dedup_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact → transitive near-dup → containment, as one per-source
    funnel report: (source, n_docs, kept_exact, kept_near, kept_final).
    See the module-level stage notes above for why the chain composes
    without iteration.

    Scale story: every expensive frame is shared machinery — shingles
    and jaccard pairs are the session-memoized builds the whole dedup
    family reuses; connected components come from dedup_cluster's cached
    labels. The only new work is (a) the exact stage, a window-min over
    a 128-bit text hash (seeded xxhash64 pair — r14 widening, VERDICT
    r13 #3: a single 64-bit key hits P(collision)=1% near 6×10⁸ docs,
    inside the 100 TB posture, where a collision silently merges two
    DISTINCT documents; 16-byte keys still beat shuffling bodies), and
    (b) containment restricted to stage-2
    SURVIVORS — the posting self-join runs on the already-deduplicated
    corpus, which is exactly how a production sweep orders its passes
    (cheapest/highest-yield reductions first so later quadratic-ish
    stages see fewer rows). The report is one conditional-count
    aggregate on (source): a small final shuffle."""
    from pyspark.sql import Window as W

    from etl_cnpjs_spark.operators.dedup import containment_pairs
    from etl_cnpjs_spark.plans.dedup import (
        CONTAINMENT_THRESHOLD,
        _doc_shingles,
        dedup_cluster,
    )

    d = table(spark, sf_dir, "documents")
    labels = dedup_cluster(spark, sf_dir)  # (doc_id, component), memoized CC

    fl = (
        d.select(
            "doc_id",
            "source",
            F.xxhash64("text").alias("th1"),
            F.xxhash64(F.lit(1), "text").alias("th2"),
        )
        .withColumn("keeper", F.min("doc_id").over(W.partitionBy("th1", "th2")))
        .withColumn("ex_keep", F.col("doc_id") == F.col("keeper"))
        .join(labels, "doc_id")
        .withColumn("comp_keep", F.col("component") == F.col("doc_id"))
        .select("doc_id", "source", "ex_keep", "comp_keep")
        # consumed by TWO branches (survivor set for containment, report
        # join) — barrier it or the scan+hash-window+labels join runs
        # twice (the _doc_shingles discipline; frame is 4 narrow cols)
        .localCheckpoint()
    )
    surv = fl.filter(F.col("ex_keep") & F.col("comp_keep")).select("doc_id")
    sh_surv = _doc_shingles(spark, sf_dir).join(surv, "doc_id", "left_semi")
    dropped = (
        containment_pairs(sh_surv, "doc_id", "sh", CONTAINMENT_THRESHOLD)
        .select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("contained", F.lit(True))
    )
    rep = fl.join(dropped, "doc_id", "left")
    return rep.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("ex_keep"), 1)).alias("kept_exact"),
        F.count(F.when(F.col("ex_keep") & F.col("comp_keep"), 1)).alias("kept_near"),
        F.count(
            F.when(
                F.col("ex_keep") & F.col("comp_keep") & F.col("contained").isNull(), 1
            )
        ).alias("kept_final"),
    )


# --- sample_temperature_mix --------------------------------------------------

_TEMP_ALPHA_NOTE = 0.5  # α = 0.5 → rates ∝ sqrt (documentation constant)


def temperature_rate_table(counts):
    """(lang, nl) -> (lang, thresh): the alpha = 0.5 temperature keep
    thresholds, floor(sqrt(n_min / n_l) * 2^32) — THE one definition of
    the mixture formula (shared by sample_temperature_mix and
    corpus_build's mixture stage; the SQL twins mirror it). sqrt is
    IEEE-correctly-rounded, so both engines land on identical
    thresholds with no quantization. |langs|-row frame; the min rides a
    broadcast 1-row frame, never a driver scalar."""
    m = counts.agg(F.min("nl").alias("nmin"))
    return counts.crossJoin(F.broadcast(m)).select(
        "lang",
        F.floor(
            F.sqrt(F.col("nmin").cast("double") / F.col("nl").cast("double"))
            * F.lit(_MIX_MOD)
        )
        .cast("bigint")
        .alias("thresh"),
    )


@register(
    "sample_temperature_mix",
    oracle=f"""
    WITH n AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS nl
      FROM documents GROUP BY lang),
    m AS (SELECT MIN(nl) AS nmin FROM n),
    r AS (
      SELECT n.lang,
             CAST(floor(sqrt(CAST(m.nmin AS DOUBLE) / CAST(n.nl AS DOUBLE))
                        * {_MIX_MOD}) AS BIGINT) AS thresh
      FROM n, m)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN r ON d.lang = r.lang
    WHERE (d.doc_id * {_MIX_KNUTH}) % {_MIX_MOD} < r.thresh
    """,
    tags=("north_star", "sampling", "pipeline", "ml"),
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture sampling (α = 0.5): per-language keep
    rates DERIVED from corpus statistics so post-sample counts follow
    n_l^α — the standard multilingual rebalancing (upweight low-resource
    languages, flatten the head) — instead of sample_weighted_mix's
    hand-set rates. The smallest language keeps 100%
    (r_l = (n_min / n_l)^(1-α) = sqrt(n_min / n_l) at α = 0.5); every
    other rate follows from the data, so the mix self-adjusts as the
    corpus grows. Membership stays the deterministic Knuth-hash
    threshold (rerun/backfill-stable; same key-domain caveat as
    sample_weighted_mix).

    Float-portability: sqrt is IEEE-correctly-rounded (unlike log/exp —
    the libm sharp edge), and its argument is one exact-rounded division
    of exact bigint counts, so both engines land on the identical
    threshold with no quantization.

    Scale story: the rate table is |langs| rows computed by one
    map-side-combined count aggregate; it broadcast-joins onto the
    corpus scan, so the whole selection is scan-side — no shuffle of
    documents, no driver-side scalars (the min rides a 1-row frame)."""
    d = table(spark, sf_dir, "documents")
    n = d.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("nl"))
    r = temperature_rate_table(n)
    return (
        d.select("doc_id", "lang", "source")
        .join(F.broadcast(r), "lang")
        .filter((F.col("doc_id") * _MIX_KNUTH) % _MIX_MOD < F.col("thresh"))
        .select("doc_id", "lang", "source")
    )
