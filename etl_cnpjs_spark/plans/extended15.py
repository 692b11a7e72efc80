"""Round-8 capstone: the full end-to-end training-corpus build.

`corpus_build` chains the round-7 capstones the way a production run
orders them — ONE registered key, one DuckDB oracle, a per-language
stage report:

    documents (non-empty)
      -> train/eval split          (Knuth-hash 10% eval — the
                                    corpus_decontaminate split, a pure
                                    function of doc_id: no split table)
      -> decontaminate TRAIN       (drop train docs with an
                                    exact-Jaccard >= 0.8 near-dup in
                                    EVAL — the direction that poisons
                                    benchmark numbers; the report twin
                                    corpus_decontaminate flags the eval
                                    side instead)
      -> near-dup dedup + CC       (pairs restricted to surviving train
                                    docs, connected components, keep the
                                    component-min doc — dedup_cluster's
                                    rule on the induced subgraph; the
                                    3-stage ExactSubstr/LSH/SemDeDup
                                    story stays corpus_dedup_funnel's)
      -> temperature mixture       (alpha = 0.5 rates derived from the
                                    SURVIVORS' per-language counts —
                                    sample_temperature_mix re-rooted on
                                    the deduped corpus, so the mix
                                    self-adjusts to what dedup removed)
      -> greedy sharded packing    (doc_pack_greedy_sharded's bounded
                                    (lang, shard) fold; the report needs
                                    only per-shard bin counts, so the
                                    offset stitch drops out of the plan)
      -> per-language report       (lang, n_train, n_leaked,
                                    n_dedup_kept, n_sampled, n_seqs,
                                    packed_tokens)

Stage-ordering rationale: decontamination runs BEFORE dedup because a
train doc that duplicates an eval doc must not survive even as its
component's min id; the mixture runs on DEDUPED counts because rates
derived pre-dedup would re-skew toward languages whose volume was
duplication; packing runs last on exactly the docs a trainer would see.

Determinism: the split and mixture memberships are Knuth-hash
thresholds (pure functions of doc_id; sqrt is IEEE-correctly-rounded so
the derived rate thresholds are engine-identical), pair membership is
exact integer Jaccard, CC keep is component-min, packing is the
sharded greedy recurrence — every stage is replayed verbatim by the
oracle, so the hash check covers the whole chain.

Hash domain (r8 ADVICE): both keys compute the split hash via
registry.knuth32 / knuth32_sql — the split-multiply form that is exact
int64 over the FULL doc_id domain (the naive `doc_id * 2654435761`
overflows past ~3.47e9 keys, INSIDE the 100 TB ~1e10-doc design
point). Identical values to the naive form on the shipped fixtures;
the oracles mirror the same arithmetic textually so the hash check
covers the widened form itself.

Reference trace: none — the reference
(ETLCNPJFinalEmpresaEstabelecimentos.py) has no corpus surface; this is
the r7-verdict queue's "one composite worth adding" (item 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.plans.registry import register

# --- corpus_build ------------------------------------------------------------


def _build_oracle() -> str:
    from etl_cnpjs_spark.plans.dedup import _SQL_PAIRS
    from etl_cnpjs_spark.plans.extended import _KEEP
    from etl_cnpjs_spark.plans.extended14 import (
        GREEDY_PACK_BUDGET,
        GREEDY_SHARD_WIDTH,
    )
    from etl_cnpjs_spark.plans.registry import MOD32 as _MIX_MOD
    from etl_cnpjs_spark.plans.registry import knuth32_sql

    return (
        "WITH RECURSIVE "
        + _SQL_PAIRS.strip().removeprefix("WITH")
        + rf"""
  , dd AS (
      SELECT doc_id, lang,
             len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             ({knuth32_sql('doc_id')} < {_KEEP}) AS is_eval
      FROM documents WHERE length(trim(text)) > 0),
  sym AS (SELECT i AS a, j AS b FROM pairs
          UNION ALL SELECT j, i FROM pairs),
  leaked AS (
      SELECT DISTINCT s.a AS doc_id
      FROM sym s
      JOIN dd x ON s.a = x.doc_id
      JOIN dd y ON s.b = y.doc_id
      WHERE NOT x.is_eval AND y.is_eval),
  tr AS (
      SELECT dd.doc_id, dd.lang, dd.n_tokens
      FROM dd LEFT JOIN leaked l ON dd.doc_id = l.doc_id
      WHERE NOT dd.is_eval AND l.doc_id IS NULL),
  ed0 AS (
      SELECT p.i, p.j FROM pairs p
      JOIN tr t1 ON p.i = t1.doc_id JOIN tr t2 ON p.j = t2.doc_id),
  -- MATERIALIZED: a recursive CTE re-evaluates every non-materialized
  -- CTE it references ON EACH ITERATION — without the hint, reach
  -- re-runs the whole pairs chain and g re-runs the entire
  -- split/dedup/mixture pipeline per recursion step (measured: 47.5 s
  -- -> 0.8 s at sf0.001)
  ed AS MATERIALIZED (SELECT i AS a, j AS b FROM ed0
                      UNION SELECT j, i FROM ed0),
  reach(a, b) AS (
      SELECT a, b FROM ed
      UNION
      SELECT r.a, e2.b FROM reach r JOIN ed e2 ON r.b = e2.a),
  comp AS (SELECT a, least(a, min(b)) AS component FROM reach GROUP BY a),
  kept AS (
      SELECT t.doc_id, t.lang, t.n_tokens
      FROM tr t LEFT JOIN comp c ON t.doc_id = c.a
      WHERE coalesce(c.component, t.doc_id) = t.doc_id),
  nl AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl FROM kept GROUP BY 1),
  mm AS (SELECT MIN(nl) AS nmin FROM nl),
  rr AS (
      SELECT nl.lang,
             CAST(floor(sqrt(CAST(mm.nmin AS DOUBLE) / CAST(nl.nl AS DOUBLE))
                        * {_MIX_MOD}) AS BIGINT) AS thresh
      FROM nl, mm),
  samp AS MATERIALIZED (
      SELECT k.doc_id, k.lang, k.n_tokens,
             k.doc_id // {GREEDY_SHARD_WIDTH} AS shard,
             row_number() OVER (PARTITION BY k.lang,
                                k.doc_id // {GREEDY_SHARD_WIDTH}
                                ORDER BY k.doc_id) AS rn
      FROM kept k JOIN rr ON k.lang = rr.lang
      WHERE {knuth32_sql('k.doc_id')} < rr.thresh),
  g AS (
      SELECT lang, shard, rn, doc_id, n_tokens,
             CAST(0 AS BIGINT) AS bin, n_tokens AS fill
      FROM samp WHERE rn = 1
      UNION ALL
      SELECT s.lang, s.shard, s.rn, s.doc_id, s.n_tokens,
             CASE WHEN g.fill + s.n_tokens > {GREEDY_PACK_BUDGET}
                       AND g.fill > 0
                  THEN g.bin + 1 ELSE g.bin END,
             CASE WHEN g.fill + s.n_tokens > {GREEDY_PACK_BUDGET}
                       AND g.fill > 0
                  THEN s.n_tokens ELSE g.fill + s.n_tokens END
      FROM g JOIN samp s ON s.lang = g.lang AND s.shard = g.shard
                        AND s.rn = g.rn + 1),
  pk AS (
      SELECT lang, CAST(sum(bins) AS BIGINT) AS n_seqs,
             CAST(sum(tok) AS BIGINT) AS packed_tokens
      FROM (SELECT lang, shard, max(bin) + 1 AS bins,
                   sum(n_tokens) AS tok
            FROM g GROUP BY 1, 2) z
      GROUP BY 1),
  base AS (
      SELECT dd.lang,
             CAST(sum(CASE WHEN NOT dd.is_eval THEN 1 ELSE 0 END) AS BIGINT)
               AS n_train,
             CAST(count(l.doc_id) AS BIGINT) AS n_leaked
      FROM dd LEFT JOIN leaked l ON dd.doc_id = l.doc_id
      GROUP BY 1),
  dk AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_dedup_kept
         FROM kept GROUP BY 1),
  sp AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled
         FROM samp GROUP BY 1)
  SELECT b.lang, b.n_train, b.n_leaked,
         COALESCE(dk.n_dedup_kept, 0) AS n_dedup_kept,
         COALESCE(sp.n_sampled, 0)    AS n_sampled,
         COALESCE(pk.n_seqs, 0)       AS n_seqs,
         COALESCE(pk.packed_tokens, 0) AS packed_tokens
  FROM base b
  LEFT JOIN dk ON b.lang = dk.lang
  LEFT JOIN sp ON b.lang = sp.lang
  LEFT JOIN pk ON b.lang = pk.lang
"""
    )


@register(
    "corpus_build",
    oracle=_build_oracle(),
    tags=("north_star", "pipeline", "capstone", "dedup", "sampling"),
)
def corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus build report per language:
    (lang, n_train, n_leaked, n_dedup_kept, n_sampled, n_seqs,
    packed_tokens). Stage semantics in the module docstring.

    Scale story, stage by stage: the split/leak flags are pure
    doc_id functions computed scan-side on BOTH pair endpoints (no
    membership join); the leaked set collapses the pair frame through
    one distinct into a broadcast; CC runs on the survivor-restricted
    pair subgraph (star contraction, diameter-bounded); the mixture
    rate table is |langs| rows from one map-side-combined count
    (broadcast back — no document shuffle); packing is the bounded
    (lang, shard) fold, and because the report needs only per-shard
    BIN COUNTS, the offset stitch (a join back onto doc-grain data)
    drops out entirely. The only doc-grain exchanges are the memoized
    pair build, the CC label join, and the one applyInPandas pack.
    At 100 TB the exact-Jaccard pair frame is replaced by the banded
    MinHash-LSH candidate path (the dedup_minhash adjudication — same
    swap corpus_decontaminate documents); every downstream stage is
    unchanged because they consume only (i, j) pairs."""
    from etl_cnpjs_spark.functions.text import tokens
    from etl_cnpjs_spark.operators.graph import connected_components
    from etl_cnpjs_spark.operators.packing import greedy_pack_bins
    from etl_cnpjs_spark.plans.dedup import _exact_pairs
    from etl_cnpjs_spark.plans.extended import _KEEP
    from etl_cnpjs_spark.plans.extended14 import (
        GREEDY_PACK_BUDGET,
        GREEDY_SHARD_WIDTH,
    )
    from etl_cnpjs_spark.plans.registry import knuth32

    def is_eval(col):
        return knuth32(col) < F.lit(_KEEP)

    d = (
        table(spark, sf_dir, "documents", parallel=True)
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            "lang",
            F.size(tokens(F.col("text"))).alias("n_tokens"),
            is_eval(F.col("doc_id")).alias("is_eval"),
        )
    )
    pairs = _exact_pairs(spark, sf_dir).select("i", "j")

    # decontaminate: train docs with an eval near-dup partner
    sym = pairs.select(F.col("i").alias("a"), F.col("j").alias("b")).unionAll(
        pairs.select(F.col("j").alias("a"), F.col("i").alias("b"))
    )
    leaked = (
        sym.filter(~is_eval(F.col("a")) & is_eval(F.col("b")))
        .select(F.col("a").alias("doc_id"))
        .distinct()
        # three consumers: tr anti-join, edge anti-joins, report join
        .localCheckpoint()
    )
    tr = (
        d.filter(~F.col("is_eval"))
        .join(F.broadcast(leaked), "doc_id", "left_anti")
        # consumed by CC nodes, the label join, and (via kept) the
        # mixture counts — barrier the scan+flag+anti once
        .localCheckpoint()
    )

    # near-dup CC on the survivor-restricted subgraph, keep component-min
    ed = (
        pairs.filter(~is_eval(F.col("i")) & ~is_eval(F.col("j")))
        .join(F.broadcast(leaked.withColumnRenamed("doc_id", "i")), "i", "left_anti")
        .join(F.broadcast(leaked.withColumnRenamed("doc_id", "j")), "j", "left_anti")
    )
    labels = connected_components(
        tr.select(F.col("doc_id").alias("node")),
        ed.select(F.col("i").alias("src"), F.col("j").alias("dst")),
    )
    kept = (
        labels.filter(F.col("node") == F.col("component"))
        .select(F.col("node").alias("doc_id"))
        .join(tr, "doc_id")
        .select("doc_id", "lang", "n_tokens")
        # consumed by the rate counts AND the sampled filter
        .localCheckpoint()
    )

    # temperature mixture (alpha = 0.5) on the deduped survivors —
    # sample_temperature_mix's rate formula, one shared definition
    from etl_cnpjs_spark.plans.corpus import temperature_rate_table

    nl = kept.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("nl"))
    rr = temperature_rate_table(nl)
    samp = (
        kept.join(F.broadcast(rr), "lang")
        .filter(knuth32(F.col("doc_id")) < F.col("thresh"))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.expr(f"doc_id DIV {GREEDY_SHARD_WIDTH}").alias("shard"),
        )
    )

    # greedy sharded packing; the report needs only per-shard bin counts
    packed = samp.groupBy("lang", "shard").applyInPandas(
        greedy_pack_bins(GREEDY_PACK_BUDGET),
        "doc_id long, lang string, n_tokens int, shard long, bin long",
    )
    pk = (
        packed.groupBy("lang", "shard")
        .agg(
            (F.max("bin") + 1).cast("bigint").alias("bins"),
            F.sum("n_tokens").cast("bigint").alias("tok"),
        )
        .groupBy("lang")
        .agg(
            F.sum("bins").cast("bigint").alias("n_seqs"),
            F.sum("tok").cast("bigint").alias("packed_tokens"),
        )
    )

    # per-language stage report
    base = (
        d.join(F.broadcast(leaked.withColumn("_leak", F.lit(1))), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.sum(F.when(~F.col("is_eval"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_train"),
            F.count("_leak").cast("bigint").alias("n_leaked"),
        )
    )
    dk = kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dedup_kept")
    )
    sp = samp.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled")
    )
    return (
        base.join(dk, "lang", "left")
        .join(sp, "lang", "left")
        .join(pk, "lang", "left")
        .select(
            "lang",
            "n_train",
            "n_leaked",
            F.coalesce("n_dedup_kept", F.lit(0)).cast("bigint").alias("n_dedup_kept"),
            F.coalesce("n_sampled", F.lit(0)).cast("bigint").alias("n_sampled"),
            F.coalesce("n_seqs", F.lit(0)).cast("bigint").alias("n_seqs"),
            F.coalesce("packed_tokens", F.lit(0))
            .cast("bigint")
            .alias("packed_tokens"),
        )
    )


# --- corpus_decontaminate_incremental -----------------------------------------
#
# The incremental face of decontamination: a NEW benchmark lands (a
# delta band of eval docs), and the pipeline must answer "which train
# docs become leaked NOW that weren't before?" without re-running the
# full cross-split sweep. Membership of both eval generations is a pure
# doc_id function (base = hash < 10%, delta = the next 5% band), so the
# delta probe is pair-frame work restricted to delta-eval endpoints —
# the same delta-restricted-probe discipline as dedup_incremental /
# graph_cc_incremental. Report per source: new-eval volume, NEWLY
# leaked train docs (delta partners only, minus docs the base split
# already leaked), and the pre-existing leak count for reconciliation.

_DELTA_BAND = 214_748_365  # ≈ 5% of 2^32: the new benchmark's band


def _decon_inc_oracle() -> str:
    from etl_cnpjs_spark.plans.dedup import _SQL_PAIRS
    from etl_cnpjs_spark.plans.extended import _KEEP
    from etl_cnpjs_spark.plans.registry import knuth32_sql

    hi = _KEEP + _DELTA_BAND
    return (
        _SQL_PAIRS
        + f"""
  , ev AS (
      SELECT doc_id, source,
             {knuth32_sql('doc_id')} AS h
      FROM documents),
  fl AS (
      SELECT doc_id, source,
             h < {_KEEP} AS base_eval,
             h >= {_KEEP} AND h < {hi} AS delta_eval,
             h >= {hi} AS is_train
      FROM ev),
  sym AS (SELECT i AS a, j AS b FROM pairs
          UNION ALL SELECT j, i FROM pairs),
  base_leaked AS (
      SELECT DISTINCT s.a AS doc_id
      FROM sym s JOIN fl x ON s.a = x.doc_id JOIN fl y ON s.b = y.doc_id
      WHERE x.is_train AND y.base_eval),
  delta_hit AS (
      SELECT DISTINCT s.a AS doc_id
      FROM sym s JOIN fl x ON s.a = x.doc_id JOIN fl y ON s.b = y.doc_id
      WHERE x.is_train AND y.delta_eval),
  newly AS (
      SELECT d.doc_id FROM delta_hit d
      LEFT JOIN base_leaked b ON d.doc_id = b.doc_id
      WHERE b.doc_id IS NULL)
  SELECT fl.source,
         CAST(sum(CASE WHEN fl.is_train THEN 1 ELSE 0 END) AS BIGINT)
           AS n_train,
         CAST(sum(CASE WHEN fl.delta_eval THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new_eval,
         CAST(count(bl.doc_id) AS BIGINT) AS n_already_leaked,
         CAST(count(nw.doc_id) AS BIGINT) AS n_newly_leaked
  FROM fl
  LEFT JOIN base_leaked bl ON fl.doc_id = bl.doc_id
  LEFT JOIN newly nw ON fl.doc_id = nw.doc_id
  GROUP BY fl.source
"""
    )


@register(
    "corpus_decontaminate_incremental",
    oracle=_decon_inc_oracle(),
    tags=("north_star", "dedup", "pipeline", "eval", "incremental"),
)
def corpus_decontaminate_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta decontamination report per source: (source, n_train,
    n_new_eval, n_already_leaked, n_newly_leaked) for a new benchmark
    band of eval docs (the 5% hash band above the base 10% split).

    Shapes: all three memberships are scan-side doc_id arithmetic on
    BOTH pair endpoints (no split table, no membership join); the two
    leak sets are projections+distinct of the memoized pair frame
    restricted by endpoint flags — each collapses to a broadcast before
    the one documents rollup. The incremental property: the delta probe
    touches only pairs whose partner lands in the NEW band — at 100 TB
    with the banded-LSH pair path, that is one LSH probe of the delta
    docs against the posting table (dedup_incremental's batch-probe
    shape), not a corpus re-sweep."""
    from etl_cnpjs_spark.plans.dedup import _exact_pairs
    from etl_cnpjs_spark.plans.extended import _KEEP
    from etl_cnpjs_spark.plans.registry import knuth32

    hi = _KEEP + _DELTA_BAND

    def h(col):
        return knuth32(col)

    def base_eval(col):
        return h(col) < F.lit(_KEEP)

    def delta_eval(col):
        return (h(col) >= F.lit(_KEEP)) & (h(col) < F.lit(hi))

    def is_train(col):
        return h(col) >= F.lit(hi)

    d = table(spark, sf_dir, "documents")
    pairs = _exact_pairs(spark, sf_dir).select("i", "j")
    sym = pairs.select(F.col("i").alias("a"), F.col("j").alias("b")).unionAll(
        pairs.select(F.col("j").alias("a"), F.col("i").alias("b"))
    )
    base_leaked = (
        sym.filter(is_train(F.col("a")) & base_eval(F.col("b")))
        .select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("_base", F.lit(1))
        # two consumers: the anti filter for newly + the report join
        .localCheckpoint()
    )
    newly = (
        sym.filter(is_train(F.col("a")) & delta_eval(F.col("b")))
        .select(F.col("a").alias("doc_id"))
        .distinct()
        .join(F.broadcast(base_leaked.select("doc_id")), "doc_id", "left_anti")
        .withColumn("_new", F.lit(1))
    )
    return (
        d.select("doc_id", "source")
        .join(F.broadcast(base_leaked), "doc_id", "left")
        .join(F.broadcast(newly), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.sum(F.when(is_train(F.col("doc_id")), 1).otherwise(0))
            .cast("bigint")
            .alias("n_train"),
            F.sum(F.when(delta_eval(F.col("doc_id")), 1).otherwise(0))
            .cast("bigint")
            .alias("n_new_eval"),
            F.count("_base").cast("bigint").alias("n_already_leaked"),
            F.count("_new").cast("bigint").alias("n_newly_leaked"),
        )
    )
