"""Round-6 surface growth: CEP-style sequence pattern matching,
training-pipeline quota/epoch sampling, a hand-rolled Bloom-filter join
prefilter (the runtime-filter 100 TB pattern), interval concurrency via
a distributed two-level prefix sum, and corpus line/segment-level
deduplication (the CCNet/RefinedWeb recipe).

Reference trace: the reference computes one join+filter aggregate
(ETLCNPJFinalEmpresaEstabelecimentos.py:191-234) and has none of this
surface; these extend the events/corpus/join families along SURVEY.md
§2.2b growth directions, each with a full DuckDB oracle.

Determinism: sequence strings are built under a total (ts, event_id)
order; quota ordering uses a Knuth multiplicative hash both engines
compute in exact int64; concurrency tie-breaks process interval ENDS
before STARTS at the same instant (half-open [s,e) semantics) with
event_id as the final key; segment reassembly is position-ordered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.plans.registry import register

# --- events_pattern_match ---------------------------------------------------
#
# MATCH_RECOGNIZE / CEP-lite: encode each user's event history as a
# character sequence under a total (ts, event_id) order and run a regex
# over it. The pattern here: a signup followed by at least one click and
# then a purchase, with NO error anywhere between the signup and the
# purchase — the "clean conversion" question a funnel with per-step
# windows can't express (events_funnel counts ordered steps; the [^e]
# classes assert an exclusion BETWEEN steps).

_PM_CASES = [
    ("signup", "s"),
    ("click", "c"),
    ("purchase", "p"),
    ("error", "e"),
]
_PM_REGEX = "s[^e]*c[^e]*p"


@register(
    "events_pattern_match",
    oracle=f"""
    WITH ch AS (
      SELECT user_id, ts, event_id,
             CASE event_type WHEN 'signup' THEN 's' WHEN 'click' THEN 'c'
                             WHEN 'purchase' THEN 'p' WHEN 'error' THEN 'e'
                             ELSE 'v' END AS ch
      FROM events),
    s AS (
      SELECT user_id, string_agg(ch, '' ORDER BY ts, event_id) AS seq
      FROM ch GROUP BY user_id)
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS seq_len,
           regexp_matches(seq, '{_PM_REGEX}') AS converted_clean
    FROM s
    """,
    tags=("events", "cep", "pattern"),
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-over-sequence event pattern matching (the CEP /
    MATCH_RECOGNIZE shape, composed from primitives Spark already has):
    per-user character encoding -> ordered collect -> one rlike. The
    sequence is built with array_sort(collect_list(struct(ts, event_id,
    ch))) — a total order, so the string is deterministic — and the
    regex engines agree because the pattern uses only literals and
    negated character classes (portable RE subset). Distributed shape:
    ONE hash(user_id) exchange; per-user state is its event string
    (bounded by history length — same per-key-payload class as
    agg_collect). The UNBOUNDED-stream face is real, not a seam: the
    same pattern runs as an incremental maximal-progress NFA carrying 3
    ints of per-user state (streaming/stateful.py::cep_clean_conversion,
    applyInPandasWithState), proven to converge to THIS batch verdict in
    tests/test_streaming.py::test_streaming_cep_matches_batch_pattern_match."""
    ev = table(spark, sf_dir, "events")
    ch = F.col("event_type")
    mapped = None
    for k, v in _PM_CASES:
        mapped = (
            F.when(ch == k, v) if mapped is None else mapped.when(ch == k, v)
        )
    mapped = mapped.otherwise("v")
    seq = (
        ev.select("user_id", "ts", "event_id", mapped.alias("ch"))
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("ts").alias("t"),
                                F.col("event_id").alias("e"),
                                F.col("ch").alias("ch"),
                            )
                        )
                    ),
                    lambda s: s["ch"],
                ),
            ).alias("seq")
        )
    )
    return seq.select(
        "user_id",
        F.length("seq").cast("bigint").alias("seq_len"),
        F.col("seq").rlike(_PM_REGEX).alias("converted_clean"),
    )


# --- sample_quota_per_key ---------------------------------------------------
#
# Per-source document quotas — the data-recipe primitive that caps any
# single domain/source's contribution to a training mix (the "no more
# than N docs per domain" rule every curation pipeline applies after
# dedup). Selection order inside a source is a Knuth multiplicative
# hash of doc_id (pseudo-random but exact int64 in both engines), so
# the quota takes an unbiased slice instead of the lowest ids.

_QUOTA = 15
_KNUTH = 2654435761  # 2^32 / phi, the classic multiplicative constant
_MOD32 = 4294967296


@register(
    "sample_quota_per_key",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY (doc_id * {_KNUTH}) % {_MOD32}, doc_id) AS slot
      FROM documents)
    SELECT doc_id, source, CAST(slot AS BIGINT) AS slot
    FROM r WHERE slot <= {_QUOTA}
    """,
    tags=("sample", "corpus", "quota"),
)
def sample_quota_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota sampling: keep at most {_QUOTA} docs per source, chosen by
    hash order. One hash(source) exchange + per-group top-k (rank
    filter prunes early under AQE); the hash order makes re-runs stable
    under corpus growth for the docs that stay (a doc's rank only
    changes if new docs hash below it — unlike insertion order, which
    reshuffles everything). Skew posture: a heavy source's partition
    still sorts only ITS docs; for web-scale single-domain skew the
    same op runs after a per-domain salted pre-top-k (take {_QUOTA}
    per salt, then re-rank — exact because quota ≤ per-salt keep)."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(_MOD32), F.col("doc_id")
    )
    return (
        d.select("doc_id", "source", F.row_number().over(w).cast("bigint").alias("slot"))
        .filter(F.col("slot") <= _QUOTA)
    )


# --- sample_epoch_repeat ----------------------------------------------------
#
# Epoch-repetition mixing — the other half of the data recipe: scarce
# high-quality sources repeat for multiple epochs while bulk sources
# run once (the public LLM-training practice of up-sampling curated
# corpora by small integer factors). Deterministic factors derived from
# the source id; each (doc, epoch) is a distinct output row.


@register(
    "sample_epoch_repeat",
    oracle="""
    SELECT doc_id, source, CAST(unnest(generate_series(1, epochs)) AS BIGINT) AS epoch
    FROM (
      SELECT doc_id, source,
             CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN 3
                  WHEN CAST(substr(source, 4) AS INT) < 10 THEN 2
                  ELSE 1 END AS epochs
      FROM documents) t
    """,
    tags=("sample", "corpus", "epochs"),
)
def sample_epoch_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized epoch repetition: sequence(1, epochs) + explode —
    the repeat factor is a derived column, so the fan-out happens
    scan-side with NO shuffle at all (pure narrow transform; at 100 TB
    the writer repartitions the output, not this operator). Factors: 3
    epochs for sources 0-4, 2 for 5-9, 1 for the rest — stand-ins for
    a quality-tier table that would broadcast-join identically."""
    d = table(spark, sf_dir, "documents")
    sid = F.substring("source", 4, 10).cast("int")
    epochs = (
        F.when(sid < 5, 3).when(sid < 10, 2).otherwise(1)
    )
    return d.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1), epochs)).alias("__e"),
    ).select("doc_id", "source", F.col("__e").cast("bigint").alias("epoch"))


# --- join_bloom_prefilter ---------------------------------------------------
#
# The runtime-filter pattern, built from first principles: before
# shuffling the 100 TB fact side into a join, probe a fixed-size Bloom
# filter of the dim side's keys and drop non-matching rows AT THE SCAN.
# Spark injects these automatically in some shapes
# (spark.sql.optimizer.runtime.bloomFilter.enabled); this plan builds
# the filter explicitly — k=3 multiplicative hashes over an m-bit
# space, the bit set materialized as a distinct-position frame and
# broadcast — so the pruning is visible, testable, and portable. The
# final equi-join re-verifies every surviving row, so Bloom false
# positives cost only wasted shuffle rows, never wrong answers — which
# is why the oracle is the PLAIN join.

_BLOOM_M = 65536
_BLOOM_HASHES = [(2654435761, 0), (2246822519, 101), (3266489917, 211)]


def _bloom_positions(key, h_idx: int):
    a, b = _BLOOM_HASHES[h_idx]
    return ((key * F.lit(a) + F.lit(b)) % F.lit(_MOD32)) % F.lit(_BLOOM_M)


@register(
    "join_bloom_prefilter",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_nationkey = 5
    """,
    tags=("join", "bloom", "runtime_filter"),
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered equi-join: build k=3 hash positions over the
    selective dim side (customers of nation 5), union-distinct them
    into one ≤ m-row bit-set frame, broadcast it, and semi-join the
    fact side's positions against it ONCE per hash — three scan-side
    broadcast semi-joins that drop most fact rows before the real join
    shuffles. The bit set is bounded by m = 65536 positions whatever
    the dim cardinality (the Bloom property: fixed size, one-sided
    error), and every surviving row is re-verified by the exact join,
    so the plan's answer equals the unfiltered join bit-for-bit. At
    cluster scale this is the difference between shuffling the full
    fact table and shuffling ~selectivity of it; Spark's own
    InjectRuntimeFilter does the same rewrite invisibly when stats
    justify it."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") == 5)
        .select("c_custkey", "c_name")
    )
    key = F.col("c_custkey").cast("bigint")
    bits = None
    for i in range(len(_BLOOM_HASHES)):
        p = c.select(_bloom_positions(key, i).alias("pos"))
        bits = p if bits is None else bits.unionByName(p)
    bits = bits.distinct()

    o = table(spark, sf_dir, "orders")
    okey = F.col("o_custkey").cast("bigint")
    pruned = o
    for i in range(len(_BLOOM_HASHES)):
        pruned = (
            pruned.withColumn("__pos", _bloom_positions(okey, i))
            .join(
                F.broadcast(bits.withColumnRenamed("pos", "__pos")),
                "__pos",
                "left_semi",
            )
            .drop("__pos")
        )
    return (
        pruned.join(F.broadcast(c), pruned.o_custkey == c.c_custkey)
        .select(
            "o_orderkey",
            "o_custkey",
            "c_name",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
    )


# --- events_concurrency -----------------------------------------------------
#
# Sweep-line interval concurrency — "how many sessions were live at
# once" — the Allen-interval aggregate behind capacity planning and
# concurrency SLAs. Each click opens a 10-minute half-open interval
# [ts, ts+600s); concurrency at any instant is (starts so far) −
# (ends so far). The distributed shape is a TWO-LEVEL PREFIX SUM: a
# per-day local running sum (hash(day) exchange, parallel) plus a
# cumulative carry-in of whole-day totals (a |days|-row window —
# trivially small), summed. The naive form is ONE global-order window
# (a single task at any scale); the oracle runs exactly that naive
# form, proving the two-level decomposition exact.

_CONC_INTERVAL_S = 600


@register(
    "events_concurrency",
    oracle=f"""
    WITH iv AS (
      SELECT event_id, ts AS s, ts + INTERVAL {_CONC_INTERVAL_S} SECOND AS e
      FROM events WHERE event_type = 'click'),
    pts AS (
      SELECT s AS t, 1 AS d, event_id FROM iv
      UNION ALL
      SELECT e AS t, -1 AS d, event_id FROM iv),
    run AS (
      SELECT t, SUM(d) OVER (ORDER BY t, d, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM pts)
    SELECT date_trunc('hour', t) AS hour_ts,
           CAST(MAX(cc) AS BIGINT) AS max_concurrency
    FROM run GROUP BY 1
    """,
    tags=("events", "interval", "sweep"),
)
def events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max concurrent 10-minute click sessions per hour. Tie discipline:
    at the same instant an END (d=-1) processes before a START (d=+1) —
    half-open [s,e) semantics — via ORDER BY (t, d, event_id), which
    both engines apply identically. Scale shape: the local running sum
    partitions by calendar day (parallel), day totals cumulate in a
    second window over |days| rows (the classic two-level scan — the
    carry-in), and their sum is the global running concurrency; the
    oracle computes the single global-order window instead, so a green
    hash PROVES prefix-sum decomposition correctness, not just
    arithmetic."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    iv = ev.select(
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr(f"INTERVAL {_CONC_INTERVAL_S} SECONDS")).alias("e"),
    )
    pts = iv.select(
        F.col("s").alias("t"), F.lit(1).alias("d"), "event_id"
    ).unionByName(iv.select(F.col("e").alias("t"), F.lit(-1).alias("d"), "event_id"))
    day = F.date_trunc("day", F.col("t"))
    w_local = (
        Window.partitionBy(day)
        .orderBy("t", "d", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = pts.withColumn("cc_local", F.sum("d").over(w_local)).withColumn(
        "__day", day
    )
    day_tot = (
        pts.groupBy(day.alias("__day")).agg(F.sum("d").alias("dt"))
    )
    w_days = (
        Window.orderBy("__day").rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = day_tot.withColumn(
        "carry", F.coalesce(F.sum("dt").over(w_days), F.lit(0))
    ).select("__day", "carry")
    run = local.join(F.broadcast(carry), "__day").select(
        "t", (F.col("cc_local") + F.col("carry")).alias("cc")
    )
    return run.groupBy(F.date_trunc("hour", "t").alias("hour_ts")).agg(
        F.max("cc").cast("bigint").alias("max_concurrency")
    )


# --- text_line_dedup --------------------------------------------------------
#
# Line/segment-level corpus deduplication — the CCNet / RefinedWeb /
# Gopher recipe: boilerplate repeats ACROSS documents as identical
# lines (nav bars, footers, license headers); removing segments whose
# corpus-wide document frequency exceeds a threshold cleans documents
# that are NOT near-dups as wholes. This corpus has no newlines, so
# "lines" are deterministic 12-token segments (the doc_chunk
# discipline); the dedup key is the segment text itself.

_SEG_TOKENS = 12
_SEG_DF_MAX = 2  # keep segments appearing in <= 2 docs


@register(
    "text_line_dedup",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents WHERE length(trim(text)) > 0),
    seg AS (
      SELECT doc_id,
             CAST(i AS INT) AS seg_idx,
             array_to_string(t[(i * {_SEG_TOKENS} + 1):((i + 1) * {_SEG_TOKENS})], ' ') AS seg
      FROM tk, unnest(generate_series(0, CAST(ceil(len(t) / {_SEG_TOKENS}.0) AS INT) - 1)) AS g(i)),
    df AS (
      SELECT seg, COUNT(DISTINCT doc_id) AS df FROM seg GROUP BY seg),
    kept AS (
      SELECT s.doc_id, s.seg_idx, s.seg
      FROM seg s JOIN df ON s.seg = df.seg
      WHERE df.df <= {_SEG_DF_MAX})
    SELECT t.doc_id,
           CAST(ceil(len(t.t) / {_SEG_TOKENS}.0) AS BIGINT) AS n_segs,
           CAST(COUNT(k.seg) AS BIGINT) AS n_kept,
           COALESCE(string_agg(k.seg, ' ' ORDER BY k.seg_idx), '') AS clean_text
    FROM tk t LEFT JOIN kept k ON t.doc_id = k.doc_id
    GROUP BY t.doc_id, len(t.t)
    """,
    tags=("north_star", "text", "dedup", "lines"),
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level dedup: tokenize once, cut 12-token segments by
    position (slice — no lambda-captured retokenization, the
    functions/text.py CSE discipline), posexplode, count corpus-wide
    doc frequency per segment, drop segments with df > {_SEG_DF_MAX},
    and reassemble each document position-ordered. Two shuffles: one
    hash(segment) for the df aggregate, one hash(doc_id) for the
    rebuild — both carry (doc_id, seg_idx, segment) rows, never whole
    documents. At 100 TB the segment df frame is the big intermediate;
    it partial-aggregates map-side and the df filter pushes into the
    join (a df > k segment never reaches the rebuild shuffle). The
    left join keeps fully-boilerplate docs as empty strings — the
    honest outcome a curation pipeline then drops with its length
    filter."""
    from etl_cnpjs_spark.functions.text import tokens

    d = (
        table(spark, sf_dir, "documents", parallel=True)
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", tokens(F.col("text")).alias("t"))
    )
    nseg = F.ceil(F.size("t") / F.lit(float(_SEG_TOKENS))).cast("int")
    segs = (
        d.select(
            "doc_id",
            F.size("t").alias("nt"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), nseg - 1),
                    lambda i: F.slice(F.col("t"), i * _SEG_TOKENS + 1, _SEG_TOKENS),
                )
            ).alias("seg_idx", "seg_toks"),
        )
        .select(
            "doc_id",
            "nt",
            F.col("seg_idx").cast("int").alias("seg_idx"),
            F.array_join("seg_toks", " ").alias("seg"),
        )
    )
    df = segs.groupBy("seg").agg(F.countDistinct("doc_id").alias("df"))
    kept = segs.join(df.filter(F.col("df") <= _SEG_DF_MAX).select("seg"), "seg")
    base = d.select("doc_id", F.ceil(F.size("t") / F.lit(float(_SEG_TOKENS))).cast("bigint").alias("n_segs"))
    rebuilt = (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seg_idx", "seg"))
                    ),
                    lambda s: s["seg"],
                ),
            ).alias("clean_text"),
        )
    )
    return base.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_segs",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


# --- graph_bfs_bounded ------------------------------------------------------
#
# Multi-source bounded BFS — "everything within 3 hops of the seed set"
# — the neighborhood-expansion primitive behind abuse-ring discovery
# and feature extraction on entity graphs. The graph is the undirected
# part-supplier bipartite graph from lineitem (same derivation as
# graph_label_propagation); seeds are part nodes with partkey % 97 == 0
# (the encoded predicate u % 97 = 0 selects exactly those parts:
# 2k ≡ 0 mod 97 ⟺ k ≡ 0 mod 97 since gcd(2, 97) = 1, and supplier
# nodes are odd so never ≡ 0 mod 2·anything even — they can match
# u % 97 = 0 only via the shared u-column which at seed time is e0.u,
# parts only). Node encoding is the r12 scale-safe even/odd scheme
# (parts 2k, suppliers 2k+1 — structurally disjoint at ANY SF; the
# pre-r13 additive 1e6 offset silently aliased suppliers into parts
# once partkey > 1e6, i.e. SF > 5). Three unrolled frontier
# expansions, each a distinct-project join with an anti-join against
# the visited set — EXACTLY what an iterative BFS does per step, so
# the fixed unroll is the loop body under test, and the oracle can
# mirror it without recursion.

_BFS_HOPS = 3


@register(
    "graph_bfs_bounded",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT 2 * l_partkey AS u, 2 * l_suppkey + 1 AS v
      FROM lineitem),
    e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
    l0 AS (SELECT DISTINCT u AS node FROM e0 WHERE u % 97 = 0),
    l1 AS (
      SELECT DISTINCT e.v AS node FROM e JOIN l0 ON e.u = l0.node
      EXCEPT SELECT node FROM l0),
    l2 AS (
      SELECT DISTINCT e.v AS node FROM e JOIN l1 ON e.u = l1.node
      EXCEPT SELECT node FROM l0 EXCEPT SELECT node FROM l1),
    l3 AS (
      SELECT DISTINCT e.v AS node FROM e JOIN l2 ON e.u = l2.node
      EXCEPT SELECT node FROM l0 EXCEPT SELECT node FROM l1
      EXCEPT SELECT node FROM l2)
    SELECT CAST(node AS BIGINT) AS node, 0 AS level FROM l0
    UNION ALL SELECT CAST(node AS BIGINT), 1 FROM l1
    UNION ALL SELECT CAST(node AS BIGINT), 2 FROM l2
    UNION ALL SELECT CAST(node AS BIGINT), 3 FROM l3
    """,
    tags=("graph", "bfs"),
)
def graph_bfs_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop multi-source BFS levels. Per hop: frontier ⨝ edges →
    distinct neighbors → anti-join visited — two shuffles per hop on
    node keys, the Pregel superstep in DataFrame form (the same loop
    body graph_pagerank/LPA iterate; bounded hops make it
    oracle-expressible without recursion — sql_recursive_closure covers
    the unbounded case). The frontier frames are localCheckpointed per
    hop at scale to cut the lineage; here 3 hops is shallow enough not
    to need it — MEASURED r13: per-hop checkpoints made it 2.15→3.03 s
    (the 4 materialization jobs cost more than the duplicated-subtree
    planning they save; ReusedExchange already dedups the repeated
    exchanges at runtime). visited stays (node)-narrow so the anti-join
    broadcast-ables while frontiers are small and shuffles when they
    are not — AQE's call, not ours."""
    li = table(spark, sf_dir, "lineitem")
    e0 = li.select(
        (F.lit(2) * F.col("l_partkey")).cast("bigint").alias("u"),
        (F.lit(2) * F.col("l_suppkey") + F.lit(1)).cast("bigint").alias("v"),
    ).distinct()
    # the undirected edge frame feeds every hop's join — materialize it
    # ONCE (localCheckpoint; persist(DISK_ONLY) on a cluster) instead of
    # re-running scan+distinct per hop (measured 4.8 → ~2 s at sf0.1)
    e = (
        e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    levels = [
        e0.filter(F.col("u") % 97 == 0).select(F.col("u").alias("node")).distinct()
    ]
    visited = levels[0]
    for _ in range(_BFS_HOPS):
        frontier = (
            e.join(levels[-1].withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
        )
        levels.append(frontier)
        visited = visited.unionByName(frontier)
    out = None
    for i, l in enumerate(levels):
        part = l.select("node", F.lit(i).alias("level"))
        out = part if out is None else out.unionByName(part)
    return out


# --- window_distribution ----------------------------------------------------


@register(
    "window_distribution",
    oracle="""
    SELECT p_partkey, p_brand,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w    AS cume
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice)
    """,
    tags=("window", "distribution"),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank ((rank-1)/(n-1)) and
    cume_dist (rows ≤ current / n) per brand by retail price. Both are
    value-determined under ties (SQL standard), so no tiebreaker is
    needed for a deterministic result; the division is one int/int
    double op, identical in both engines. One hash(p_brand) exchange."""
    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice")
    return p.select(
        "p_partkey",
        "p_brand",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# --- corpus_soft_dedup_weights ----------------------------------------------

from etl_cnpjs_spark.plans.dedup import _SQL_CLUSTER, dedup_cluster  # noqa: E402

_SQL_SOFT_DEDUP = f"""
    SELECT doc_id, component,
           CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size,
           CAST(1000000 / COUNT(*) OVER (PARTITION BY component) AS BIGINT)
             AS weight_ppm
    FROM ({_SQL_CLUSTER}) labeled
"""


@register(
    "corpus_soft_dedup_weights",
    oracle=_SQL_SOFT_DEDUP,
    tags=("north_star", "dedup", "corpus", "weights"),
)
def corpus_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication: instead of dropping near-dup documents, keep
    them all and DOWNWEIGHT each cluster to unit total mass —
    weight_ppm = 1e6 // cluster_size — the loss-weighting alternative
    to hard dedup (duplicate-aware training: the cluster contributes
    one document's worth of gradient however many copies exist).
    Composes dedup_cluster's memoized connected components with one
    count window over the component key; integer ppm keeps the weights
    engine-exact. Shuffle cost beyond the clustering: a single
    hash(component) window exchange."""
    labels = dedup_cluster(spark, sf_dir)
    w = Window.partitionBy("component")
    return labels.select(
        "doc_id",
        "component",
        F.count(F.lit(1)).over(w).cast("bigint").alias("cluster_size"),
        (F.lit(1_000_000) / F.count(F.lit(1)).over(w))
        .cast("bigint")
        .alias("weight_ppm"),
    )


# --- fn_crypto_roundtrip ----------------------------------------------------

_AES_KEY = "0123456789abcdef"  # 16-byte demo key; production keys come
# from a KMS and never appear in plans


@register(
    "fn_crypto_roundtrip",
    oracle="""
    SELECT p_partkey,
           CAST(16 * (length(p_name) // 16 + 1) AS BIGINT) AS ct_len,
           p_name AS decrypted
    FROM part
    """,
    tags=("fn", "crypto"),
)
def fn_crypto_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption round trip (the PII-vault pattern:
    encrypt at ingest, decrypt under policy): aes_encrypt/aes_decrypt
    in ECB-PKCS mode — deterministic, so the ciphertext LENGTH
    (16·(⌊n/16⌋+1), PKCS#7 always-pad) and the decrypted payload are
    oracle-checkable even though DuckDB can't run the cipher itself:
    the oracle states the algebraic contract (decrypt∘encrypt = id +
    the padding length law) rather than re-running AES. GCM (random
    nonce) is the production mode for storage; ECB here because
    determinism is what makes the plan testable — the mode is one
    literal."""
    p = table(spark, sf_dir, "part")
    enc = F.expr(f"aes_encrypt(p_name, '{_AES_KEY}', 'ECB', 'PKCS')")
    return p.select(
        "p_partkey",
        F.length(enc).cast("bigint").alias("ct_len"),
        F.expr(
            f"cast(aes_decrypt(aes_encrypt(p_name, '{_AES_KEY}', 'ECB', 'PKCS'),"
            f" '{_AES_KEY}', 'ECB', 'PKCS') as string)"
        ).alias("decrypted"),
    )


# --- events_change_points ---------------------------------------------------
#
# Mean-shift detection on regularized per-type hourly counts: compare
# the W hours BEFORE each hour against the W hours AFTER it (two rows
# windows over a dense hour grid — the offline two-sample form of
# CUSUM). All-integer arithmetic: counts, sums, and an absolute-diff
# threshold, so the flag is bit-portable.

_CP_W = 3
_CP_THRESHOLD = 30  # |sum_after - sum_before| in events


@register(
    "events_change_points",
    oracle=f"""
    WITH b AS (
      SELECT event_type, date_trunc('hour', min(ts)) AS h0,
                         date_trunc('hour', max(ts)) AS h1
      FROM events GROUP BY event_type),
    grid AS (
      SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts
      FROM b),
    hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    dense AS (
      SELECT g.event_type, g.hour_ts, COALESCE(h.n, 0) AS n
      FROM grid g LEFT JOIN hourly h
        ON g.event_type = h.event_type AND g.hour_ts = h.hour_ts),
    w AS (
      SELECT event_type, hour_ts, n,
             SUM(n) OVER (PARTITION BY event_type ORDER BY hour_ts
                          ROWS BETWEEN {_CP_W} PRECEDING AND 1 PRECEDING) AS prev_n,
             COUNT(*) OVER (PARTITION BY event_type ORDER BY hour_ts
                          ROWS BETWEEN {_CP_W} PRECEDING AND 1 PRECEDING) AS prev_c,
             SUM(n) OVER (PARTITION BY event_type ORDER BY hour_ts
                          ROWS BETWEEN 1 FOLLOWING AND {_CP_W} FOLLOWING) AS next_n,
             COUNT(*) OVER (PARTITION BY event_type ORDER BY hour_ts
                          ROWS BETWEEN 1 FOLLOWING AND {_CP_W} FOLLOWING) AS next_c
      FROM dense)
    SELECT event_type, hour_ts,
           CAST(prev_n AS BIGINT) AS prev_n, CAST(next_n AS BIGINT) AS next_n,
           (abs(next_n - prev_n) >= {_CP_THRESHOLD}) AS is_change
    FROM w WHERE prev_c = {_CP_W} AND next_c = {_CP_W}
    """,
    tags=("events", "timeseries", "changepoint"),
)
def events_change_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-window mean-shift changepoints per event type. The hour grid
    densifies from a per-type bounds aggregate (sequence + explode — no
    collect), missing hours count 0 (a burst FROM silence is a change
    too); edge hours without full windows are excluded, not flagged on
    partial evidence. Distributed shape: hourly counts partial-agg
    map-side; the grid explode is narrow; both rolling windows share
    ONE hash(event_type) exchange and sort (Catalyst plans them in a
    single Window node). The streaming face of this is a 2W-hour
    sliding aggregate with a watermark — stream_sliding's shape on the
    derived count stream."""
    ev = table(spark, sf_dir, "events")
    b = ev.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = b.select(
        "event_type",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_ts"),
    )
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.count(F.lit(1)).alias("n"))
    dense = grid.join(hourly, ["event_type", "hour_ts"], "left").select(
        "event_type", "hour_ts", F.coalesce("n", F.lit(0)).alias("n")
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(-_CP_W, -1)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(1, _CP_W)
    )
    w = dense.select(
        "event_type",
        "hour_ts",
        F.sum("n").over(wp).alias("prev_n"),
        F.count(F.lit(1)).over(wp).alias("prev_c"),
        F.sum("n").over(wn).alias("next_n"),
        F.count(F.lit(1)).over(wn).alias("next_c"),
    )
    return (
        w.filter((F.col("prev_c") == _CP_W) & (F.col("next_c") == _CP_W))
        .select(
            "event_type",
            "hour_ts",
            F.col("prev_n").cast("bigint").alias("prev_n"),
            F.col("next_n").cast("bigint").alias("next_n"),
            (F.abs(F.col("next_n") - F.col("prev_n")) >= _CP_THRESHOLD).alias(
                "is_change"
            ),
        )
    )


# --- agg_weighted_median ----------------------------------------------------


@register(
    "agg_weighted_median",
    oracle="""
    WITH q AS (
      SELECT l_returnflag, l_quantity AS v,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS w
      FROM lineitem),
    c AS (
      SELECT l_returnflag, v, w,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM q)
    SELECT l_returnflag, MIN(v) AS weighted_median
    FROM c WHERE cw * 2 >= tw
    GROUP BY l_returnflag
    """,
    tags=("agg", "weighted", "quantile"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (value where cumulative weight first reaches half
    the total), weights = price micro-quantized to exact bigint cents.
    Within equal values the cumulative sum crosses the half-line inside
    the same value run whatever the intra-run row order, so MIN(v)
    WHERE 2·cum ≥ total is deterministic WITHOUT a tiebreaker — the
    trick that makes a rank-dependent statistic order-insensitive. One
    hash(group) exchange shared by both windows and the final min."""
    l = table(spark, sf_dir, "lineitem")
    q = l.select(
        "l_returnflag",
        F.col("l_quantity").alias("v"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint").alias("w"),
    )
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_returnflag")
    c = q.select(
        "l_returnflag",
        "v",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    return (
        c.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(F.min("v").alias("weighted_median"))
    )


# --- events_top_paths -------------------------------------------------------


_PATHS_K = 10


@register(
    "events_top_paths",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS s2,
             lead(event_type, 2) OVER w AS s3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    p AS (
      SELECT event_type || '>' || s2 || '>' || s3 AS path, COUNT(*) AS n
      FROM o WHERE s3 IS NOT NULL GROUP BY 1)
    SELECT path, CAST(n AS BIGINT) AS n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, path) AS INT) AS rk
    FROM p ORDER BY n DESC, path LIMIT {_PATHS_K}
    """,
    tags=("events", "paths", "analytics"),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k 3-step user journeys (the Sankey/flow primitive): lead×2
    over each user's (ts, event_id)-ordered stream turns every event
    into the path it starts; one count + top-k ranks them. Complements
    events_markov_transitions (1-step transition matrix) with actual
    multi-step route volume. Shapes: ONE user_id window exchange, one
    path-count exchange, TakeOrderedAndProject for the top-k; ties
    rank by path text so the cut is total-ordered."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("s2"),
        F.lead("event_type", 2).over(w).alias("s3"),
    )
    p = (
        o.filter(F.col("s3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "s2", "s3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return (
        p.withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.desc("n"), F.asc("path")))
            .cast("int"),
        )
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(_PATHS_K)
    )


# --- text_langid_confusion --------------------------------------------------

from etl_cnpjs_spark.plans.text import _lang_sql, text_lang_id  # noqa: E402


@register(
    "text_langid_confusion",
    oracle=f"""
    SELECT labeled_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM ({_lang_sql()}) t
    GROUP BY labeled_lang, predicted_lang
    """,
    tags=("north_star", "text", "eval"),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-eval confusion matrix for the language-ID heuristic
    against the corpus's labeled lang — the model-monitoring rollup
    every production classifier ships next to its predictions
    (precision/recall derive from these cells by marginals). Composes
    text_lang_id (scan-side codegen expressions) with one tiny
    (label, prediction) aggregate: the eval costs ONE extra exchange
    of ≤ |langs|² rows however big the corpus."""
    return (
        text_lang_id(spark, sf_dir)
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


# --- agg_gini / agg_hhi -----------------------------------------------------
#
# Concentration/inequality metrics over exact integers. Gini uses the
# rank-weighted identity G = (Σ (2i − n − 1)·x_i) / (n·Σx) on values
# sorted ascending; within a run of EQUAL values the x factor is
# constant while the rank coefficients sum to a fixed total, so the
# numerator is invariant to intra-run order — deterministic without a
# tiebreaker, same trick as agg_weighted_median. HHI is Σ share² over
# per-entity sums (share in ppm) — pure integer until one final
# division.


@register(
    "agg_gini",
    oracle="""
    WITH q AS (
      SELECT event_type,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL AND value >= 0),
    r AS (
      SELECT event_type, x,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x) AS i,
             COUNT(*)  OVER (PARTITION BY event_type) AS n,
             SUM(x)    OVER (PARTITION BY event_type) AS sx
      FROM q)
    SELECT event_type,
           CAST(SUM((2 * i - n - 1) * x) AS DOUBLE) / (CAST(MAX(n) AS DOUBLE) * MAX(sx))
             AS gini
    FROM r GROUP BY event_type
    """,
    tags=("agg", "inequality"),
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Gini coefficient of (non-negative) event values —
    the inequality profile behind whale-detection and data-skew audits.
    Values micro-quantize to exact bigint first; the rank-weighted
    numerator accumulates in bigint (order-insensitive across equal
    values by the coefficient-sum argument above), and exactly one
    double division happens at the end — bit-identical cross-engine.
    One hash(event_type) exchange carries rank, count and sum windows
    together."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") >= 0)
    )
    q = ev.select(
        "event_type",
        F.floor(F.col("value") * 1_000_000 + 0.5).cast("bigint").alias("x"),
    )
    wi = Window.partitionBy("event_type").orderBy("x")
    wp = Window.partitionBy("event_type")
    r = q.select(
        "event_type",
        "x",
        F.row_number().over(wi).alias("i"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("x").over(wp).alias("sx"),
    )
    # The rank-weighted numerator term reaches |2i−n−1|·x ≈ n·1e8 per row;
    # a bigint Σ overflows around n ≈ 3e5 per type (sf1) — accumulate in
    # DECIMAL(38,0) like every other stats plan (DuckDB's SUM(BIGINT) is
    # HUGEINT-exact already; identical after the double cast).
    return r.groupBy("event_type").agg(
        (
            F.sum(((2 * F.col("i") - F.col("n") - 1) * F.col("x")).cast("decimal(38,0)"))
            .cast("double")
            / (F.max("n").cast("double") * F.max("sx"))
        ).alias("gini")
    )


@register(
    "agg_hhi",
    oracle="""
    WITH s AS (
      SELECT o_custkey,
             SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS v
      FROM orders GROUP BY o_custkey),
    t AS (SELECT SUM(v) AS tv, COUNT(*) AS n_entities FROM s),
    sh AS (
      SELECT t.n_entities, (s.v * 1000000000) // t.tv AS s_ppb
      FROM s, t)
    SELECT CAST(n_entities AS BIGINT) AS n_entities,
           CAST(SUM(s_ppb * s_ppb) AS DOUBLE) / 1e18 AS hhi
    FROM sh GROUP BY n_entities
    """,
    tags=("agg", "concentration"),
)
def agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of order revenue across
    customers (share-of-wallet; in a data pipeline the same statistic
    audits per-source corpus concentration). Float-free until the last
    step: per-entity sums are exact bigint cents, each share quantizes
    to parts-per-billion by INTEGER division against the broadcast
    total (identical floor in both engines), and Σ share_ppb² stays in
    bigint (≤ 1e18 · HHI, safe) — one final double division scales to
    the [0,1] HHI. The ppb floor under-counts each share by < 1e-9,
    bounding the HHI bias below 2e-9·n_entities — quantified, not
    hand-waved. One groupBy exchange + a broadcast scalar."""
    o = table(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")).alias("v")
    )
    t = s.agg(F.sum("v").alias("tv"), F.count(F.lit(1)).alias("n_entities"))
    sh = s.crossJoin(F.broadcast(t)).select(
        "n_entities",
        F.expr("(v * 1000000000) DIV tv").alias("s_ppb"),
    )
    return sh.groupBy("n_entities").agg(
        (F.sum(F.col("s_ppb") * F.col("s_ppb")).cast("double") / F.lit(1e18)).alias(
            "hhi"
        )
    ).select(
        F.col("n_entities").cast("bigint").alias("n_entities"), "hhi"
    )


# --- scan_json_nested -------------------------------------------------------

import os as _os  # noqa: E402
import tempfile as _tempfile  # noqa: E402


@register(
    "scan_json_nested",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus,
           l.l_linenumber, l.l_quantity AS qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey % 50 = 0
    """,
    tags=("scan", "json", "nested"),
)
def scan_json_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED JSON round trip — the document-shaped ingest every event
    bus and API export produces: each order serializes as one JSON
    document carrying an ARRAY OF LINE STRUCTS, written as JSONL, read
    back with a DECLARED nested schema (array<struct> — never
    inferred), and re-flattened with explode. The oracle is the plain
    relational join the nesting round-trips, so a green hash proves
    serialize → nested read → explode is lossless. Shapes: the
    collect_list build is one hash(orderkey) exchange; the read-side
    explode is narrow (flatten at the scan); schema declaration keeps
    the 100 TB read single-pass."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    l = table(spark, sf_dir, "lineitem")
    nested = (
        l.join(o.select("o_orderkey", "o_orderstatus"), l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("ln"),
                        F.col("l_quantity").alias("qty"),
                    )
                )
            ).alias("lines")
        )
    )
    out = _os.path.join(_tempfile.mkdtemp(prefix="scan_json_nested_"), "orders_json")
    nested.write.json(out)
    schema = (
        "o_orderkey bigint, o_orderstatus string,"
        " lines array<struct<ln:int, qty:double>>"
    )
    back = spark.read.schema(schema).json(out)
    return back.select(
        "o_orderkey",
        "o_orderstatus",
        F.explode("lines").alias("e"),
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("e.ln").alias("l_linenumber"),
        F.col("e.qty").alias("qty"),
    )


# --- mm_image_phash ---------------------------------------------------------


@register(
    "mm_image_phash",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             doc_id % 64 AS seed,
             CAST(8 + (doc_id % 64) % 9 AS INT) AS width,
             CAST(8 + (doc_id % 64) % 7 AS INT) AS height
      FROM documents),
    grid AS (
      SELECT d.doc_id, d.width, d.height, gy.y, gx.x,
             ((gx.x + 3 * gy.y + d.seed) % 256
              + (2 * gx.x + gy.y + d.seed) % 256
              + (gx.x + gy.y + 3 * d.seed) % 256) AS s
      FROM dims d
      CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS x) gx
      CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS y) gy),
    tot AS (
      SELECT doc_id, SUM(s) AS sum_s FROM grid GROUP BY doc_id),
    hashes AS (
      SELECT g.doc_id, g.width, g.height,
             COALESCE(SUM(CASE WHEN g.s * 56 > t.sum_s
                               THEN (CAST(1 AS BIGINT) << (g.y * 8 + g.x))
                               ELSE 0 END), 0) AS phash
      FROM grid g JOIN tot t ON g.doc_id = t.doc_id
      GROUP BY g.doc_id, g.width, g.height)
    SELECT width, height, CAST(phash AS BIGINT) AS phash,
           CAST(COUNT(*) AS BIGINT) AS n_imgs,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_id
    FROM hashes GROUP BY width, height, phash
    """,
    tags=("north_star", "multimodal", "dedup", "phash"),
)
def mm_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual (average-hash) image grouping over DECODED bytes — the
    near-dup seam mm_image_dedup documents, made real: every image's
    8×7 aHash is computed from the PARSED pixel array executor-side
    (operators/multimodal.py::bmp_ahash_map_in_pandas — strict-majority
    bit per pixel vs the region mean, integer-exact), then images group
    by (dimensions, hash) — the banding step of a perceptual-LSH
    near-dup pipeline (hamming-ball banding drops in by splitting the
    56 bits into bands, dedup_simhash's pigeonhole layout). aHash is
    BRIGHTNESS-INVARIANT by construction (bit = above/below the image's
    own mean), and this corpus proves it: the seed-0 and seed-63 image
    families have different BYTES (md5-distinct in mm_image_dedup) but
    identical dims+aHash, so perceptual grouping merges them — a
    near-dup catch exact dedup cannot make, visible as one fewer group
    than the md5 grouping. The oracle re-derives every BIT analytically
    from the generator pattern without touching bytes, so a green hash
    proves decode → aHash → groupBy end to end. Scale: the shuffle
    carries (doc_id, 2 ints, one int64) per image.

    SHARED-SPEC BLIND SPOT (r6 ADVICE item 5): oracle and plan both
    derive from the same synthetic-generator formula, so a SPEC-level
    mistake (e.g. this implementation's strictly-greater-than-mean tie
    convention, which differs from the classic >= aHash recipe) would
    pass both sides unnoticed. The independent, fixture-based pin that
    anchors behavior from OUTSIDE the generator is
    tests/test_queries.py::test_phash_merges_byte_distinct_near_dups
    (hand-built BMP bytes, hand-derived expected bits); the same caveat
    and mitigation applies to the BMP channel/tile stat keys
    (mm_image_channel_stats, mm_image_tiles)."""
    from etl_cnpjs_spark.operators.multimodal import bmp_ahash_map_in_pandas

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id",
        (F.col("doc_id") % 64).alias("seed"),
        (8 + (F.col("doc_id") % 64) % 9).cast("int").alias("width"),
        (8 + (F.col("doc_id") % 64) % 7).cast("int").alias("height"),
    )
    h = bmp_ahash_map_in_pandas(d)
    return h.groupBy("width", "height", "phash").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_imgs"),
        F.min("doc_id").cast("bigint").alias("canonical_id"),
    )


# --- join_scd2_temporal -----------------------------------------------------

from etl_cnpjs_spark.plans.extended3 import _SQL_SCD2, cdc_scd2  # noqa: E402


@register(
    "join_scd2_temporal",
    oracle=f"""
    WITH scd2 AS ({_SQL_SCD2})
    SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate, d.status
    FROM lineitem l JOIN scd2 d
      ON l.l_orderkey = d.key
     AND d.valid_from <= l.l_shipdate
     AND (d.valid_to IS NULL OR l.l_shipdate < d.valid_to)
    """,
    tags=("join", "scd2", "temporal", "cdc"),
)
def join_scd2_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE warehouse temporal join: facts against a type-2 dimension AT
    EVENT TIME — each lineitem picks the dimension version whose
    [valid_from, valid_to) interval covers its ship date (open interval
    = NULL valid_to). Composes cdc_scd2's interval build with an
    equi-key join carrying the interval containment as a RESIDUAL
    predicate — key equality drives the hash join, so there is no range
    explosion and at most one version matches per fact by SCD2's
    non-overlap invariant (no distinct needed). Scale: the dim interval
    table is the small side (broadcast here; co-partitioned sort-merge
    past broadcast scale); facts never shuffle more than once. The
    same shape reads ANY bitemporal store — cdc_snapshot_at is this
    join with a constant timestamp."""
    li = table(spark, sf_dir, "lineitem")
    d = cdc_scd2(spark, sf_dir)
    return (
        li.join(
            F.broadcast(d),
            (li.l_orderkey == d.key)
            & (d.valid_from <= li.l_shipdate)
            & (d.valid_to.isNull() | (li.l_shipdate < d.valid_to)),
        )
        .select("l_orderkey", "l_linenumber", "l_shipdate", "status")
    )


# --- events_conversion_lag --------------------------------------------------


@register(
    "events_conversion_lag",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts) - epoch_us(s.signup_ts)) AS lag_us
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      GROUP BY e.user_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           CAST(MIN(lag_us) AS BIGINT) AS min_lag_us,
           CAST(quantile_disc(lag_us, 0.5) AS BIGINT) AS p50_lag_us,
           CAST(quantile_disc(lag_us, 0.9) AS BIGINT) AS p90_lag_us,
           CAST(MAX(lag_us) AS BIGINT) AS max_lag_us
    FROM p
    """,
    tags=("events", "funnel", "latency"),
)
def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: each user's FIRST signup to their
    FIRST subsequent purchase, lag in exact integer microseconds, then
    the discrete percentile profile (n, min, p50, p90, max) — the
    latency-funnel rollup growth teams watch next to conversion rate
    (events_funnel counts WHO converts; this measures HOW FAST).
    Shapes: two per-user aggregates share one hash(user_id) exchange
    path; the percentile is an exact sort-agg over |converted users|
    rows (percentile_disc ≡ quantile_disc — a picked element, no
    interpolation, so integer µs stay exact)."""
    ev = table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.unix_micros("ts") - F.unix_micros("signup_ts")
            ).alias("lag_us")
        )
    )
    return p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.min("lag_us").cast("bigint").alias("min_lag_us"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lag_us)")
        .cast("bigint")
        .alias("p50_lag_us"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY lag_us)")
        .cast("bigint")
        .alias("p90_lag_us"),
        F.max("lag_us").cast("bigint").alias("max_lag_us"),
    )


# --- events_ab_ttest --------------------------------------------------------


@register(
    "events_ab_ttest",
    oracle="""
    WITH q AS (
      SELECT user_id % 2 AS arm,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS x
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
    m AS (
      SELECT arm, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx
      FROM q GROUP BY arm),
    st AS (
      SELECT arm, n,
             CAST(sx AS DOUBLE) / n / 1e6 AS mean,
             (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
               / (n - 1) / 1e12 AS var
      FROM m),
    w AS (
      SELECT a.n AS n_a, b.n AS n_b, a.mean AS mean_a, b.mean AS mean_b,
             a.var / a.n + b.var / b.n AS se2
      FROM st a JOIN st b ON a.arm = 0 AND b.arm = 1)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           mean_a, mean_b,
           (mean_b - mean_a) / sqrt(se2) AS t_stat
    FROM w
    """,
    tags=("events", "abtest", "stats"),
)
def events_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t statistic for the A/B purchase-value experiment (the
    significance companion to events_ab_lift's effect size). Exactness
    discipline: values micro-quantize to bigint, so n/Σx/Σx² are exact
    integers; mean and variance derive by a FIXED sequence of double
    ops on those integers, and sqrt is IEEE-exact — every float in the
    output is bit-identical cross-engine without quantization. Shapes:
    one 2-group partial aggregate (map-side combined), then a 2-row
    self-join — the entire test costs one scan whatever the event
    volume."""
    ev = table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    q = ev.select(
        (F.col("user_id") % 2).alias("arm"),
        F.floor(F.col("value") * 1_000_000 + 0.5).cast("bigint").alias("x"),
    )
    # Σx / Σx² accumulate in DECIMAL(38,0): per-row x ≤ 1e8 so x² ≤ 1e16,
    # and a bigint Σx² overflows past ~900 purchase rows × sf — it DID at
    # sf0.1 (caught by the round-6 bench). DuckDB's SUM(BIGINT) is already
    # HUGEINT-exact; decimal matches it bit-for-bit after the double cast.
    m = q.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
    )
    sxd = F.col("sx").cast("double")
    st = m.select(
        "arm",
        "n",
        (sxd / F.col("n") / F.lit(1e6)).alias("mean"),
        (
            (F.col("sxx").cast("double") - sxd * sxd / F.col("n"))
            / (F.col("n") - 1)
            / F.lit(1e12)
        ).alias("var"),
    )
    a = st.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("mean").alias("mean_a"), F.col("var").alias("var_a")
    )
    b = st.filter(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("mean").alias("mean_b"), F.col("var").alias("var_b")
    )
    w = a.crossJoin(b)
    return w.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        "mean_a",
        "mean_b",
        (
            (F.col("mean_b") - F.col("mean_a"))
            / F.sqrt(F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b"))
        ).alias("t_stat"),
    )


# --- window_rolling_median --------------------------------------------------


@register(
    "window_rolling_median",
    oracle="""
    WITH q AS (
      SELECT event_type, ts, event_id,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL)
    SELECT event_type, event_id,
           CAST(quantile_cont(x, 0.5) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e6
             AS rolling_median
    FROM q
    """,
    tags=("window", "timeseries", "robust"),
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over the trailing 7 observations per series — the
    robust smoother (median filters shrug off the spikes that wreck a
    rolling mean; events_anomaly_mad's discipline applied to a moving
    frame). Spark evaluates percentile() AS A WINDOW FUNCTION over the
    rows frame — the aggregate-over-frame surface, distinct from
    grouped percentiles. Exactness: inputs micro-quantize to integers
    first, so the continuous-median interpolation happens at d ∈
    {0, .5} over exact ints and divides by 1e6 once — bit-identical in
    both engines. One hash(event_type) exchange + one sort serves the
    whole computation."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    q = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 1_000_000 + 0.5).cast("bigint").alias("x"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    return q.select(
        "event_type",
        "event_id",
        (F.expr("percentile(x, 0.5)").over(w).cast("double") / F.lit(1e6)).alias(
            "rolling_median"
        ),
    )
