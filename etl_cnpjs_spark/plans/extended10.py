"""Round-6 session-2 batch 4: late-interaction (MaxSim) retrieval
scoring and k-core graph decomposition.

Reference trace: none of this surface exists in the reference
(ETLCNPJFinalEmpresaEstabelecimentos.py); these extend the
similarity/graph families along SURVEY.md §2.2b, each with a full
DuckDB oracle.

Determinism notes:
- MaxSim cosine terms reuse operators/similarity.py's sequential-fold
  dot product (bit-deterministic element order, both engines); the
  per-query maxima are exact SELECTIONS (no arithmetic), and the final
  Σ over the query set is a FIXED-ORDER column addition (m0+m1+…),
  never a row aggregate over doubles;
- k-core runs a FIXED number of peel rounds unrolled identically in
  both engines ("k-core after R rounds" is the registered semantics;
  a test pins that R−1 ≡ R at test scale, i.e. the peel has actually
  converged) — all-integer arithmetic throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.operators.similarity import cosine, sql_cosine, vec_double

# --- sim_maxsim -------------------------------------------------------------
#
# ColBERT-style late interaction: a "document" is a BAG of token
# vectors, and score(Q, D) = Σ_{q∈Q} max_{d∈D} cos(q, d) — the
# retrieval scoring model between single-vector ANN (sim_topk) and
# full cross-attention. Token bags are modeled on the embeddings
# table: vec_id DIV {G} groups 5 consecutive vectors into one bag;
# bag 0 is the query.

_MAXSIM_GROUP = 5
_MAXSIM_TOPK = 10


_MAXSIM_SQL = f"""
    WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    g AS (SELECT vec_id, vec_id // {_MAXSIM_GROUP} AS gid,
                 vec_id % {_MAXSIM_GROUP} AS tix, v FROM n),
    q AS (SELECT tix AS qix, v AS qv FROM g WHERE gid = 0),
    s AS (
      SELECT g.gid, q.qix, max({sql_cosine('g.v', 'q.qv')}) AS m
      FROM g, q WHERE g.gid <> 0
      GROUP BY g.gid, q.qix),
    p AS (
      SELECT gid,
             max(CASE WHEN qix = 0 THEN m END) AS m0,
             max(CASE WHEN qix = 1 THEN m END) AS m1,
             max(CASE WHEN qix = 2 THEN m END) AS m2,
             max(CASE WHEN qix = 3 THEN m END) AS m3,
             max(CASE WHEN qix = 4 THEN m END) AS m4
      FROM s GROUP BY gid)
    SELECT CAST(gid AS BIGINT) AS gid,
           m0 + m1 + m2 + m3 + m4 AS maxsim
    FROM p
    ORDER BY maxsim DESC, gid
    LIMIT {_MAXSIM_TOPK}
    """


from etl_cnpjs_spark.plans.registry import register  # noqa: E402


@register("sim_maxsim", oracle=_MAXSIM_SQL, tags=("similarity", "north_star", "ml"))
def sim_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction MaxSim top-k over token-bag groups.

    Shapes: the query bag (G rows) BROADCASTS against the token scan;
    per-(bag, query-token) maxima partial-aggregate map-side; the Σ
    over query tokens is a fixed-order column addition on the
    bag-sized frame (row-aggregating doubles would be partition-order
    dependent — the one wrong way to write MaxSim). TakeOrdered heap
    for the top-k. At 100 TB: token vectors never shuffle — only
    (gid, qix, max) partials; this is the documented scale shape of
    late-interaction scoring (score-then-prune, no index)."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", vec_double(F.col("embedding")).alias("v")
    )
    g = e.select(
        F.expr(f"vec_id DIV {_MAXSIM_GROUP}").alias("gid"),
        (F.col("vec_id") % _MAXSIM_GROUP).alias("tix"),
        "v",
    )
    q = g.filter(F.col("gid") == 0).select(
        F.col("tix").alias("qix"), F.col("v").alias("qv")
    )
    s = (
        g.filter(F.col("gid") != 0)
        .crossJoin(F.broadcast(q))
        .groupBy("gid", "qix")
        .agg(F.max(cosine(F.col("v"), F.col("qv"))).alias("m"))
    )
    p = s.groupBy("gid").agg(
        *[
            F.max(F.when(F.col("qix") == i, F.col("m"))).alias(f"m{i}")
            for i in range(_MAXSIM_GROUP)
        ]
    )
    maxsim = F.col("m0") + F.col("m1") + F.col("m2") + F.col("m3") + F.col("m4")
    return (
        p.select(F.col("gid").cast("bigint").alias("gid"), maxsim.alias("maxsim"))
        .orderBy(F.desc("maxsim"), F.asc("gid"))
        .limit(_MAXSIM_TOPK)
    )


# --- graph_kcore ------------------------------------------------------------
#
# k-core decomposition of the part↔supplier bipartite graph (the
# pagerank/BFS edge set): iteratively peel nodes with degree < k until
# fixpoint. Registered semantics = "the surviving subgraph after R
# peel rounds" with R fixed and identical in both engines —
# tests/test_queries pins convergence (round R−1 ≡ R) at test scale,
# so the answer IS the k-core there, while the oracle equality never
# depends on convergence.

_KCORE_K = 8
_KCORE_ROUNDS = 4
# Node encoding: the r12 scale-safe even/odd scheme (parts 2k,
# suppliers 2k+1) — structurally disjoint at ANY SF. The pre-r13
# additive 1e7 offset silently aliased suppliers into parts once
# partkey > 1e7 (SF > 50), changing computed core membership while the
# oracle aliased identically (ADVICE r12 low #1).


def _kcore_sql() -> str:
    k = _KCORE_K
    sql = """
    WITH e0 AS (
      SELECT DISTINCT 2 * l_partkey AS u, 2 * l_suppkey + 1 AS v
      FROM lineitem),
    b0 AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0)
    """
    prev = "b0"
    for r in range(_KCORE_ROUNDS):
        sql += f"""
    , d{r} AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
               FROM {prev} GROUP BY 1),
    s{r} AS (SELECT node FROM d{r} WHERE deg >= {k}),
    b{r + 1} AS (
      SELECT e.u, e.v FROM {prev} e
      JOIN s{r} su ON e.u = su.node
      JOIN s{r} sv ON e.v = sv.node)
    """
        prev = f"b{r + 1}"
    sql += f"""
    SELECT u AS node, CAST(count(*) AS BIGINT) AS core_degree
    FROM {prev} GROUP BY 1
    """
    return sql


@register("graph_kcore", oracle=_kcore_sql(), tags=("graph",))
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{K}-core after {R} unrolled peel rounds over part↔supplier
    edges: (surviving node, within-core degree).

    Shapes per round: one hash(node) degree aggregate (map-side
    combined) over the current edge frame, then the survivor filter
    applied to BOTH endpoints as two joins — the survivor set is
    node-sized and broadcasts, so edges are filtered in place and
    never reshuffled. No per-round localCheckpoint: at R=4 unrolled
    rounds ReusedExchange dedups the repeated subtrees at runtime and
    the four materialization jobs cost more than they save (measured
    r13: 2.82 → 2.46 s isolated median without them — the same result
    as graph_bfs_bounded's A/B). R-THRESHOLD (r14 sweep, VERDICT r13
    #8): the barrier-free form is measured safe ONLY at R ≤ 4 — at
    R=6 runtime exchange reuse stops covering the doubled-per-round
    subtree growth and the same peel measures 12.7-19.8 s vs
    2.5-3.3 s with a localCheckpoint every 2 rounds (interleaved
    same-session A/B, sf0.1). Anyone raising _KCORE_ROUNDS past 4, or
    writing an iterative-to-convergence peel (unknown R), must barrier
    every ≤ 2 rounds (the operators/graph.py lineage discipline);
    SCALE.md "Iterative lineage" records the sweep.
    At 100 TB: R scans of a shrinking edge list, each with one small
    exchange; the standard distributed peel (Quick-SQL k-core) shape."""
    li = table(spark, sf_dir, "lineitem")
    e0 = li.select(
        (F.lit(2) * F.col("l_partkey")).alias("u"),
        (F.lit(2) * F.col("l_suppkey") + F.lit(1)).alias("v"),
    ).distinct()
    edges = e0.unionAll(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    edges = edges.localCheckpoint()
    for _ in range(_KCORE_ROUNDS):
        deg = edges.groupBy(F.col("u").alias("node")).agg(
            F.count(F.lit(1)).cast("bigint").alias("deg")
        )
        surv = deg.filter(F.col("deg") >= _KCORE_K).select("node")
        edges = (
            edges.join(
                F.broadcast(surv.select(F.col("node").alias("u"))), "u"
            )
            .join(F.broadcast(surv.select(F.col("node").alias("v"))), "v")
            .select("u", "v")
        )
    return edges.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("core_degree")
    )


# --- mm_image_channel_stats -------------------------------------------------
#
# Per-channel pixel statistics from DECODED image bytes — the
# normalization profile (per-channel sum/min/max) a vision pipeline
# computes before mean/std scaling, and a sharper decode check than
# the summed features: swapping any two channels changes per-channel
# sums while leaving pixel_sum invariant, so BGR ordering is pinned in
# isolation. Same real-codec posture as mm_decode_bmp (synthesize a
# valid 24-bit BMP, parse it back executor-side); the oracle
# re-derives every statistic from the closed-form pixel pattern.


_CHANNEL_SQL = """
    WITH dims AS (
      SELECT doc_id,
             CAST(8 + doc_id % 9 AS INT) AS width,
             CAST(8 + doc_id % 7 AS INT) AS height
      FROM documents
    ),
    grid AS (
      SELECT d.doc_id, d.width, d.height,
             (gx.x + 3 * gy.y + d.doc_id) % 256     AS b,
             (2 * gx.x + gy.y + d.doc_id) % 256     AS g,
             (gx.x + gy.y + 3 * d.doc_id) % 256     AS r
      FROM dims d
      CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS x) gx
      CROSS JOIN (SELECT unnest(generate_series(0, 13)) AS y) gy
      WHERE gx.x < d.width AND gy.y < d.height
    )
    SELECT doc_id,
           CAST(max(width) AS INT)  AS width,
           CAST(max(height) AS INT) AS height,
           CAST(sum(b) AS BIGINT) AS sum_b,
           CAST(sum(g) AS BIGINT) AS sum_g,
           CAST(sum(r) AS BIGINT) AS sum_r,
           CAST(min(b) AS INT) AS min_b, CAST(max(b) AS INT) AS max_b,
           CAST(min(g) AS INT) AS min_g, CAST(max(g) AS INT) AS max_g,
           CAST(min(r) AS INT) AS min_r, CAST(max(r) AS INT) AS max_r
    FROM grid GROUP BY doc_id
    """


@register(
    "mm_image_channel_stats",
    oracle=_CHANNEL_SQL,
    tags=("north_star", "multimodal", "udf", "image"),
)
def mm_image_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel (B/G/R) sum/min/max from decoded BMP pixel arrays.

    Scale shape: Arrow-batched mapInPandas, vectorized numpy per
    image; bytes never leave the task — only 12 integers per image
    cross to the JVM, nothing binary shuffles (SCALE.md multimodal
    rule). The oracle grid re-derives the statistics analytically
    without touching bytes — which also means oracle and plan SHARE the
    generator spec (r6 ADVICE item 5): a spec-level mistake would pass
    both sides. The outside-the-generator anchor is the hand-built BMP
    fixture test noted in mm_image_phash's docstring."""
    from etl_cnpjs_spark.operators.multimodal import (
        bmp_channel_stats_map_in_pandas,
    )

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id",
        (8 + F.col("doc_id") % 9).cast("int").alias("width"),
        (8 + F.col("doc_id") % 7).cast("int").alias("height"),
    )
    return bmp_channel_stats_map_in_pandas(d)


# --- sim_topk_filtered ------------------------------------------------------
#
# FILTERED vector search: top-k cosine neighbors of the query vector
# WITHIN each label class (the "metadata-filtered ANN" every modern
# vector store names as a first-class feature — filter-then-score, not
# score-then-filter, so the predicate prunes the scan before any
# distance math). Composes the similarity family's exact scorer with a
# per-label rank window.

_FILTERED_TOPK = 3


def _filtered_sql() -> str:
    from etl_cnpjs_spark.operators.similarity import sql_cosine

    return f"""
    WITH n AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM n ORDER BY vec_id LIMIT 1),
    s AS (
      SELECT n.vec_id, n.label, {sql_cosine('n.v', 'q.qv')} AS cos_sim
      FROM n, q
      WHERE n.vec_id <> (SELECT min(vec_id) FROM n)),
    r AS (
      SELECT vec_id, label, cos_sim,
             row_number() OVER (PARTITION BY label
                                ORDER BY cos_sim DESC, vec_id) AS rk
      FROM s)
    SELECT label, CAST(rk AS BIGINT) AS rk, vec_id, cos_sim
    FROM r WHERE rk <= {_FILTERED_TOPK}
    """


@register(
    "sim_topk_filtered",
    oracle=_filtered_sql(),
    tags=("similarity", "north_star", "ml"),
)
def sim_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label top-k cosine neighbors of the corpus's first vector.

    Shapes: the 1-row query broadcasts; scoring is scan-side (the
    label predicate — here the partition itself — prunes BEFORE
    distance math, the filtered-ANN contract); the per-label top-k is
    one rank window over the scored frame. At 100 TB with a selective
    label filter this is a fraction-of-scan scorer + a tiny window —
    the production argument for storing label as a partition column.
    Determinism: cosine is the sequential-fold dot (bit-exact), rank
    ties break on vec_id."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", vec_double(F.col("embedding")).alias("v")
    )
    q = (
        e.orderBy("vec_id")
        .limit(1)
        .select(F.col("v").alias("qv"), F.col("vec_id").alias("qid"))
    )
    s = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("vec_id", "label", cosine(F.col("v"), F.col("qv")).alias("cos_sim"))
    )
    from pyspark.sql.window import Window as W

    r = s.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("label").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        ),
    )
    return r.filter(F.col("rk") <= _FILTERED_TOPK).select(
        "label", F.col("rk").cast("bigint").alias("rk"), "vec_id", "cos_sim"
    )


# --- dq_referential ---------------------------------------------------------
#
# Referential-integrity report: orphan counts for every FK edge of the
# star schema in ONE frame — the readme QA items the reference checks
# by hand (readme.md:140-145: orphaned estabelecimentos/CNAEs), done
# engine-side as anti-join counts. Completes the DQ family
# (dq_check/dq_drift/dq_outlier_iqr) with the classic RI audit.


_RI_SQL = """
    SELECT 'orders->customer' AS fk_edge,
           CAST(count(*) AS BIGINT) AS n_child,
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_orphans
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem->orders',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN oo.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN orders oo ON l.l_orderkey = oo.o_orderkey
    UNION ALL
    SELECT 'lineitem->part',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    UNION ALL
    SELECT 'supplier->nation',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """


@register("dq_referential", oracle=_RI_SQL, tags=("dq",))
def dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan counts per FK edge (child rows with no parent).

    Shapes: each edge is a left join AGGREGATED TO TWO NUMBERS —
    Catalyst keeps the parent side broadcast where small (customer/
    part/nation); the lineitem→orders edge is the one genuine big-big
    join and shares the bucketed-layout answer join_bucketed proves.
    The four edges union into one 4-row report frame."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = table(spark, sf_dir, "part").select("p_partkey")
    su = table(spark, sf_dir, "supplier").select("s_nationkey")
    na = table(spark, sf_dir, "nation").select("n_nationkey")

    def edge(name, child, parent, ck, pk):
        j = child.join(parent, child[ck] == parent[pk], "left")
        return j.agg(
            F.lit(name).alias("fk_edge"),
            F.count(F.lit(1)).cast("bigint").alias("n_child"),
            F.sum(F.when(parent[pk].isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_orphans"),
        ).select("fk_edge", "n_child", "n_orphans")

    return (
        edge("orders->customer", o, c, "o_custkey", "c_custkey")
        .unionAll(edge("lineitem->orders", li, o.select("o_orderkey"), "l_orderkey", "o_orderkey"))
        .unionAll(edge("lineitem->part", li, p, "l_partkey", "p_partkey"))
        .unionAll(edge("supplier->nation", su, na, "s_nationkey", "n_nationkey"))
    )


# --- corpus_source_mix ------------------------------------------------------
#
# Corpus composition report: docs, chars and share by (source, lang) —
# the mixture dashboard a curation run publishes next to its output
# (what sample_weighted_mix/sample_temperature_mix consume as input
# rates). All-integer (counts + ppm shares).


_SOURCE_MIX_SQL = """
    WITH g AS (
      SELECT source, lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY 1, 2)
    SELECT source, lang, n_docs, n_chars,
           CAST(n_docs * 1000000
                // (SELECT CAST(sum(n_docs) AS BIGINT) FROM g) AS BIGINT)
             AS doc_share_ppm,
           CAST(n_chars * 1000000
                // (SELECT CAST(sum(n_chars) AS BIGINT) FROM g) AS BIGINT)
             AS char_share_ppm
    FROM g
    """


@register("corpus_source_mix", oracle=_SOURCE_MIX_SQL, tags=("corpus", "north_star"))
def corpus_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs/chars composition by (source, lang) with ppm shares.

    Shapes: one map-side-combinable aggregate to |sources|·|langs|
    rows; the grand totals are window sums over that tiny frame.
    At 100 TB this is the one-exchange composition report."""
    from pyspark.sql.window import Window as W

    d = table(spark, sf_dir, "documents")
    g = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )
    w = W.partitionBy()
    return (
        g.withColumn("_td", F.sum("n_docs").over(w))
        .withColumn("_tc", F.sum("n_chars").over(w))
        .select(
            "source", "lang", "n_docs", "n_chars",
            F.expr("n_docs * 1000000 DIV _td").cast("bigint").alias("doc_share_ppm"),
            F.expr("n_chars * 1000000 DIV _tc").cast("bigint").alias("char_share_ppm"),
        )
    )


# --- events_dau_mau ---------------------------------------------------------
#
# DAU/MAU stickiness: per day, distinct active users that day (DAU)
# and over the trailing 30 days (MAU), ratio in ppm — the engagement
# metric product teams watch daily. Exact distinct-over-range has no
# SQL window form; both engines compute it as day-grid × daily-user
# join (the honest exact shape). All-integer output.


_DAU_SQL = """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM du),
    mau AS (
      SELECT g.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS mau
      FROM days g JOIN du u
        ON u.day BETWEEN g.day - INTERVAL 29 DAY AND g.day
      GROUP BY g.day),
    dau AS (
      SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY day)
    SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, m.mau,
           CAST(d.dau * 1000000 // m.mau AS BIGINT) AS stickiness_ppm
    FROM dau d JOIN mau m ON d.day = m.day
    """


@register("events_dau_mau", oracle=_DAU_SQL, tags=("events", "analytics"))
def events_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day DAU, trailing-30d MAU, and stickiness (ppm).

    Shapes: the scan collapses to distinct (day, user) once; the day
    grid (|days| rows) BROADCASTS onto that frame with a 30-day range
    condition; one count-distinct per day closes it. Honest about
    scale: exact trailing distinct is inherently a re-count (users
    deduplicate across the window — sums of daily DAU overcount);
    the 100 TB swap is per-day HLL sketches merged over the window
    (agg_hll_sketch's machinery), trading exactness for one pass —
    documented here, kept exact because the oracle is exact."""
    ev = table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    du = du.localCheckpoint()
    days = du.select("day").distinct().select(F.col("day").alias("g"))
    mau = (
        du.join(
            F.broadcast(days),
            (F.col("day") <= F.col("g"))
            & (F.col("day") >= F.date_sub(F.col("g"), 29)),
        )
        .groupBy("g")
        .agg(F.countDistinct("user_id").cast("bigint").alias("mau"))
    )
    dau = du.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    j = dau.join(mau, dau["day"] == mau["g"]).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "dau", "mau"
    )
    return j.select(
        "day", "dau", "mau",
        F.expr("dau * 1000000 DIV mau").cast("bigint").alias("stickiness_ppm"),
    )


# --- events_new_vs_returning ------------------------------------------------
#
# Per-day split of active users into first-ever-seen (new) vs
# returning — the acquisition/retention decomposition next to
# events_dau_mau's aggregate. Pure integer arithmetic on the same
# distinct (day, user) frame.


_NVR_SQL = """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    f AS (SELECT user_id, min(day) AS first_day FROM du GROUP BY user_id)
    SELECT strftime(du.day, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS dau,
           CAST(sum(CASE WHEN du.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS new_users,
           CAST(sum(CASE WHEN du.day > f.first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS returning_users
    FROM du JOIN f ON du.user_id = f.user_id
    GROUP BY du.day
    """


@register("events_new_vs_returning", oracle=_NVR_SQL, tags=("events", "analytics"))
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day new vs returning active users.

    Shapes: distinct (day, user) once, a per-user min-day aggregate
    (user-sized, rejoined on user_id — same exchange key, AQE
    coalesces), one per-day count. At 100 TB the first-day frame is
    the user dimension and broadcasts."""
    ev = table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    f = du.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = du.join(f, "user_id")
    return (
        j.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("dau"),
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("new_users"),
            F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("returning_users"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau", "new_users", "returning_users",
        )
    )


# --- agg_percent_change_wow -------------------------------------------------
#
# Week-over-week change per event type: weekly counts joined to the
# previous week (consecutive-week self-join — the agg_autocorr
# discipline; lag() would silently pair across gaps), change in ppm by
# integer arithmetic. The trend line behind every metrics dashboard.


_WOW_SQL = """
    WITH w AS (
      SELECT event_type,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2)
    SELECT a.event_type, CAST(a.wk AS BIGINT) AS wk,
           a.n AS n_cur, b.n AS n_prev,
           CAST((a.n - b.n) * 1000000 // b.n AS BIGINT) AS change_ppm
    FROM w a JOIN w b
      ON a.event_type = b.event_type AND b.wk = a.wk - 1
    """


@register("agg_percent_change_wow", oracle=_WOW_SQL, tags=("events", "analytics"))
def agg_percent_change_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week count change (ppm) per event type.

    Shapes: one weekly-count aggregate (map-side combined), then the
    consecutive-week pairing runs on the |types|·|weeks| frame. Weeks
    are epoch-day integer buckets (origin-convention-proof)."""
    ev = table(spark, sf_dir, "events")
    w = (
        ev.select(
            "event_type",
            F.expr(
                "datediff(to_date(ts), date '1970-01-01') DIV 7"
            ).alias("wk"),
        )
        .groupBy("event_type", "wk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    a = w.select("event_type", F.col("wk").alias("wka"), F.col("n").alias("n_cur"))
    b = w.select(
        "event_type", (F.col("wk") + 1).alias("wka"), F.col("n").alias("n_prev")
    )
    return a.join(b, ["event_type", "wka"]).select(
        "event_type",
        F.col("wka").cast("bigint").alias("wk"),
        "n_cur",
        "n_prev",
        F.expr("(n_cur - n_prev) * 1000000 DIV n_prev").cast("bigint").alias(
            "change_ppm"
        ),
    )


# --- udaf_geomean -----------------------------------------------------------
#
# Custom aggregate via a GROUPED_AGG pandas UDAF — the missing face of
# the UDF surface (scalar pandas_udf: udf_cnpj_format; grouped map:
# udf_grouped_map; UDTF: udtf_bigrams; now the Arrow-batched custom
# AGGREGATE). Semantics: per-status geometric mean of order totals.
# Determinism across engines AND partitions: each value contributes
# floor(ln(x)·1e6 + 0.5) as an INTEGER (math.log = C libm, the same
# libm DuckDB's ln() binds on this box — and the micro-quantization
# absorbs any ulp split); the UDAF returns the bigint SUM of those
# integers, so partial-aggregation order cannot matter, and the final
# geomean derives by integer division outside the UDAF.


_GEOMEAN_SQL = """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(ln(o_totalprice) * 1000000 + 0.5) AS BIGINT))
                AS BIGINT) AS log_micro_sum,
           CAST(sum(CAST(floor(ln(o_totalprice) * 1000000 + 0.5) AS BIGINT))
                // count(*) AS BIGINT) AS geomean_log_micro
    FROM orders WHERE o_totalprice > 0
    GROUP BY o_orderstatus
    """


@register("udaf_geomean", oracle=_GEOMEAN_SQL, tags=("udf", "agg"))
def udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF: integer-quantized log-sum per group.

    The UDAF body receives each group's values as one Arrow batch and
    returns ONE bigint — Catalyst runs it as a real aggregate
    (partial/merge handled by Spark's ObjectHashAggregate for pandas
    UDAFs). Per-value work is math.log + floor — the C-libm twin of
    the oracle's ln(); the 1e-6 quantization is the repo's standard
    libm posture. Shapes: one hash(status) exchange of Arrow batches;
    at 100 TB a plain built-in ln()+sum is the faster form (documented
    — this key exists to prove the custom-UDAF seam, not to beat
    codegen)."""
    import math

    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit GROUPED_AGG functionType: the type-hint route only accepts
    # float-returning Series->scalar signatures in pyspark 4.1
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def log_micro_sum(v: pd.Series):
        return int(sum(math.floor(math.log(x) * 1000000 + 0.5) for x in v))

    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    # a grouped-agg pandas UDF cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — run it alone and join the count
    # back on the group key (both aggregates share the same exchange;
    # the joined frames are |groups|-sized)
    s = o.groupBy("o_orderstatus").agg(
        log_micro_sum(F.col("o_totalprice")).alias("log_micro_sum")
    )
    n = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return s.join(n, "o_orderstatus").select(
        "o_orderstatus", "n", "log_micro_sum",
        F.expr("log_micro_sum DIV n").cast("bigint").alias("geomean_log_micro"),
    )


# --- agg_audience_overlap ---------------------------------------------------
#
# Audience overlap: for each ordered pair of event types, the distinct
# users doing A, doing B, doing BOTH, and the Jaccard overlap in ppm —
# the segmentation/lookalike primitive. Exact via distinct user sets;
# the 100 TB swap is theta/HLL sketch intersection (agg_hll_sketch's
# family), traded here for exactness because the oracle is exact.


_AUDIENCE_SQL = """
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
          FROM du GROUP BY 1),
    b AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM du a JOIN du b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT b.type_a, b.type_b, na.n_users AS n_a, nb.n_users AS n_b, b.n_both,
           CAST(b.n_both * 1000000
                // (na.n_users + nb.n_users - b.n_both) AS BIGINT)
             AS jaccard_ppm
    FROM b JOIN n na ON b.type_a = na.event_type
           JOIN n nb ON b.type_b = nb.event_type
    """


@register("agg_audience_overlap", oracle=_AUDIENCE_SQL, tags=("agg", "analytics"))
def agg_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience intersection + Jaccard (ppm) across event
    types.

    Shapes: distinct (type, user) once — ONE hash(user) exchange;
    the pair intersection is a self-join on user_id over that frame
    (each user contributes |types-they-did|² pairs, bounded by the
    type alphabet, NOT by event volume); per-type sizes broadcast
    onto the tiny pair frame. All-integer output."""
    ev = table(spark, sf_dir, "events")
    du = ev.select("event_type", "user_id").distinct().localCheckpoint()
    n = du.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    a = du.select(F.col("event_type").alias("type_a"), "user_id")
    b = du.select(F.col("event_type").alias("type_b"), "user_id")
    both = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    na = n.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a"))
    nb = n.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b"))
    return (
        both.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a", "type_b", "n_a", "n_b", "n_both",
            F.expr("n_both * 1000000 DIV (n_a + n_b - n_both)")
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
    )


# --- corpus_shard_assignment ------------------------------------------------
#
# Output shard planning: assign every document to one of {S} shards by
# portable content-independent key hash and report per-shard load
# (docs, chars) with skew vs the ideal share — the write-layout
# decision a 100 TB corpus publish makes BEFORE the shuffle (shard =
# repartition key = output file group). Balance is the whole point:
# the report IS the evidence the hash spreads load.

_SHARDS = 32


_SHARD_SQL = f"""
    WITH s AS (
      SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % {_SHARDS} AS shard,
             n_chars
      FROM documents),
    g AS (
      SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars
      FROM s GROUP BY 1)
    SELECT CAST(shard AS BIGINT) AS shard, n_docs, n_chars,
           CAST(n_chars * {_SHARDS} * 1000000
                // (SELECT CAST(sum(n_chars) AS BIGINT) FROM g) AS BIGINT)
             AS load_vs_ideal_ppm
    FROM g
    """


@register("corpus_shard_assignment", oracle=_SHARD_SQL, tags=("corpus", "layout"))
def corpus_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard assignment by md5-of-key + per-shard load report
    (load_vs_ideal_ppm = 1e6 means perfectly balanced).

    The hash is content-independent (doc_id, not text) so shard
    placement survives document edits — the stable-layout property
    incremental publishes need. Shapes: one {S}-group aggregate with
    map-side combine; the grand total is a window over the {S}-row
    frame. At 100 TB the real write is .repartition(shard).write —
    this plan is its dry-run report."""
    from pyspark.sql.window import Window as W

    d = table(spark, sf_dir, "documents").select(
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % _SHARDS
        ).alias("shard"),
        "n_chars",
    )
    g = d.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )
    return (
        g.withColumn("_t", F.sum("n_chars").over(W.partitionBy()))
        .select(
            F.col("shard").cast("bigint").alias("shard"),
            "n_docs",
            "n_chars",
            F.expr(f"n_chars * {_SHARDS} * 1000000 DIV _t")
            .cast("bigint")
            .alias("load_vs_ideal_ppm"),
        )
    )


# --- agg_view_maintenance ---------------------------------------------------
#
# Incremental view maintenance (IVM): a per-status (count, revenue)
# aggregate VIEW is maintained under the cdc_apply CDC feed by DELTA
# ALGEBRA — subtract each touched row's old contribution, add its new
# one — never recomputing from the base table. The oracle recomputes
# the aggregate over the APPLIED table, so equality proves the delta
# algebra: new_view = old_view − old(touch) + new(touch), with deletes
# contributing only a subtraction. Decimal accumulation makes the
# subtraction EXACT (the reason float IVM is untrustworthy and
# decimal IVM is not).


_IVM_SQL = """
    WITH feed AS (
      SELECT o_orderkey AS key, 1 AS version,
             CASE WHEN o_orderkey % 100 = 0 THEN 'D' ELSE 'U' END AS op,
             'v1-' || lower(o_orderstatus) AS new_status
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, 2, 'U', 'v2-' || lower(o_orderstatus)
      FROM orders WHERE o_orderkey % 20 = 0 AND o_orderkey % 100 <> 0),
    latest AS (
      SELECT key, op, new_status FROM (
        SELECT *, row_number() OVER (PARTITION BY key ORDER BY version DESC) AS rn
        FROM feed) WHERE rn = 1),
    applied AS (
      SELECT COALESCE(l.new_status, b.o_orderstatus) AS status,
             b.o_totalprice
      FROM orders b LEFT JOIN latest l ON b.o_orderkey = l.key
      WHERE l.op IS NULL OR l.op <> 'D')
    SELECT status,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM applied GROUP BY status
    """


@register("agg_view_maintenance", oracle=_IVM_SQL, tags=("cdc", "agg", "ivm"))
def agg_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-maintained per-status aggregate under the CDC feed.

    The maintained view is computed INCREMENTALLY: (1) the old view
    aggregates the base once; (2) the touched-row frame (base ⨝
    collapsed feed — feed-sized, broadcast) yields two delta
    aggregates: −(old status contributions) and +(new status
    contributions, deletes excluded); (3) the three frames —
    all |status|-sized — merge by key and statuses whose count hits
    zero drop out. The base table is scanned exactly ONCE for the
    view and once for the touch join (both scans prune to 3 columns);
    nothing rescans per change. The oracle RECOMPUTES over the
    applied table, so the equality is the IVM correctness proof.
    Decimal accumulation makes subtraction exact — a double-sum view
    could not be maintained this way."""
    from pyspark.sql.window import Window as W

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    f1 = o.filter(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("key"),
        F.lit(1).alias("version"),
        F.when(F.col("o_orderkey") % 100 == 0, "D").otherwise("U").alias("op"),
        F.concat(F.lit("v1-"), F.lower("o_orderstatus")).alias("new_status"),
    )
    f2 = o.filter(
        (F.col("o_orderkey") % 20 == 0) & (F.col("o_orderkey") % 100 != 0)
    ).select(
        F.col("o_orderkey").alias("key"),
        F.lit(2).alias("version"),
        F.lit("U").alias("op"),
        F.concat(F.lit("v2-"), F.lower("o_orderstatus")).alias("new_status"),
    )
    w = W.partitionBy("key").orderBy(F.desc("version"))
    latest = (
        f1.unionAll(f2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", "op", "new_status")
    )
    dec = "decimal(27,6)"
    old_view = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("o_totalprice").cast(dec)).alias("rev"),
    )
    touched = o.join(F.broadcast(latest), o.o_orderkey == latest.key)
    minus = touched.groupBy(F.col("o_orderstatus").alias("status")).agg(
        (-F.count(F.lit(1))).cast("bigint").alias("n"),
        (-F.sum(F.col("o_totalprice").cast(dec))).alias("rev"),
    )
    plus = (
        touched.filter(F.col("op") != "D")
        .groupBy(F.col("new_status").alias("status"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("o_totalprice").cast(dec)).alias("rev"),
        )
    )
    merged = (
        old_view.unionAll(minus)
        .unionAll(plus)
        .groupBy("status")
        .agg(F.sum("n").cast("bigint").alias("n_orders"), F.sum("rev").alias("revd"))
        .filter(F.col("n_orders") > 0)
    )
    return merged.select(
        "status", "n_orders", F.col("revd").cast("double").alias("revenue")
    )


# --- text_keywords ----------------------------------------------------------
#
# Per-document keyword extraction: top-3 tokens by tf·idf — the
# user-facing face of text_tfidf's corpus statistics (that key emits
# the weighted postings; this one ranks and cuts them per doc). All
# integer: idf micro-quantized once per vocab term, score = tf ×
# idf_micro in bigint, rank window with total-order tiebreak.

_KEYWORDS_TOPK = 3


_KEYWORDS_SQL = f"""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents WHERE length(trim(text)) > 0),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d),
    tf AS (
      SELECT doc_id, unnest(toks) AS tok FROM d),
    tfc AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      FROM tf GROUP BY 1, 2),
    df AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tfc GROUP BY 1),
    sc AS (
      SELECT tfc.doc_id, tfc.tok,
             tfc.tf * CAST(floor(ln(CAST(n.n_docs AS DOUBLE) / df.df)
                                 * 1000000 + 0.5) AS BIGINT) AS score_micro
      FROM tfc JOIN df ON tfc.tok = df.tok CROSS JOIN n),
    r AS (
      SELECT doc_id, tok, score_micro,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_micro DESC, tok) AS rk
      FROM sc)
    SELECT doc_id, CAST(rk AS BIGINT) AS rk, tok, score_micro
    FROM r WHERE rk <= {_KEYWORDS_TOPK}
    """


@register("text_keywords", oracle=_KEYWORDS_SQL, tags=("text", "north_star"))
def text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} tf·idf keywords per document.

    Shapes: tf aggregate on hash(doc, token); df aggregate ON THE TF
    FRAME (vocab exchange, not corpus); idf joins back vocab-sized
    (broadcast); the per-doc cut is one rank window. The idf is
    quantized to integer micro-units BEFORE the tf multiply, so the
    ranking key is bigint — no float ordering anywhere. The corpus
    size folds into the job as a broadcast 1-row frame (the
    text_tfidf pattern) — NOT a driver-side count(), which at 100 TB
    is a second full pass over the corpus plus a driver sync before
    the real job starts. At 100 TB this is text_tfidf's envelope
    plus a window on the doc-sized scored frame."""
    from pyspark.sql.window import Window as W

    from etl_cnpjs_spark.functions.text import tokens

    d = (
        table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", tokens(F.col("text")).alias("toks"))
    )
    n_docs = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    tfc = (
        d.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = (
        tfc.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .crossJoin(F.broadcast(n_docs))
    )
    idf = F.floor(
        F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")) * 1000000
        + 0.5
    ).cast("bigint")
    sc = tfc.join(F.broadcast(df.select("tok", idf.alias("idf_micro"))), "tok").select(
        "doc_id", "tok", (F.col("tf") * F.col("idf_micro")).alias("score_micro")
    )
    r = sc.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("doc_id").orderBy(F.desc("score_micro"), F.asc("tok"))
        ),
    )
    return r.filter(F.col("rk") <= _KEYWORDS_TOPK).select(
        "doc_id", F.col("rk").cast("bigint").alias("rk"), "tok", "score_micro"
    )


# --- events_bot_flags -------------------------------------------------------
#
# Bot/automation screen per user — the traffic-quality gate a
# pretraining-data or product-metrics pipeline runs before trusting
# event streams: burst rate (max events in any minute) and
# inter-event gap profile (min + exact-median microsecond gap), with
# a deterministic flag rule. All-integer (µs gaps, percentile_disc
# picked element).

_BOT_BURST = 30           # events in one minute
_BOT_MEDIAN_GAP_US = 2_000_000


_BOT_SQL = f"""
    WITH e AS (
      SELECT user_id, ts, epoch_us(ts) AS us,
             epoch_us(ts) // 60000000 AS minute
      FROM events),
    bursts AS (
      SELECT user_id, CAST(max(c) AS BIGINT) AS max_per_min
      FROM (SELECT user_id, minute, count(*) AS c FROM e GROUP BY 1, 2)
      GROUP BY 1),
    gaps AS (
      SELECT user_id, us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
               AS gap_us
      FROM e),
    gstat AS (
      SELECT user_id,
             CAST(count(gap_us) AS BIGINT) AS n_gaps,
             CAST(min(gap_us) AS BIGINT) AS min_gap_us,
             CAST(quantile_disc(gap_us, 0.5) AS BIGINT) AS median_gap_us
      FROM gaps WHERE gap_us IS NOT NULL GROUP BY 1)
    SELECT b.user_id, b.max_per_min, g.n_gaps, g.min_gap_us, g.median_gap_us,
           (b.max_per_min >= {_BOT_BURST}
            OR g.median_gap_us < {_BOT_MEDIAN_GAP_US}) AS bot_flag
    FROM bursts b JOIN gstat g ON b.user_id = g.user_id
    """


@register("events_bot_flags", oracle=_BOT_SQL, tags=("events", "dq", "north_star"))
def events_bot_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user bot screen: burst rate + gap profile + flag.

    Shapes: one hash(user, minute) burst aggregate rolled up to
    per-user, one hash(user) window for the lag gaps (same exchange
    key — AQE reuses the partitioning), exact median as a
    percentile_disc picked element over integer µs. The flag rule is
    pure integer comparisons — engine-identical. At 100 TB both
    aggregates partial-combine; nothing exceeds user-grain."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.expr("unix_micros(ts) DIV 60000000").alias("minute"),
    )
    bursts = (
        e.groupBy("user_id", "minute")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("user_id")
        .agg(F.max("c").cast("bigint").alias("max_per_min"))
    )
    gaps = e.select(
        "user_id",
        (
            F.col("us")
            - F.lag("us").over(W.partitionBy("user_id").orderBy("us"))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    gstat = gaps.groupBy("user_id").agg(
        F.count("gap_us").cast("bigint").alias("n_gaps"),
        F.min("gap_us").cast("bigint").alias("min_gap_us"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us)")
        .cast("bigint")
        .alias("median_gap_us"),
    )
    j = bursts.join(gstat, "user_id")
    return j.select(
        "user_id", "max_per_min", "n_gaps", "min_gap_us", "median_gap_us",
        (
            (F.col("max_per_min") >= _BOT_BURST)
            | (F.col("median_gap_us") < _BOT_MEDIAN_GAP_US)
        ).alias("bot_flag"),
    )


# --- text_contamination_score -----------------------------------------------
#
# Graded benchmark-overlap score: text_decontaminate flags ANY shared
# 3-gram (boolean); this scores the overlap — matched shingles over
# total shingles in ppm per training doc — the signal a curation
# pipeline thresholds instead of hard-dropping. Benchmark stand-in:
# doc_id % 13 == 0 (the decontaminate convention).


def _contam_sql() -> str:
    from etl_cnpjs_spark.plans.dedup import _SQL_SHINGLES

    return (
        _SQL_SHINGLES
        + """
      , bench AS (
        SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 13 = 0),
      train AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh
        WHERE doc_id % 13 <> 0 AND len(shingles) > 0),
      m AS (
        SELECT t.doc_id,
               CAST(count(*) AS BIGINT) AS n_shingles,
               CAST(sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_matched
        FROM train t LEFT JOIN bench b ON t.s = b.s
        GROUP BY 1)
      SELECT doc_id, n_shingles, n_matched,
             CAST(n_matched * 1000000 // n_shingles AS BIGINT)
               AS contamination_ppm
      FROM m
    """
    )


@register(
    "text_contamination_score",
    oracle=_contam_sql(),
    tags=("text", "north_star", "dq"),
)
def text_contamination_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination score per training doc (matched /
    total 3-gram shingles, ppm).

    Shapes: shares the memoized shingle frame with the whole dedup
    family (one tokenize+shingle pass per session); the benchmark
    shingle set is eval-suite-sized and BROADCASTS, so the training
    corpus is scored scan-side — the decontaminate envelope with a
    count instead of a flag. Integer ppm output."""
    from etl_cnpjs_spark.plans.dedup import _doc_shingles

    sh = _doc_shingles(spark, sf_dir)
    bench = (
        sh.filter(F.col("doc_id") % 13 == 0)
        .select(F.explode("sh").alias("s"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    train = sh.filter(F.col("doc_id") % 13 != 0).select(
        "doc_id", F.explode("sh").alias("s")
    )
    m = (
        train.join(F.broadcast(bench), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("bigint").alias(
                "n_matched"
            ),
        )
    )
    return m.select(
        "doc_id", "n_shingles", "n_matched",
        F.expr("n_matched * 1000000 DIV n_shingles").cast("bigint").alias(
            "contamination_ppm"
        ),
    )


# --- events_funnel_24h ------------------------------------------------------
#
# Time-bounded funnel: signup → purchase WITHIN 24 hours, per
# weekly signup cohort — the conversion-rate-with-deadline metric
# (events_funnel counts WHO converts ever; events_conversion_lag
# measures HOW FAST; this one imposes the deadline). All-integer:
# exact µs comparison, ppm conversion by integer DIV.

_FUNNEL_WINDOW_US = 86_400_000_000


_FUNNEL24_SQL = f"""
    WITH s AS (
      SELECT user_id, min(epoch_us(ts)) AS signup_us
      FROM events WHERE event_type = 'signup' GROUP BY 1),
    conv AS (
      SELECT s.user_id,
             max(CASE WHEN e.event_type = 'purchase'
                       AND epoch_us(e.ts) >= s.signup_us
                       AND epoch_us(e.ts) < s.signup_us + {_FUNNEL_WINDOW_US}
                      THEN 1 ELSE 0 END) AS converted
      FROM s JOIN events e ON e.user_id = s.user_id
      GROUP BY s.user_id),
    c AS (
      SELECT s.user_id,
             signup_us // (7 * 86400000000) AS signup_week,
             conv.converted
      FROM s JOIN conv ON s.user_id = conv.user_id)
    SELECT CAST(signup_week AS BIGINT) AS signup_week,
           CAST(count(*) AS BIGINT) AS n_signups,
           CAST(sum(converted) AS BIGINT) AS n_converted_24h,
           CAST(sum(converted) * 1000000 // count(*) AS BIGINT)
             AS conversion_ppm
    FROM c GROUP BY 1
    """


@register("events_funnel_24h", oracle=_FUNNEL24_SQL, tags=("events", "funnel"))
def events_funnel_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deadline funnel: first signup → any purchase within 24h, rolled
    up by signup week.

    Shapes: per-user first-signup aggregate (user-grain), rejoined to
    the event stream on the SAME hash(user) key for the deadline
    check (AQE reuses the partitioning), then a |weeks|-row rollup.
    The deadline is an exact integer µs window — no timestamp
    arithmetic in floats anywhere. At 100 TB the signup frame is the
    user dimension and broadcasts."""
    ev = table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("signup_us"))
    )
    conv = (
        ev.join(s, "user_id")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.unix_micros("ts") >= F.col("signup_us"))
                    & (
                        F.unix_micros("ts")
                        < F.col("signup_us") + _FUNNEL_WINDOW_US
                    ),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
    )
    c = s.join(conv, "user_id").select(
        F.expr("signup_us DIV (7 * 86400000000)").alias("signup_week"),
        "converted",
    )
    g = c.groupBy("signup_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_signups"),
        F.sum("converted").cast("bigint").alias("n_converted_24h"),
    )
    return g.select(
        F.col("signup_week").cast("bigint").alias("signup_week"),
        "n_signups",
        "n_converted_24h",
        F.expr("n_converted_24h * 1000000 DIV n_signups").cast("bigint").alias(
            "conversion_ppm"
        ),
    )


# --- graph_bipartite_project ------------------------------------------------
#
# Bipartite projection: part↔supplier edges projected onto
# supplier↔supplier links weighted by shared parts — the
# co-membership graph (co-purchase/co-authorship shape) that feeds
# recommendation and community detection. Top edges by weight with a
# total-order cut.

_BIPROJ_TOPK = 50


_BIPROJ_SQL = f"""
    WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
    pr AS (
      SELECT a.s AS s1, b.s AS s2, CAST(count(*) AS BIGINT) AS shared_parts
      FROM e a JOIN e b ON a.p = b.p AND a.s < b.s
      GROUP BY 1, 2),
    r AS (
      SELECT s1, s2, shared_parts,
             row_number() OVER (ORDER BY shared_parts DESC, s1, s2) AS rk
      FROM pr)
    SELECT CAST(rk AS BIGINT) AS rk, s1, s2, shared_parts
    FROM r WHERE rk <= {_BIPROJ_TOPK}
    """


@register("graph_bipartite_project", oracle=_BIPROJ_SQL, tags=("graph",))
def graph_bipartite_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier co-membership projection (top-{K} by shared parts).

    Shapes: distinct bipartite edges once, then the projection is a
    self-join ON THE PART KEY — each part contributes
    |suppliers-of-part|² pairs, bounded by TPC-H's ~4 suppliers per
    part, so the pair frame is ~16× edges, never |suppliers|². The
    weight aggregate partial-combines; the global top-K is a
    TakeOrdered heap with (weight, s1, s2) total order. At 100 TB
    the hot-part cap (skip parts with > t suppliers, the posting-cap
    discipline of dedup_stopshingle) bounds the quadratic term —
    documented, not needed at TPC-H fan-out."""
    li = table(spark, sf_dir, "lineitem")
    e = li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")).distinct()
    a = e.select("p", F.col("s").alias("s1"))
    b = e.select("p", F.col("s").alias("s2"))
    pr = (
        a.join(b, "p")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_parts"))
    )
    r = pr.orderBy(F.desc("shared_parts"), F.asc("s1"), F.asc("s2")).limit(
        _BIPROJ_TOPK
    )
    from pyspark.sql.window import Window as W

    return r.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy().orderBy(F.desc("shared_parts"), F.asc("s1"), F.asc("s2"))
        ),
    ).select(F.col("rk").cast("bigint").alias("rk"), "s1", "s2", "shared_parts")


# --- agg_engagement_minutes -------------------------------------------------
#
# Session-time engagement rollup: total sessionized minutes and
# session counts per user (top users by engaged time) — the product
# metric the sessionize operator exists to feed. Durations are exact
# integer µs sums over the session frame.


_ENGAGE_TOPK = 100


_ENGAGE_SQL = f"""
    WITH o AS (
      SELECT user_id, epoch_us(ts) AS us,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    f AS (
      SELECT user_id, us,
             CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY rn)
                    > 21600000000
                  OR lag(us) OVER (PARTITION BY user_id ORDER BY rn) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM o),
    sess AS (
      SELECT user_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                              ROWS UNBOUNDED PRECEDING) AS session_seq,
             us
      FROM f),
    agg AS (
      SELECT user_id, session_seq,
             max(us) - min(us) AS dur_us
      FROM sess GROUP BY 1, 2),
    per_user AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(sum(dur_us) AS BIGINT) AS engaged_us,
             CAST(sum(dur_us) // 60000000 AS BIGINT) AS engaged_minutes
      FROM agg GROUP BY 1),
    rk AS (
      SELECT *, row_number() OVER (ORDER BY engaged_us DESC, user_id) AS r
      FROM per_user)
    SELECT CAST(r AS BIGINT) AS rk, user_id, n_sessions, engaged_us,
           engaged_minutes
    FROM rk WHERE r <= {_ENGAGE_TOPK}
    """


@register("agg_engagement_minutes", oracle=_ENGAGE_SQL, tags=("events", "analytics"))
def agg_engagement_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} users by total sessionized engagement time.

    Composes the sessionize operator (gap rule, total-order
    tiebreak) with a per-user rollup: session durations are exact µs
    integers, summed per user, global top-K by (engaged_us, user_id)
    total order. Shapes: sessionize's single hash(user) exchange
    feeds both the session frame and the rollup; the top-K is a
    TakeOrdered heap."""
    from pyspark.sql.window import Window as W

    from etl_cnpjs_spark.operators.relational import sessionize

    ev = table(spark, sf_dir, "events")
    sess = sessionize(ev, "user_id", "ts", "event_id", 21_600_000_000)
    per_user = sess.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("duration_us").cast("bigint").alias("engaged_us"),
    )
    r = per_user.orderBy(F.desc("engaged_us"), F.asc("user_id")).limit(_ENGAGE_TOPK)
    return (
        r.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy().orderBy(F.desc("engaged_us"), F.asc("user_id"))
            ),
        )
        .select(
            F.col("rk").cast("bigint").alias("rk"),
            "user_id",
            "n_sessions",
            "engaged_us",
            F.expr("engaged_us DIV 60000000").cast("bigint").alias(
                "engaged_minutes"
            ),
        )
    )


# --- scan_delete_vectors ----------------------------------------------------
#
# Deletion-vector read semantics: the base table stays immutable; a
# small side file of deleted keys is applied AT READ TIME as an anti
# join — the lakehouse "merge-on-read" delete shape (Delta deletion
# vectors / Iceberg positional deletes), done by key. The base is
# never rewritten; the delete set broadcasts.


_DELVEC_SQL = """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % 7 <> 0
    """


@register("scan_delete_vectors", oracle=_DELVEC_SQL, tags=("scan", "cdc"))
def scan_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read deletes: base parquet + a staged delete-key file,
    applied as a broadcast anti join at read time.

    The delete vector is WRITTEN to parquet first (a real side file,
    as a lakehouse would stage it) and read back for the mask — not
    an in-plan filter pretending to be one. Shapes: the base scan is
    untouched (no rewrite, full pushdown still applies); the delete
    set is deletes-sized and broadcasts; the anti join is scan-side.
    At 100 TB this is the read path until compaction folds the
    vectors in (sink_compact's job)."""
    import os
    import tempfile

    o = table(spark, sf_dir, "orders")
    dv_dir = os.path.join(tempfile.mkdtemp(prefix="delvec_"), "deletes.parquet")
    o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("del_key")
    ).write.mode("overwrite").parquet(dv_dir)
    dv = spark.read.parquet(dv_dir)
    return o.join(
        F.broadcast(dv), o.o_orderkey == dv.del_key, "left_anti"
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")


# --- sink_manifest ----------------------------------------------------------
#
# Manifest-commit protocol: data files land under a staging name, a
# MANIFEST file listing exactly the committed files is written LAST
# (atomic os.replace), and readers resolve the manifest — never the
# directory listing. The multi-file commit shape every table format
# builds on (and the reason half-written jobs are invisible to
# readers). Round-trips a keyed slice through it.


_MANIFEST_SQL = """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % 83 = 0
    """


@register("sink_manifest", oracle=_MANIFEST_SQL, tags=("sink",))
def sink_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write slice → per-partition parquet files → manifest written
    last via atomic replace → read back ONLY the manifest's files.

    An extra decoy file is dropped into the directory after the
    commit and before the read: the read must NOT see it (manifest
    resolution, not directory listing) — the property that makes
    concurrent writers and failed jobs invisible. Scale story: the
    manifest is file-count-sized; readers fan out over its entries;
    commit cost is one rename regardless of data volume."""
    import glob
    import json
    import os
    import tempfile

    base = tempfile.mkdtemp(prefix="manifest_sink_")
    data_dir = os.path.join(base, "data")
    sl = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 83 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    sl.write.mode("overwrite").parquet(data_dir)
    files = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
    tmp_manifest = os.path.join(base, "_manifest.tmp")
    with open(tmp_manifest, "w") as f:
        json.dump({"files": files}, f)
    os.replace(tmp_manifest, os.path.join(base, "MANIFEST.json"))
    # decoy: lands AFTER the commit; a directory-listing reader would
    # pick it up, a manifest reader must not
    decoy = sl.limit(5)
    decoy.write.mode("overwrite").parquet(os.path.join(base, "decoy"))
    for i, p in enumerate(
        glob.glob(os.path.join(base, "decoy", "*.parquet"))
    ):
        os.replace(p, os.path.join(data_dir, f"zz_uncommitted_{i}.parquet"))
    with open(os.path.join(base, "MANIFEST.json")) as f:
        committed = json.load(f)["files"]
    return spark.read.parquet(*committed)


# --- events_lag_features ----------------------------------------------------
#
# Supervised-training feature build: per event (ordered within user),
# the lag-1/lag-2 values and the trailing-3 rolling sum — the
# classic time-series feature frame a forecasting or CTR model
# trains on. All columns are micro-quantized bigints BEFORE the
# window math, so lags are exact copies and the rolling sum is
# integer — engine-identical, no float window arithmetic.


_LAGFEAT_SQL = """
    WITH q AS (
      SELECT user_id, event_id,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v_micro,
             epoch_us(ts) AS us
      FROM events WHERE value IS NOT NULL)
    SELECT user_id, event_id, v_micro,
           lag(v_micro, 1) OVER w AS lag1_micro,
           lag(v_micro, 2) OVER w AS lag2_micro,
           CAST(sum(v_micro) OVER (PARTITION BY user_id ORDER BY us, event_id
                                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS roll3_sum_micro
    FROM q
    WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    """


@register("events_lag_features", oracle=_LAGFEAT_SQL, tags=("events", "ml"))
def events_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event lag and rolling-window features (integer micro-units).

    Shapes: ONE hash(user) window exchange carries all four features
    (lag-1, lag-2, trailing-3 sum share the same (us, event_id)
    total-order frame). At 100 TB this is the standard feature-build
    pass: partition by entity, sort once, emit every windowed feature
    from the single sort."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    q = ev.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 1_000_000 + 0.5).cast("bigint").alias("v_micro"),
        F.unix_micros("ts").alias("us"),
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    wr = w.rowsBetween(-2, W.currentRow)
    return q.select(
        "user_id",
        "event_id",
        "v_micro",
        F.lag("v_micro", 1).over(w).alias("lag1_micro"),
        F.lag("v_micro", 2).over(w).alias("lag2_micro"),
        F.sum("v_micro").over(wr).cast("bigint").alias("roll3_sum_micro"),
    )


# --- text_collocations_pmi --------------------------------------------------
#
# Collocation extraction: top bigrams by pointwise mutual information
# PMI(x,y) = ln( c_xy · N / (c_x · c_y) ) — the measure that separates
# real multi-word expressions from frequency accidents. Every count is
# an exact bigint; the single ln() of an exact rational micro-
# quantizes at the end, and the ranking key is that integer.

_PMI_MIN_COUNT = 5
_PMI_TOPK = 50


_PMI_SQL = f"""
    WITH d AS (
      SELECT string_split_regex(trim(text), '\\s+') AS t
      FROM documents WHERE length(trim(text)) > 0),
    uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(t) AS w FROM d) GROUP BY 1),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM uni),
    bg AS (
      SELECT unnest(list_transform(
               generate_series(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM d WHERE len(t) >= 2),
    bc AS (
      SELECT bigram, CAST(count(*) AS BIGINT) AS cxy
      FROM bg GROUP BY 1 HAVING count(*) >= {_PMI_MIN_COUNT}),
    sc AS (
      SELECT split_part(bigram, ' ', 1) AS w1,
             split_part(bigram, ' ', 2) AS w2, cxy
      FROM bc),
    p AS (
      SELECT sc.w1, sc.w2, sc.cxy,
             CAST(floor(ln(CAST(sc.cxy AS DOUBLE) * n.total
                           / (CAST(u1.c AS DOUBLE) * u2.c))
                        * 1000000 + 0.5) AS BIGINT) AS pmi_micro
      FROM sc JOIN uni u1 ON sc.w1 = u1.w JOIN uni u2 ON sc.w2 = u2.w
      CROSS JOIN n),
    r AS (
      SELECT w1, w2, cxy, pmi_micro,
             row_number() OVER (ORDER BY pmi_micro DESC, w1, w2) AS rk
      FROM p)
    SELECT CAST(rk AS BIGINT) AS rk, w1, w2, cxy, pmi_micro
    FROM r WHERE rk <= {_PMI_TOPK}
    """


@register("text_collocations_pmi", oracle=_PMI_SQL, tags=("text", "north_star"))
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} collocations by PMI (integer micro-nats ranking key).

    Shapes: the unigram and bigram count aggregates partial-combine
    (vocab-sized exchanges, min-count prunes the bigram tail before
    the join); unigram counts join back BROADCAST; one TakeOrdered
    heap for the cut. The ln() argument is an exact integer rational
    — both engines evaluate the identical double before the micro
    quantization."""
    from pyspark.sql.window import Window as W

    from etl_cnpjs_spark.functions.text import tokens

    d = (
        table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(tokens(F.col("text")).alias("t"))
    )
    uni = (
        d.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    # corpus token total as a LAZY broadcast 1-row frame (house rule:
    # broadcast scalars, never an eager driver collect — r6 verdict).
    # uni is localCheckpointed so this re-aggregates the memoized counts,
    # not the corpus.
    totf = uni.agg(F.sum("c").cast("double").alias("_total"))
    sz = F.size("t")
    bigram = F.zip_with(
        F.slice(F.col("t"), 1, sz - 1),
        F.slice(F.col("t"), 2, sz - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bc = (
        d.filter(sz >= 2)
        .select(F.explode(bigram).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cxy"))
        .filter(F.col("cxy") >= _PMI_MIN_COUNT)
    )
    sc = bc.select(
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("w2"),
        "cxy",
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    p = (
        sc.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(totf))
        .select(
            "w1", "w2", "cxy",
            F.floor(
                F.log(
                    F.col("cxy").cast("double")
                    * F.col("_total")
                    / (F.col("c1").cast("double") * F.col("c2"))
                )
                * 1000000
                + 0.5
            ).cast("bigint").alias("pmi_micro"),
        )
    )
    r = p.orderBy(F.desc("pmi_micro"), F.asc("w1"), F.asc("w2")).limit(_PMI_TOPK)
    return r.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy().orderBy(F.desc("pmi_micro"), F.asc("w1"), F.asc("w2"))
        ),
    ).select(F.col("rk").cast("bigint").alias("rk"), "w1", "w2", "cxy", "pmi_micro")


# --- events_error_rate_sla --------------------------------------------------
#
# Hourly error-rate SLO screen: error events over total per hour per
# ... with breach flag when the rate crosses the budget — the alert
# rule a reliability dashboard evaluates. All-integer.

_SLA_BUDGET_PPM = 250_000


_SLA_SQL = f"""
    WITH h AS (
      SELECT epoch_us(ts) // 3600000000 AS hour,
             CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_errors
      FROM events GROUP BY 1)
    SELECT CAST(hour AS BIGINT) AS hour, n_total, n_errors,
           CAST(n_errors * 1000000 // n_total AS BIGINT) AS error_ppm,
           n_errors * 1000000 // n_total >= {_SLA_BUDGET_PPM} AS breach
    FROM h
    """


@register("events_error_rate_sla", oracle=_SLA_SQL, tags=("events", "dq"))
def events_error_rate_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly error rate (ppm) with SLO-breach flag.

    Shapes: one hour-bucket aggregate with map-side combine; the
    breach rule is integer comparison on the hourly frame. The
    streaming face of this shape is stream_tumbling's window — this
    is its batch SLO read."""
    ev = table(spark, sf_dir, "events")
    h = ev.select(
        F.expr("unix_micros(ts) DIV 3600000000").alias("hour"),
        F.col("event_type"),
    ).groupBy("hour").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_errors"),
    )
    return h.select(
        F.col("hour").cast("bigint").alias("hour"),
        "n_total",
        "n_errors",
        F.expr("n_errors * 1000000 DIV n_total").cast("bigint").alias("error_ppm"),
        (F.expr("n_errors * 1000000 DIV n_total") >= _SLA_BUDGET_PPM).alias(
            "breach"
        ),
    )


# --- agg_skyline ------------------------------------------------------------
#
# Pareto front (skyline): orders not dominated on (order day,
# total price), both maximized — the multi-criteria "best tradeoffs"
# operator (skyline query literature; no SQL built-in anywhere).
# Dominance (q dominates p ⟺ q ≥ p on both axes, strict on at least
# one) decomposes into two window tests, each mirrored TEXTUALLY in
# both engines so tie semantics cannot diverge:
#   dominated ⟺ max(price | strictly later day)   ≥ my price
#             ∨ max(price | same day)             > my price
# (equal day + strictly higher price dominates; strictly later day +
# equal price dominates; exact duplicates do NOT dominate each other).
# The window form is O(n log n) — the NOT EXISTS oracle would be
# O(n²) and unrunnable at sf0.1.


_SKYLINE_SQL = """
    WITH p AS (
      SELECT o_orderkey,
             datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS day,
             o_totalprice AS price
      FROM orders),
    w AS (
      SELECT o_orderkey, day, price,
             max(price) OVER (ORDER BY day DESC
                              RANGE BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS max_later,
             max(price) OVER (PARTITION BY day) AS max_same
      FROM p)
    SELECT o_orderkey, CAST(day AS BIGINT) AS day, price
    FROM w
    WHERE (max_later IS NULL OR max_later < price) AND price >= max_same
    """


@register("agg_skyline", oracle=_SKYLINE_SQL, tags=("agg", "skyline"))
def agg_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto front over (day, price), both maximized.

    Shapes: one global range-frame window ordered by day (descending
    epoch-day integer) carries the strictly-later running max; the
    same-day max is a partition window on the same exchange. At scale
    the global window is the cost — the distributed swap is
    angular/grid partitioning with per-partition skylines merged by a
    final pass (the standard parallel-skyline decomposition),
    documented here; at a 750k-row dimension table the single window
    is the right call. Price comparisons are raw parquet doubles
    (identical bits, no arithmetic)."""
    from pyspark.sql.window import Window as W

    o = table(spark, sf_dir, "orders")
    p = o.select(
        "o_orderkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("day"),
        F.col("o_totalprice").alias("price"),
    )
    w_later = (
        W.orderBy(F.col("day").desc())
        .rangeBetween(W.unboundedPreceding, -1)
    )
    w_same = W.partitionBy("day")
    wdf = p.select(
        "o_orderkey",
        "day",
        "price",
        F.max("price").over(w_later).alias("max_later"),
        F.max("price").over(w_same).alias("max_same"),
    )
    return wdf.filter(
        (F.col("max_later").isNull() | (F.col("max_later") < F.col("price")))
        & (F.col("price") >= F.col("max_same"))
    ).select("o_orderkey", F.col("day").cast("bigint").alias("day"), "price")


# --- text_js_divergence -----------------------------------------------------
#
# Jensen–Shannon divergence between the token distributions of two
# corpus sources — the symmetric, bounded distribution distance a
# curation pipeline tracks as "did this source drift". Per-term
# contributions are computed in double FROM EXACT INTEGER COUNTS with
# an identical op sequence, micro-quantized per term, then
# bigint-summed — the chi2/entropy discipline.


def _jsd_sql() -> str:
    return """
    WITH tok AS (
      SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents WHERE length(trim(text)) > 0),
    src2 AS (
      SELECT CASE WHEN source = (SELECT min(source) FROM tok) THEN 0 ELSE 1 END
               AS s, w
      FROM tok),
    c AS (
      SELECT w,
             CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM src2 GROUP BY 1),
    n AS (
      SELECT CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1
      FROM c),
    terms AS (
      SELECT
        CASE WHEN c.c0 > 0 THEN
          CAST(floor(
            CAST(c.c0 AS DOUBLE) / n.n0
            * ln(CAST(c.c0 AS DOUBLE) / n.n0
                 / ((CAST(c.c0 AS DOUBLE) / n.n0
                     + CAST(c.c1 AS DOUBLE) / n.n1) / 2.0))
            * 1000000 + 0.5) AS BIGINT)
        ELSE 0 END AS t0,
        CASE WHEN c.c1 > 0 THEN
          CAST(floor(
            CAST(c.c1 AS DOUBLE) / n.n1
            * ln(CAST(c.c1 AS DOUBLE) / n.n1
                 / ((CAST(c.c0 AS DOUBLE) / n.n0
                     + CAST(c.c1 AS DOUBLE) / n.n1) / 2.0))
            * 1000000 + 0.5) AS BIGINT)
        ELSE 0 END AS t1
      FROM c CROSS JOIN n)
    SELECT (SELECT n0 FROM n) AS n0, (SELECT n1 FROM n) AS n1,
           CAST(sum(t0) AS BIGINT) AS kl0_micro_sum,
           CAST(sum(t1) AS BIGINT) AS kl1_micro_sum,
           CAST((sum(t0) + sum(t1)) // 2 AS BIGINT) AS jsd_micro
    FROM terms
    """


@register("text_js_divergence", oracle=_jsd_sql(), tags=("text", "dq", "north_star"))
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSD (micro-nats) between the two lexicographically-first corpus
    sources' token distributions.

    Shapes: one hash(token) aggregate carries both sources' counts
    (map-side combined); the totals are a 1-row frame cross-joined
    (broadcast scalar); per-term KL contributions quantize to bigint
    BEFORE the final sum, so accumulation is order-proof. At 100 TB
    the vocab frame is the only exchange — the drift metric costs
    one token-count pass."""
    from etl_cnpjs_spark.functions.text import tokens

    docs = table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    # tokens() is a pure whitespace split, so every filtered doc has >=1
    # token: min(source) over docs == min over the exploded tok frame the
    # oracle uses. Computing it PRE-explode and keeping it lazy as a
    # broadcast 1-row frame avoids the eager extra tokenize pass the r6
    # verdict flagged (house rule: broadcast scalars, never collect).
    s0f = docs.agg(F.min("source").alias("_s0"))
    d = docs.select("source", F.explode(tokens(F.col("text"))).alias("w"))
    c = (
        d.crossJoin(F.broadcast(s0f))
        .select((F.col("source") != F.col("_s0")).cast("int").alias("s"), "w")
        .groupBy("w")
        .agg(
            F.sum(F.when(F.col("s") == 0, 1).otherwise(0)).cast("bigint").alias("c0"),
            F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).cast("bigint").alias("c1"),
        )
    )
    n = c.agg(
        F.sum("c0").cast("bigint").alias("n0"), F.sum("c1").cast("bigint").alias("n1")
    )
    j = c.crossJoin(F.broadcast(n))
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    m = (p0 + p1) / F.lit(2.0)
    t0 = F.when(
        F.col("c0") > 0,
        F.floor(p0 * F.log(p0 / m) * 1000000 + 0.5).cast("bigint"),
    ).otherwise(F.lit(0))
    t1 = F.when(
        F.col("c1") > 0,
        F.floor(p1 * F.log(p1 / m) * 1000000 + 0.5).cast("bigint"),
    ).otherwise(F.lit(0))
    terms = j.select(t0.alias("t0"), t1.alias("t1"), "n0", "n1")
    return terms.agg(
        F.max("n0").alias("n0"),
        F.max("n1").alias("n1"),
        F.sum("t0").cast("bigint").alias("kl0_micro_sum"),
        F.sum("t1").cast("bigint").alias("kl1_micro_sum"),
        F.expr("(sum(t0) + sum(t1)) DIV 2").cast("bigint").alias("jsd_micro"),
    )


# --- events_fano_factor -----------------------------------------------------
#
# Fano factor (variance/mean of hourly counts) per event type — the
# burstiness index (1 = Poisson, >1 = bursty, <1 = regular) that
# complements agg_autocorr's memory measure. Integer count sums, one
# fixed double-op finish.


_FANO_SQL = """
    WITH c AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS h,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS sn,
             CAST(sum(n * n) AS BIGINT) AS snn
      FROM c GROUP BY 1)
    SELECT event_type, k, sn,
           (CAST(snn AS DOUBLE) - CAST(sn AS DOUBLE) * sn / k) / (k - 1)
             / (CAST(sn AS DOUBLE) / k) AS fano
    FROM s WHERE k > 1
    """


@register("events_fano_factor", oracle=_FANO_SQL, tags=("events", "stats"))
def events_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly-count Fano factor per event type.

    Shapes: hour-bucket counts (map-side combined) → per-type sums →
    one double finish with a fixed op sequence on exact integers
    (sample variance / mean). Hour counts stay far below the int64
    product bound at any realistic scale (documented; decimal is the
    swap)."""
    ev = table(spark, sf_dir, "events")
    c = (
        ev.select("event_type", F.expr("unix_micros(ts) DIV 3600000000").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    s = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("sn"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("snn"),
    )
    snd = F.col("sn").cast("double")
    var = (F.col("snn").cast("double") - snd * F.col("sn") / F.col("k")) / (
        F.col("k") - 1
    )
    mean = snd / F.col("k")
    return s.filter(F.col("k") > 1).select(
        "event_type", "k", "sn", (var / mean).alias("fano")
    )


# --- mm_cas_chunks ----------------------------------------------------------
#
# Content-addressed chunk store (CAS): split each document's bytes
# into fixed 64-byte chunks, address each by md5, and report the
# corpus-wide shared chunks (refcount ≥ 2, top by refcount) — the
# storage-dedup primitive under every blob store / artifact cache.
# Fixed-size chunking keeps both engines' chunk boundaries trivially
# identical (content-defined chunking is the production upgrade —
# documented, same plan shape).

_CAS_CHUNK = 64
_CAS_TOPK = 50


_CAS_SQL = f"""
    WITH d AS (
      SELECT doc_id, text FROM documents WHERE length(text) > 0),
    ch AS (
      SELECT doc_id,
             md5(substr(text, CAST((i.g - 1) * {_CAS_CHUNK} + 1 AS INT),
                        {_CAS_CHUNK})) AS chunk_md5
      FROM d, (SELECT unnest(generate_series(1, 100)) AS g) i
      WHERE (i.g - 1) * {_CAS_CHUNK} < length(text)),
    rc AS (
      SELECT chunk_md5, CAST(count(*) AS BIGINT) AS refcount
      FROM ch GROUP BY 1 HAVING count(*) >= 2),
    r AS (
      SELECT chunk_md5, refcount,
             row_number() OVER (ORDER BY refcount DESC, chunk_md5) AS rk
      FROM rc)
    SELECT CAST(rk AS BIGINT) AS rk, chunk_md5, refcount
    FROM r WHERE rk <= {_CAS_TOPK}
    """


@register("mm_cas_chunks", oracle=_CAS_SQL, tags=("multimodal", "dedup", "sink"))
def mm_cas_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} shared content-addressed chunks (md5, refcount).

    Shapes: the chunk explode emits (doc, hash) rows — bytes never
    shuffle, only 32-hex digests; one hash(chunk) refcount aggregate
    with map-side combine; TakeOrdered cut. At 100 TB this is the
    dedup planning pass of a CAS ingest: refcounted chunks skip
    upload, the ratio prices the store."""
    from pyspark.sql.window import Window as W

    d = (
        table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select("doc_id", "text")
    )
    ch = d.select(
        "doc_id",
        F.expr(
            f"explode(sequence(1, least(cast(ceil(length(text) / {_CAS_CHUNK}.0) "
            f"as int), 100)))"
        ).alias("g"),
        "text",
    ).select(
        F.md5(
            F.expr(f"substr(text, ((g - 1) * {_CAS_CHUNK}) + 1, {_CAS_CHUNK})")
        ).alias("chunk_md5")
    )
    rc = (
        ch.groupBy("chunk_md5")
        .agg(F.count(F.lit(1)).cast("bigint").alias("refcount"))
        .filter(F.col("refcount") >= 2)
    )
    r = rc.orderBy(F.desc("refcount"), F.asc("chunk_md5")).limit(_CAS_TOPK)
    return r.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy().orderBy(F.desc("refcount"), F.asc("chunk_md5"))
        ),
    ).select(F.col("rk").cast("bigint").alias("rk"), "chunk_md5", "refcount")


# --- agg_topn_share ---------------------------------------------------------
#
# Top-N concentration: the share of total purchase value held by the
# top-10 users — the single concentration POINT a dashboard quotes
# next to agg_gini/agg_hhi's whole-distribution indices. Values
# micro-quantize to bigint before any summation; shares are integer
# ppm.

_TOPN_SHARE_N = 10


_TOPN_SHARE_SQL = f"""
    WITH u AS (
      SELECT user_id,
             CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
               AS v_micro
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY 1),
    t AS (SELECT CAST(sum(v_micro) AS BIGINT) AS total_micro,
                 CAST(count(*) AS BIGINT) AS n_users FROM u),
    r AS (
      SELECT v_micro, row_number() OVER (ORDER BY v_micro DESC, user_id) AS rk
      FROM u)
    SELECT t.n_users, t.total_micro,
           CAST(sum(CASE WHEN r.rk <= {_TOPN_SHARE_N} THEN r.v_micro ELSE 0 END)
                AS BIGINT) AS topn_micro,
           CAST(sum(CASE WHEN r.rk <= {_TOPN_SHARE_N} THEN r.v_micro ELSE 0 END)
                * 1000000 // t.total_micro AS BIGINT) AS topn_share_ppm
    FROM r CROSS JOIN t
    GROUP BY t.n_users, t.total_micro
    """


@register("agg_topn_share", oracle=_TOPN_SHARE_SQL, tags=("agg", "analytics"))
def agg_topn_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{N} users' share of purchase value (ppm).

    Shapes: per-user micro sums (one hash(user) exchange), a global
    rank window over the user-sized frame, one scalar reduce. At
    100 TB the user frame is dimension-sized; the top-N could drop
    to a TakeOrdered heap + broadcast — the ranked form keeps the
    oracle textual."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    u = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 1_000_000 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("v_micro")
    )
    r = u.withColumn(
        "rk", F.row_number().over(W.orderBy(F.desc("v_micro"), F.asc("user_id")))
    )
    return r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("v_micro").cast("bigint").alias("total_micro"),
        F.sum(F.when(F.col("rk") <= _TOPN_SHARE_N, F.col("v_micro")).otherwise(0))
        .cast("bigint")
        .alias("topn_micro"),
    ).select(
        "n_users",
        "total_micro",
        "topn_micro",
        F.expr("topn_micro * 1000000 DIV total_micro").cast("bigint").alias(
            "topn_share_ppm"
        ),
    )


# --- text_type_token_ratio --------------------------------------------------
#
# Lexical diversity per document: type–token ratio (distinct tokens /
# tokens, ppm) plus hapax share (tokens seen once in the doc) — two
# standard corpus-quality features next to text_stats/text_quality.
# All-integer.


_TTR_SQL = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents WHERE length(trim(text)) > 0),
    tc AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(count(*) * 1000000 // CAST(sum(c) AS BIGINT) AS BIGINT)
             AS ttr_ppm,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
                // CAST(count(*) AS BIGINT) AS BIGINT) AS hapax_ppm
    FROM tc GROUP BY doc_id
    """


@register("text_type_token_ratio", oracle=_TTR_SQL, tags=("text", "north_star"))
def text_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type–token ratio and hapax share per document (ppm).

    Shapes: one hash(doc, token) aggregate (map-side combined), one
    doc-grain rollup — both on the same doc-keyed exchange path.
    Classic quality features; all-integer output."""
    from etl_cnpjs_spark.functions.text import tokens

    d = (
        table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    )
    tc = d.groupBy("doc_id", "w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return tc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.expr("count(1) * 1000000 DIV sum(c)").cast("bigint").alias("ttr_ppm"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("bigint").alias(
            "n_hapax"
        ),
        F.expr(
            "sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000 DIV count(1)"
        )
        .cast("bigint")
        .alias("hapax_ppm"),
    )
