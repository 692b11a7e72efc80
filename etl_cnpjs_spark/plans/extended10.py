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
_KC_SUPP_OFFSET = 10_000_000


def _kcore_sql() -> str:
    k, off = _KCORE_K, _KC_SUPP_OFFSET
    sql = f"""
    WITH e0 AS (
      SELECT DISTINCT l_partkey AS u, l_suppkey + {off} AS v FROM lineitem),
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
    never reshuffled. localCheckpoint between rounds keeps the plan
    tree flat (operators/graph.py lineage discipline). At 100 TB:
    R scans of a shrinking edge list, each with one small exchange;
    the standard distributed peel (Quick-SQL k-core) shape."""
    li = table(spark, sf_dir, "lineitem")
    e0 = li.select(
        F.col("l_partkey").alias("u"),
        (F.col("l_suppkey") + F.lit(_KC_SUPP_OFFSET)).alias("v"),
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
            .localCheckpoint()
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
    rule). The oracle grid re-derives the statistics analytically,
    fully independent of the bytes."""
    from etl_cnpjs_spark.operators.multimodal import (
        bmp_channel_stats_map_in_pandas,
    )

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        (8 + F.col("doc_id") % 9).cast("int").alias("width"),
        (8 + F.col("doc_id") % 7).cast("int").alias("height"),
    )
    return bmp_channel_stats_map_in_pandas(d)
