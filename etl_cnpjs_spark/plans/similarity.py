"""Similarity-search plans over `embeddings` (north_star).

All scores are exact doubles, bit-identical to DuckDB (see
operators/similarity.py) — every plan here carries a full oracle,
including the IVF approximate path (the approximation is in the
*algorithm*, which the oracle re-derives exactly, not in the arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.operators.similarity import (
    all_pairs_cosine_blocked,
    cosine,
    embedding_lsh_pairs,
    gram_upper_map_in_pandas,
    knn_join_blocked,
    sql_cosine,
    vec_double,
)
from etl_cnpjs_spark.plans.registry import quantize, register

TOP_K = 10
NEAR_DUP_TAU = 0.4  # this corpus's embeddings are near-orthogonal (max
# pairwise cos ≈ 0.51 at sf0.01); 0.4 keeps the plan's output non-trivial.
CENTROID_MOD = 97  # deterministic coarse quantizer: vec_id % 97 == 0
N_PROBE = 2


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT parallel=True: _vecs feeds the mapInPandas numpy scorers
    # (hyperplane signatures, blocked k-NN) whose per-batch vectorization
    # wants few LARGE Arrow batches — a 32-way repartition of 2k vectors
    # measured dedup_embedding_lsh +1.24 s / sim_knn_join +0.58 s (r13 A/B).
    e = table(spark, sf_dir, "embeddings")
    return e.select("vec_id", "label", vec_double(F.col("embedding")).alias("v"))


_SQL_VECS = "SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings"


@register(
    "sim_topk",
    oracle=f"""
    WITH n AS ({_SQL_VECS}),
    q AS (SELECT v AS qv, vec_id AS qid FROM n ORDER BY vec_id LIMIT 1)
    SELECT n.vec_id, n.label, {sql_cosine("n.v", "q.qv")} AS cos_sim
    FROM n, q
    WHERE n.vec_id <> q.qid
    ORDER BY cos_sim DESC, n.vec_id
    LIMIT {TOP_K}
    """,
    tags=("north_star", "similarity"),
)
def sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for one query vector (the lowest vec_id):
    broadcast the single query row, scan once, TakeOrderedAndProject heap.
    The exact-ANN baseline; linear in corpus size at any scale."""
    n = _vecs(spark, sf_dir)
    q = (
        n.orderBy("vec_id")
        .limit(1)
        .select(F.col("v").alias("qv"), F.col("vec_id").alias("qid"))
    )
    scored = (
        n.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("vec_id", "label", cosine(F.col("v"), F.col("qv")).alias("cos_sim"))
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(TOP_K)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH n AS ({_SQL_VECS})
    SELECT a.vec_id AS i, b.vec_id AS j, {sql_cosine("a.v", "b.v")} AS cos_sim
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE {sql_cosine("a.v", "b.v")} >= {NEAR_DUP_TAU}
    """,
    tags=("north_star", "similarity", "dedup"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ τ over all pairs i<j, via the
    blocked cross-product + vectorized-numpy scorer
    (operators/similarity.py::all_pairs_cosine_blocked).

    The row-expression crossJoin form is O(n²) *interpreted* aggregates;
    blocking keeps the same exact O(n²) arithmetic but runs it as
    NB(NB+1)/2 bounded Arrow tasks of SIMD numpy — ~25× faster at sf0.1
    and the layout that survives a cluster (per-task memory is capped by
    the block size, tasks are embarrassingly parallel). Scores stay
    bit-identical to the DuckDB oracle (sequential fold, same op order).
    At 100 TB brute force itself is the wrong shape — this key is the
    oracle-grade exact baseline; the production path is
    dedup_embedding_lsh (banded candidates, bucket-local verify), with
    sim_topk_ivf's centroid bucketing as the ANN alternative. That split
    is ENFORCED, not advisory: the operator refuses corpora above 50k
    vectors (ValueError naming the twins; max_rows=None opts back in for
    deliberate conformance runs on sampled slices), so the baseline
    cannot be silently misused as a scale path."""
    n = _vecs(spark, sf_dir)
    return all_pairs_cosine_blocked(
        n.select("vec_id", "v"), "vec_id", "v", NEAR_DUP_TAU
    )


@register(
    "dedup_embedding_lsh",
    oracle=f"""
    WITH n AS ({_SQL_VECS})
    SELECT a.vec_id AS i, b.vec_id AS j, {sql_cosine("a.v", "b.v")} AS cos_sim
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE {sql_cosine("a.v", "b.v")} >= {NEAR_DUP_TAU}
    """,
    tags=("north_star", "similarity", "dedup", "lsh"),
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via hyperplane-LSH banding — the bucketed
    replacement for dedup_embedding_cosine's all-pairs layout: random-
    hyperplane sign signatures (Arrow-batched matmul), one band-bucket
    equi-join for candidates, exact-cosine verify on candidates only.
    Nothing in the plan materializes the n² pair space, and no verify
    task collects an unbounded payload: buckets over 1024 members salt
    into bounded group-pair tasks with exact pair coverage
    (operators/similarity.py::salted_buckets; planted hot-bucket proof
    in tests/test_dedup_recall.py::test_lsh_hot_bucket_cap).

    Operating point (32 bands × 2 bits, measured on this corpus): per-pair
    miss probability at τ=0.4 is (1−0.631²)^32 ≈ 9e-8, and measured recall
    is 100% at sf0.001/0.01/0.1 — so the key carries the EXACT all-pairs
    oracle, the same contract dedup_minhash has with exact Jaccard.

    Honesty note, measured: τ=0.4 on this near-orthogonal corpus
    (background p(bit) ≈ 0.5–0.59 vs true-pair p ≈ 0.63) is the regime
    where banding cannot also prune — every 100%-recall config keeps
    ≥94% of pairs as candidates (sweep: r=2..8, B=16..48). LSH pruning
    becomes real in the production near-dup regime: at τ=0.9 with
    16 bands × 8 bits the same operator prunes >90% of pairs at full
    recall (asserted with planted duplicates in
    tests/test_dedup_recall.py). The operator is the scale path; the τ
    is this corpus's quirk."""
    n = _vecs(spark, sf_dir)
    return embedding_lsh_pairs(
        n.select("vec_id", "v"), "vec_id", "v", NEAR_DUP_TAU, bands=32, rows=2
    )


KNN_K = 5


@register(
    "sim_knn_join",
    oracle=f"""
    WITH n AS ({_SQL_VECS}),
    p AS (
      SELECT a.vec_id AS i, b.vec_id AS j, {sql_cosine("a.v", "b.v")} AS cos_sim
      FROM n a JOIN n b ON a.vec_id <> b.vec_id
    ),
    r AS (
      SELECT i, j, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY i ORDER BY cos_sim DESC, j) AS INT) AS rn
      FROM p)
    SELECT i, j, cos_sim, rn FROM r WHERE rn <= {KNN_K}
    """,
    tags=("north_star", "similarity", "knn"),
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN self-join (every vector → its 5 nearest neighbors): blocked
    local-top-k + one global window merge
    (operators/similarity.py::knn_join_blocked). The kNN-graph builder
    for embedding-space dedup/clustering — shuffle is n·NB·k candidate
    rows, never the n² pair matrix; the oracle re-derives it from the
    full cross join."""
    n = _vecs(spark, sf_dir)
    return knn_join_blocked(n.select("vec_id", "v"), "vec_id", "v", KNN_K)


_kmeans_cache: dict[tuple[str, str], object] = {}


def _kmeans_model(spark: SparkSession, sf_dir: str, train_df) -> object:
    """Fitted KMeans quantizer memoized per (applicationId, sf) — at
    scale the coarse quantizer is trained ONCE offline and reused by
    every query; training inside each query execution was a bench
    artifact (VERDICT r1), not the production shape."""
    from pyspark.ml.clustering import KMeans

    key = (spark.sparkContext.applicationId, sf_dir)
    model = _kmeans_cache.get(key)
    if model is None:
        model = KMeans(
            k=16, seed=42, featuresCol="features", predictionCol="cid"
        ).fit(train_df)
        _kmeans_cache[key] = model
    return model


@register(
    "sim_topk_kmeans_trained",
    oracle=None,  # trained-model assignment has no SQL twin — rows-only
    tags=("similarity", "ann", "ml", "rows_only"),
)
def sim_topk_kmeans_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production form of sim_topk_kmeans: IVF with a TRAINED coarse
    quantizer. pyspark.ml KMeans(16, seed fixed) fits centroids, vectors
    are assigned by the model, the query probes its 4 nearest centroid
    buckets, exact cosine ranks within probes. MLlib's KMeans is itself
    a distributed Lloyd's iteration, so the trainer scales with the
    corpus; the model is trained once per (session, sf) and reused
    (_kmeans_model), mirroring offline quantizer training. Because
    trained-model assignment depends on MLlib internals it cannot carry
    a SQL oracle — this key is DELIBERATELY rows-only (the one such key
    in the registry, r6 ADVICE item 1: benchmark output must not claim
    trained-quantizer coverage through the label-seeded twin). Its
    correctness evidence is the measured recall-vs-exact test
    (tests/test_blocked_ops.py::test_kmeans_ivf_recall_vs_exact) and
    the structural invariants shared with the oracle-checked twin."""
    from pyspark.ml.functions import array_to_vector  # noqa: F401

    n = _vecs(spark, sf_dir).withColumn("features", array_to_vector(F.col("v")))
    model = _kmeans_model(spark, sf_dir, n)
    assign = model.transform(n).select("vec_id", "label", "v", "cid")
    q = (
        assign.orderBy("vec_id")
        .limit(1)
        .select(F.col("v").alias("qv"), F.col("vec_id").alias("qid"))
    )
    centroids = spark.createDataFrame(
        [(i, list(map(float, c))) for i, c in enumerate(model.clusterCenters())],
        "cid int, cv array<double>",
    )
    probes = (
        centroids.crossJoin(F.broadcast(q))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.desc(cosine(F.col("qv"), F.col("cv"))), F.asc("cid"))
            ),
        )
        .filter(F.col("rn") <= 4)
        .select("cid")
    )
    return (
        assign.join(F.broadcast(probes), "cid")
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("vec_id", "label", "cid", cosine(F.col("v"), F.col("qv")).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


KMEANS_N_PROBE = 4

# Shared CTE block: deterministic label-mean centroids (one exact
# Lloyd's assign step, decimal-quantized — embedding_centroids'
# arithmetic) + nearest-centroid assignment. Used by sim_topk_kmeans
# and dedup_semantic.
_SQL_ASSIGN_CTES = f"""
    u AS (
      SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x
      FROM n),
    cl AS (
      SELECT label AS cid, pos,
             floor(sum(x) / count(*) * 1e6 + 0.5) / 1e6 AS cx
      FROM u GROUP BY label, pos),
    c AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cl GROUP BY cid),
    assign AS (
      SELECT vec_id, label, v, cid FROM (
        SELECT n.vec_id, n.label, n.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                                  ORDER BY {sql_cosine("n.v", "c.cv")} DESC, c.cid) AS rn
        FROM n, c) t
      WHERE rn = 1)
"""


# Single-row broadcast bound for _label_centroid_assignment: k=4096
# centroids × dim≤1024 doubles ≈ 33 MB in one row — comfortably inside
# Spark's per-row and broadcast limits; past it the k-row broadcast
# join is the right shape anyway (per-row cost grows with k while the
# join's stays flat).
_CENTROID_BROADCAST_MAX_K = 4096


def _label_centroid_assignment(n: DataFrame):
    """Spark twin of _SQL_ASSIGN_CTES: returns (centroids c[cid, cv],
    assignment[vec_id, label, v, cid]). Centroid build is one
    (label,pos) partial-agg shuffle; assignment is a TRUE
    broadcast-centroid map pass (r12): the k centroids collect into a
    single broadcast array row and each vector picks
    array_max over (cosine, -cid) — the identical selection the
    oracle's ROW_NUMBER(ORDER BY cosine DESC, cid) makes (same cosine
    doubles, ties to the smallest cid), with NO k-fold row explosion
    and NO vec_id window shuffle. The previous form crossJoined
    vectors × centroids then sorted that frame per vec_id — at 100 TB
    that shuffles k copies of the vector table to rank rows a map-side
    argmax folds in place; pinned value-identical by the tie-heavy
    synthetic in tests/test_plans.py::test_centroid_assignment_argmax
    and the four consumer keys' oracles (sim_topk_kmeans,
    dedup_semantic, sim_recall_report, corpus_dedup_funnel)."""
    cent_long = (
        n.select("label", F.posexplode("v").alias("pos0", "x"))
        .groupBy("label", "pos0")
        .agg(quantize(F.sum("x") / F.count(F.lit(1))).alias("cx"))
    )
    c = cent_long.groupBy(F.col("label").alias("cid")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos0", "cx"))), lambda s: s.cx
        ).alias("cv")
    )
    # r13 guard (ADVICE r12 low #2): the k centroids collapse into ONE
    # row holding k×dim doubles — fine for the small label alphabets
    # this form exists for, but a single row hits Spark's per-row /
    # collect_list limits far sooner than a k-row broadcast would. The
    # bound is enforced at EXECUTION time through a filter on the
    # collapsed row itself (assert_true returns NULL when the bound
    # holds, so the filter passes; a driver-side count() would re-run
    # the centroid aggregate as a second job). Above the bound, route
    # through sim_topk_ivf's k-row broadcast-join assignment instead.
    call = c.agg(F.collect_list(F.struct("cid", "cv")).alias("__cs")).filter(
        F.assert_true(
            F.size("__cs") <= _CENTROID_BROADCAST_MAX_K,
            F.concat(
                F.lit(
                    "_label_centroid_assignment: centroid count "
                ),
                F.size("__cs").cast("string"),
                F.lit(
                    f" exceeds the {_CENTROID_BROADCAST_MAX_K} single-row "
                    "broadcast bound; use a k-row broadcast join "
                    "(sim_topk_ivf's assignment shape) for large k."
                ),
            ),
        ).isNull()
    )
    best = F.array_max(
        F.transform(
            F.col("__cs"),
            lambda s: F.struct(
                cosine(F.col("v"), s.cv).alias("cos"),
                (-s.cid).alias("ncid"),
            ),
        )
    )
    assign = (
        n.crossJoin(F.broadcast(call))
        .select(
            "vec_id",
            "label",
            "v",
            (-best.getField("ncid")).alias("cid"),
        )
    )
    return c, assign


_SQL_KMEANS = f"""
    WITH n AS ({_SQL_VECS}),
    {_SQL_ASSIGN_CTES},
    q AS (SELECT v AS qv, vec_id AS qid FROM n ORDER BY vec_id LIMIT 1),
    probes AS (
      SELECT cid FROM (
        SELECT c.cid,
               ROW_NUMBER() OVER (ORDER BY {sql_cosine("q.qv", "c.cv")} DESC, c.cid) AS rn
        FROM c, q) t
      WHERE rn <= {KMEANS_N_PROBE})
    SELECT a.vec_id, a.label, a.cid, {sql_cosine("a.v", "q.qv")} AS cos_sim
    FROM assign a JOIN probes p ON a.cid = p.cid, q
    WHERE a.vec_id <> q.qid
    ORDER BY cos_sim DESC, a.vec_id
    LIMIT {TOP_K}
"""


@register(
    "sim_topk_kmeans",
    oracle=_SQL_KMEANS,
    # NOT tagged 'ml' (r6 ADVICE item 1): the quantizer here is
    # label-SEEDED, not trained — trained-KMeans coverage is the
    # sim_topk_kmeans_trained key below.
    tags=("north_star", "similarity", "ann", "label_seeded"),
)
def sim_topk_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a k-means-style coarse quantizer, made oracle-exact: the
    centroids are the per-label mean vectors (embedding_centroids'
    decimal-quantized arithmetic — exactly one Lloyd's step seeded by
    the labels), every vector is assigned to its nearest centroid by
    cosine, the query probes its KMEANS_N_PROBE nearest buckets, and
    exact cosine ranks within probes. Same layout and cost model as the
    trained production form (sim_topk_kmeans_trained, pyspark.ml KMeans
    — quality-tested in tests/test_blocked_ops.py) but with a quantizer
    both engines can re-derive bit-identically, so the approximate plan
    carries a FULL hash oracle: the approximation is in the algorithm,
    which the SQL re-runs, not in the arithmetic. Distributed shape:
    centroid build is one (label,pos) partial-agg shuffle; assignment is
    a broadcast-centroid map pass; a probe touches nprobe/k of the
    corpus."""
    n = _vecs(spark, sf_dir)
    c, assign = _label_centroid_assignment(n)
    q = (
        n.orderBy("vec_id")
        .limit(1)
        .select(F.col("v").alias("qv"), F.col("vec_id").alias("qid"))
    )
    probes = (
        c.crossJoin(F.broadcast(q))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.desc(cosine(F.col("qv"), F.col("cv"))), F.asc("cid"))
            ),
        )
        .filter(F.col("rn") <= KMEANS_N_PROBE)
        .select("cid")
    )
    return (
        assign.join(F.broadcast(probes), "cid")
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("vec_id", "label", "cid", cosine(F.col("v"), F.col("qv")).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@register(
    "embedding_centroids",
    oracle=f"""
    WITH n AS ({_SQL_VECS}),
    u AS (
      SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x
      FROM n)
    SELECT label, CAST(pos AS INT) AS pos,
           floor(sum(x) / count(*) * 1e6 + 0.5) / 1e6 AS centroid
    FROM u GROUP BY label, pos
    """,
    tags=("north_star", "similarity", "centroid"),
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors — the training primitive behind IVF
    coarse quantizers and k-means (one iteration = assign + THIS).
    Dimension-wise mean via posexplode → groupBy(label, pos): the
    shuffle carries (label, pos, partial sums), n·dim small rows, and
    map-side partial aggregation collapses them before the wire. Output
    stays long-form (label, pos, value) — rebuilding arrays is a
    presentation step, not a compute one. quantize(6) (floor-based,
    registry.quantize) absorbs partition-order float-sum drift
    (sum/count, same op order both engines) without the round()
    half-boundary divergence."""
    n = _vecs(spark, sf_dir)
    u = n.select("label", F.posexplode("v").alias("pos0", "x"))
    return (
        u.groupBy("label", (F.col("pos0") + 1).cast("int").alias("pos"))
        .agg(quantize(F.sum("x") / F.count(F.lit(1))).alias("centroid"))
    )


_SQL_IVF = f"""
    WITH n AS ({_SQL_VECS}),
    c AS (SELECT vec_id AS cid, v AS cv FROM n WHERE vec_id % {CENTROID_MOD} = 0),
    assign AS (
      SELECT vec_id, label, v, cid FROM (
        SELECT n.vec_id, n.label, n.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                                  ORDER BY {sql_cosine("n.v", "c.cv")} DESC, c.cid) AS rn
        FROM n, c) t
      WHERE rn = 1
    ),
    q AS (SELECT v AS qv, vec_id AS qid FROM n ORDER BY vec_id LIMIT 1),
    probes AS (
      SELECT cid FROM (
        SELECT c.cid,
               ROW_NUMBER() OVER (ORDER BY {sql_cosine("q.qv", "c.cv")} DESC, c.cid) AS rn
        FROM c, q) t
      WHERE rn <= {N_PROBE}
    )
    SELECT a.vec_id, a.label, a.cid, {sql_cosine("a.v", "q.qv")} AS cos_sim
    FROM assign a JOIN probes p ON a.cid = p.cid, q
    WHERE a.vec_id <> q.qid
    ORDER BY cos_sim DESC, a.vec_id
    LIMIT {TOP_K}
"""


@register("sim_topk_ivf", oracle=_SQL_IVF, tags=("north_star", "similarity", "ann"))
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: deterministic coarse centroids
    (vec_id % CENTROID_MOD == 0), nearest-centroid assignment (broadcast
    centroids — a TRUE map pass since r12), probe the query's N_PROBE
    nearest buckets.

    The scale path for ANN: assignment is a broadcast crossJoin
    streamed straight into groupBy(vec_id).max_by(…, (cosine, −cid)) —
    the identical pick ROW_NUMBER(ORDER BY cosine DESC, cid) makes, and
    the per-vector argmax collapses MAP-SIDE in the partial aggregate,
    so the exchange carries ONE row per vector (the pre-r12 window form
    shuffled k copies of the corpus and sorted them). Chosen over the
    zero-exchange array_max-lambda form (_label_centroid_assignment's
    shape) per the r12 A/B: at this k the lambda's interpreted
    per-row struct array costs more than the agg's one thin exchange
    (grids in NOTES; both forms are value-identical, the tie fence
    pins this one). A probe touches |corpus|·nprobe/|centroids|
    vectors instead of all. The oracle re-derives the same algorithm,
    so this approximate plan still hash-matches exactly."""
    n = _vecs(spark, sf_dir)
    c = n.filter(F.col("vec_id") % CENTROID_MOD == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    score = F.struct(
        cosine(F.col("v"), F.col("cv")).alias("cos"),
        (-F.col("cid")).alias("ncid"),
    )
    assign = (
        n.crossJoin(F.broadcast(c))
        .groupBy("vec_id")
        .agg(F.max_by(F.struct("label", "v", "cid"), score).alias("b"))
        .select(
            "vec_id",
            F.col("b.label").alias("label"),
            F.col("b.v").alias("v"),
            F.col("b.cid").alias("cid"),
        )
    )
    q = (
        n.orderBy("vec_id")
        .limit(1)
        .select(F.col("v").alias("qv"), F.col("vec_id").alias("qid"))
    )
    probes = (
        c.crossJoin(F.broadcast(q))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.desc(cosine(F.col("qv"), F.col("cv"))), F.asc("cid"))
            ),
        )
        .filter(F.col("rn") <= N_PROBE)
        .select("cid")
    )
    return (
        assign.join(F.broadcast(probes), "cid")
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("vec_id", "label", "cid", cosine(F.col("v"), F.col("qv")).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@register(
    "embedding_quantize",
    oracle="""
    WITH d AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    s AS (SELECT vec_id, v,
                 list_aggregate(v, 'min') AS mn,
                 list_aggregate(v, 'max') AS mx FROM d)
    SELECT vec_id, mn, mx,
           array_to_string(
             CASE WHEN mx = mn THEN list_transform(v, x -> 0)
                  ELSE list_transform(v,
                         x -> CAST(floor((x - mn) * 255 / (mx - mn) + 0.5)
                                   AS INTEGER))
             END, ',') AS q8_csv
    FROM s
    """,
    tags=("north_star", "similarity", "quantize"),
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Affine int8 quantization per vector: store (mn, mx, 64×uint8)
    instead of 64×float32 — ~3.7× smaller, the difference between an
    embedding table that fits the page cache and one that doesn't at
    100 TB. Reconstruction x̂ = mn + q·(mx−mn)/255 carries ≤ half-step
    error (bounded in tests/test_approx_accuracy.py); all arithmetic is
    double-promoted first and the code picks its bin via
    floor(v + 0.5) — exact half-up on the non-negative range, immune to
    the engines' round() half-boundary divergence (registry.quantize
    docstring). Pure
    higher-order array expressions — no UDF, no shuffle, one scan.
    The int8 codes are emitted as a csv scalar (q8_csv) at the output
    boundary (driver canonicalizer can't sort raw array columns); a
    real sink would of course store the packed array/binary form."""
    e = table(spark, sf_dir, "embeddings")
    d = e.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    s = d.select(
        "vec_id", "v", F.array_min("v").alias("mn"), F.array_max("v").alias("mx")
    )
    return s.selectExpr(
        "vec_id",
        "mn",
        "mx",
        """array_join(
             CASE WHEN mx = mn THEN transform(v, x -> '0')
                  ELSE transform(v,
                         x -> cast(cast(floor((x - mn) * 255 / (mx - mn) + 0.5)
                                        as int) as string))
             END, ',') AS q8_csv""",
    )


@register(
    "embedding_gram",
    oracle="""
    WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    w AS (SELECT vec_id,
                 list_transform(v, x -> CAST(floor(x * 1000000) AS BIGINT)) AS w
          FROM n),
    e AS (SELECT vec_id, w, unnest(generate_series(1, len(w))) AS i FROM w)
    SELECT CAST(a.i - 1 AS INT) AS i, CAST(b.i - 1 AS INT) AS j,
           CAST(SUM(a.w[a.i] * b.w[b.i]) AS BIGINT) AS gram_q
    FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY 1, 2
    """,
    tags=("north_star", "similarity", "moments"),
)
def embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gram matrix Σ wᵀw over the embedding corpus — the
    sufficient statistic every second-order embedding operation derives
    from (covariance via S − n·μμᵀ with the mean from
    embedding_centroids, then PCA / whitening / Mahalanobis
    driver-side on the dim×dim result). Distributed shape
    (operators/similarity.py::gram_upper_map_in_pandas): one integer
    BLAS matmul per Arrow batch, dim(dim+1)/2-row partials, one
    partial-sum shuffle — vectors never shuffle, the matrix does. The
    oracle computes the same upper triangle via a position self-join
    (quadratic in dim, fine at oracle scale); exact int64 sums of
    floor-quantized components make the compare bit-for-bit. This is
    the engine-primitive twin of pyspark.ml's Summarizer/RowMatrix
    covariance (which are float-accumulating and rows-only-checkable
    by construction)."""
    e = table(spark, sf_dir, "embeddings")
    d = e.select("vec_id", vec_double(F.col("embedding")).alias("v"))
    return gram_upper_map_in_pandas(d, "v")


# --- semantic dedup (SemDeDup) ---------------------------------------------

SEMANTIC_TAU = NEAR_DUP_TAU  # same near-dup threshold as the cosine family

_SQL_SEMANTIC = f"""
    WITH n AS ({_SQL_VECS}),
    {_SQL_ASSIGN_CTES},
    dropped AS (
      SELECT DISTINCT a.vec_id
      FROM assign a JOIN assign b
        ON a.cid = b.cid AND b.vec_id < a.vec_id
      WHERE {sql_cosine("a.v", "b.v")} >= {SEMANTIC_TAU})
    SELECT a.vec_id, a.cid, (d.vec_id IS NULL) AS kept
    FROM assign a LEFT JOIN dropped d ON a.vec_id = d.vec_id
"""


@register(
    "dedup_semantic",
    oracle=_SQL_SEMANTIC,
    tags=("north_star", "similarity", "dedup", "semantic"),
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    arXiv:2303.09540 recipe): coarse-cluster the embeddings, compare
    pairs ONLY within a cluster, and keep one survivor per semantic
    near-dup set. Concretely: (1) deterministic label-mean centroids +
    nearest-centroid assignment (_label_centroid_assignment — the same
    exact-arithmetic quantizer sim_topk_kmeans uses; production swaps
    in the trained KMeans quantizer, same layout); (2) a bucket-local
    self-join scores cos(a,b) for pairs in the SAME bucket; (3) a
    vector is dropped iff a lower-id vector in its bucket is
    near-duplicate (cos ≥ τ) — the deterministic keep-lowest-id form of
    SemDeDup's keep-one rule, which both engines can re-derive, making
    this approximate algorithm fully hash-checkable (like sim_topk_ivf,
    the approximation is in the algorithm the oracle re-runs, not the
    arithmetic).

    Scale shape — the reason SemDeDup exists: the pair space is
    Σ_buckets (n_b choose 2), ~n²/k for balanced buckets, instead of
    the global n²; assignment is a broadcast-centroid map pass, and the
    intra-bucket verify runs as the SAME salted numpy bucket scorer
    dedup_embedding_lsh verifies with (bucket_cosine_pairs — one
    bucket-keyed shuffle, hot clusters salt into bounded group-pair
    tasks, scores bit-identical to the SQL fold; measured ~4× over the
    row-expression self-join at sf0.1). k grows with the corpus so
    bucket size stays bounded; cross-bucket near-dups are the accepted
    miss (the paper's trade), measured against the exact cosine family
    in tests/test_dedup_recall.py."""
    from etl_cnpjs_spark.operators.similarity import bucket_cosine_pairs

    n = _vecs(spark, sf_dir)
    _, assign = _label_centroid_assignment(n)
    a = assign.localCheckpoint()  # two consumers: pair scorer + rebuild
    pairs = bucket_cosine_pairs(a, "cid", "vec_id", "v", SEMANTIC_TAU)
    dropped = pairs.select(F.col("j").alias("vec_id")).distinct()
    return a.join(dropped.withColumn("d", F.lit(1)), "vec_id", "left").select(
        "vec_id", "cid", F.col("d").isNull().alias("kept")
    )
