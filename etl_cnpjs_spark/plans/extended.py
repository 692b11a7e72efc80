"""Extended relational surface beyond SURVEY.md §2's minimum inventory:
exact quantiles, grouping sets, per-group top-k, deterministic sampling,
map functions, unpivot, full-outer join.

The reference has none of these (its analytical surface is one SPJ query,
`ETLCNPJFinalEmpresaEstabelecimentos.py:191-234`), but a 100 TB training
-data pipeline uses every one of them: quantiles for quality-score
thresholds, hash sampling for held-out splits, top-k-per-group for
per-source caps, unpivot for metric normalization.

Determinism notes:
- quantiles: Spark `percentile` (exact, linear interpolation) vs DuckDB
  `quantile_cont`; interpolation arithmetic may differ in op order, so
  both sides round(…, 6) — same convention as fn_math.
- sample_hash: multiplicative hashing (Knuth 2654435761) in exact bigint
  arithmetic — identical in both engines. Keys here are < 2^33 so the
  product fits bigint; at real scale swap in xxhash64/murmur3 (engine
  hash, oracle becomes rows-only).
- every window/top-k ordering carries a unique-key tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.plans.registry import register

_QS = (0.25, 0.5, 0.75, 0.95)


@register(
    "agg_quantile",
    oracle=f"""
    SELECT l_returnflag,
           {", ".join(f"round(quantile_cont(l_quantity, {q}), 6) AS qty_p{int(q * 100)}" for q in _QS)},
           round(quantile_cont(l_extendedprice, 0.5), 6) AS price_median
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "quantile"),
)
def agg_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped quantiles (linear interpolation): Spark `percentile`
    — a full sort-based aggregate, the exact twin of the
    `approx_percentile` sketch already covered by agg_approx_distinct's
    family. At 100 TB exact percentiles of a numeric column are still
    feasible (single shuffle on the group key); per-key sorts spill."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        *[
            F.round(F.percentile("l_quantity", F.lit(q)), 6).alias(f"qty_p{int(q * 100)}")
            for q in _QS
        ],
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("price_median"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg", "grouping_sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither pure rollup nor cube): per-flag,
    per-status, and grand total in one pass — Spark expands to a single
    Expand + hash aggregate (one shuffle, partial aggregation map-side).
    gid disambiguates the NULL produced by grouping from a NULL value."""
    l = table(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "window_topk_group",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn
    FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS INT) AS rn
      FROM lineitem) t
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 line items per supplier by price — the per-group cap every
    training pipeline applies (max docs per domain/source). One shuffle on
    the group key; rank+filter prunes inside the sort, and AQE handles
    skewed groups. Total order via (price DESC, orderkey, linenumber)."""
    l = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        l.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# Knuth multiplicative hash; exact in bigint for keys < 2^33.
_KNUTH = 2654435761
_MOD = 4294967296  # 2^32
_KEEP = 429496730  # ≈ 10% of 2^32


@register(
    "sample_hash",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE (l_orderkey * {_KNUTH}) % {_MOD} < {_KEEP}
    """,
    tags=("sample", "north_star"),
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by multiplicative key hash — the
    reproducible train/held-out split primitive. Hashing the KEY (not
    random()) keeps the sample stable across runs/engines and keeps all
    rows of one order together. Pure scan+filter: no shuffle, pushes
    nothing to parquet (the predicate is computed) but prunes columns."""
    l = table(spark, sf_dir, "lineitem")
    return l.select("l_orderkey", "l_linenumber", "l_quantity").filter(
        (F.col("l_orderkey") * _KNUTH) % _MOD < _KEEP
    )


@register(
    "fn_map",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_quantity                                    AS qty_val,
           2                                             AS n_entries,
           'price,qty'                                   AS keys_csv,
           l_quantity * 2                                AS qty_doubled,
           l_extendedprice                               AS price_val
    FROM lineitem
    """,
    tags=("fn", "map"),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: build map<string,double> per row
    (map_from_arrays), then element_at, map_keys (sorted → csv), size,
    transform_values, map_concat. The oracle states the semantically
    equal scalar results directly — map construction is Spark-side
    machinery; ground truth is the values. All JVM built-ins."""
    l = table(spark, sf_dir, "lineitem")
    mp = F.map_from_arrays(
        F.array(F.lit("qty"), F.lit("price")),
        F.array(F.col("l_quantity"), F.col("l_extendedprice")),
    )
    doubled = F.transform_values(mp, lambda _, v: v * 2)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(mp, "qty").alias("qty_val"),
        F.size(mp).alias("n_entries"),
        F.concat_ws(",", F.array_sort(F.map_keys(mp))).alias("keys_csv"),
        F.element_at(doubled, "qty").alias("qty_doubled"),
        F.element_at(F.map_concat(mp), "price").alias("price_val"),
    )


@register(
    "reshape_unpivot",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val FROM part
    """,
    tags=("reshape",),
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) of part's numeric metrics — the inverse of
    agg_pivot. Spark's native `unpivot` expands in-place (Expand node):
    no shuffle, output rows = rows × metrics."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@register(
    "fn_struct",
    oracle="""
    SELECT c_custkey,
           c_nationkey                                   AS nk,
           round(c_acctbal, 2)                           AS bal,
           ((c_nationkey, c_acctbal) < (7, 0.0))         AS below,
           ((c_nationkey, c_acctbal) = (c_nationkey, c_acctbal)) AS self_eq
    FROM customer
    """,
    tags=("fn", "struct"),
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested struct surface: build struct<nationkey,acctbal> per row,
    read fields back, and use Spark's lexicographic struct comparison —
    the DuckDB oracle mirrors it with tuple comparison. Structs are the
    unit of nesting every multimodal/metadata column uses (mm_meta's
    typed metadata is a struct); this pins field access + ordering
    semantics."""
    c = table(spark, sf_dir, "customer")
    s = F.struct(F.col("c_nationkey").alias("nk"), F.col("c_acctbal").alias("bal"))
    probe = F.struct(F.lit(7).alias("nk"), F.lit(0.0).alias("bal"))
    return c.select(
        "c_custkey",
        s.getField("nk").alias("nk"),
        F.round(s.getField("bal"), 2).alias("bal"),
        (s < probe).alias("below"),
        (s == s).alias("self_eq"),
    )


@register(
    "scan_binaryfile",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))                 AS n_bytes,
           hex(encode(text))                          AS content_hex
    FROM documents
    WHERE doc_id < 50
    """,
    tags=("source", "binary", "north_star"),
)
def scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `binaryFile` source — how raw media (images/audio/shards)
    enters the engine at scale: one row per file with (path, length,
    content: binary). Stages a deterministic 50-doc slice as .bin files,
    reads them back through the format, recovers the id from the
    filename, and fingerprints the bytes. The oracle recomputes length +
    prefix from the source table — proving the file round trip is
    byte-faithful. At 100 TB: binaryFile parallelizes per-file;
    maxBytesPerTrigger/pathGlobFilter control batch size."""
    import os
    import tempfile

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    out = tempfile.mkdtemp(prefix="binfiles_")
    for r in d.select("doc_id", "text").collect():  # 50 rows, driver-side stage
        with open(os.path.join(out, f"doc_{r.doc_id:06d}.bin"), "wb") as f:
            f.write(r.text.encode("utf-8"))
    files = spark.read.format("binaryFile").load(out)
    return files.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.hex("content").alias("content_hex"),
    )


@register(
    "join_full",
    oracle="""
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    tags=("join", "outer"),
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — preserves customers with no orders AND orders
    with no customer (none in conformant data, but load-time orphans are
    exactly what the reference's unenforced FKs admit, SURVEY.md §1.2).
    Full outer can't broadcast: sort-merge on the key, one shuffle each
    side — the worst-case join shape, here on purpose."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "full_outer").select(
        F.coalesce(c.c_custkey, o.o_custkey).alias("custkey"),
        "c_name",
        "o_orderkey",
        "o_totalprice",
    )
