"""Physical-layout scale strategies as working, oracle-checked plans:
bucketed co-located joins and salted skew joins.

The reference's only physical design is 4 SQLite secondary indexes
(ETLCNPJFinalEmpresaEstabelecimentos.py:176-182). Spark has no indexes;
its equivalents for the big-big join at 100 TB are exactly these two:

- **Bucketing** (join_bucketed): pre-shuffle both tables into the same
  bucket layout ON WRITE, so every subsequent join/aggregate on the
  bucket key runs with ZERO exchange — the write cost is paid once, every
  downstream query reuses it. This is the Spark analog of the reference's
  `empresas(cnpj_basico)` + `estabelecimentos(cnpj_basico)` index pair.
  tests/test_plans.py asserts the joined plan really has no shuffle.

- **Salting** (join_skew_salted): a hot key floods one reducer in a
  shuffled join. Appending a deterministic salt ∈ [0,S) to the fact side
  and replicating the other side S× splits each key across S tasks.
  Result set is provably identical to the plain join (oracle = plain SQL
  join); only the key distribution changes. AQE's skew-join splitting
  (on in session.py) handles moderate skew automatically — explicit
  salting is the fallback for pathological keys.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.plans.registry import register

N_BUCKETS = 8
SALT = 8


def write_bucketed(
    df: DataFrame, name: str, key: str, n_buckets: int = N_BUCKETS
) -> None:
    """Persist df as a managed table bucketed+sorted by key — the
    pay-once layout for co-located joins on that key."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # a previous session's in-memory catalog forgot the table but its
    # warehouse directory survives; saveAsTable refuses to reuse it
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(warehouse, name.lower()), ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(name)
    )


@register(
    "join_bucketed",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_name, c.c_acctbal
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    tags=("join", "layout", "bucketed"),
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer on c_custkey with BOTH sides pre-bucketed by the
    join key: the join plan contains no Exchange (asserted by
    tests/test_plans.py) — each task reads bucket i of both tables and
    joins locally. At 100 TB this turns the nightly big-big join from the
    cluster's largest shuffle into a scan."""
    write_bucketed(table(spark, sf_dir, "orders"), "bkt_orders", "o_custkey")
    write_bucketed(table(spark, sf_dir, "customer"), "bkt_customer", "c_custkey")
    o = spark.table("bkt_orders")
    c = spark.table("bkt_customer")
    # MERGE hint: at test SF the planner would broadcast the small side
    # (also shuffle-free, but it hides the point); the hint pins the
    # big-big strategy this layout exists for — sort-merge over matching
    # bucket files, no exchange on either side.
    return o.join(c.hint("merge"), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_acctbal"
    )


@register(
    "join_skew_salted",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice, o.o_totalprice
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    tags=("join", "layout", "skew"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders with an explicit salt: fact rows get
    salt = l_linenumber % S (deterministic, no rand()), the orders side is
    exploded S× with every salt value, and the join key becomes
    (orderkey, salt). Each hot orderkey's rows now spread over S reducer
    partitions. Output ≡ the plain equi-join — the oracle IS the plain
    join, which proves salting is result-transparent."""
    l = table(spark, sf_dir, "lineitem").withColumn(
        "__salt", (F.col("l_linenumber") % SALT).cast("int")
    )
    o = table(spark, sf_dir, "orders").withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
    )
    return l.join(
        o, (l.l_orderkey == o.o_orderkey) & (l["__salt"] == o["__salt"])
    ).select("l_orderkey", "l_linenumber", "l_extendedprice", "o_totalprice")


# --- Z-order clustering -----------------------------------------------------
#
# Multi-dimensional clustering via bit-interleaved Z-values — the from-
# first-principles analog of Delta/Iceberg `OPTIMIZE ZORDER BY (a, b)`.
# A table sorted on ONE key skips files only for predicates on that key;
# sorting by the interleaved Z-value clusters BOTH dimensions at once, so
# file-level min/max stats prune range queries on either column. The
# reference's nearest concept is its pair of single-column indexes
# (ETLCNPJFinalEmpresaEstabelecimentos.py:178-180) — which, like a linear
# sort, each serve exactly one dimension.

_ZB = 10  # bits per normalized dimension (domain scaled to [0, 1024))
_ZTILE_SHIFT = 2 * _ZB - 6  # keep top 3+3 interleaved bits -> 64 z-tiles
_PROBE_LO, _PROBE_HI = 256, 511  # probe = one quarter of either domain


def z_value_expr(xs: str, ys: str, bits: int = _ZB) -> str:
    """Bit-interleave SQL expression, valid in BOTH Spark SQL and DuckDB
    (`>> & <<` operators agree): x bits land on even positions, y on odd."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xs} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ys} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_Z_ORACLE = f"""
    WITH base AS (SELECT l_orderkey AS x, l_partkey AS y FROM lineitem),
    st AS (SELECT min(x) AS minx, max(x) AS maxx,
                  min(y) AS miny, max(y) AS maxy FROM base),
    norm AS (SELECT ((x - minx) * {2**_ZB}) // (maxx - minx + 1) AS xs,
                    ((y - miny) * {2**_ZB}) // (maxy - miny + 1) AS ys
             FROM base, st),
    zed AS (SELECT xs, ys, {z_value_expr("xs", "ys")} AS z FROM norm)
    SELECT z >> {_ZTILE_SHIFT} AS zbucket,
           COUNT(*) AS n,
           MIN(xs) AS min_xs, MAX(xs) AS max_xs,
           MIN(ys) AS min_ys, MAX(ys) AS max_ys,
           (MIN(xs) <= {_PROBE_HI} AND MAX(xs) >= {_PROBE_LO}) AS hit_x,
           (MIN(ys) <= {_PROBE_HI} AND MAX(ys) >= {_PROBE_LO}) AS hit_y
    FROM zed GROUP BY zbucket
"""


@register(
    "layout_zorder",
    oracle=_Z_ORACLE,
    tags=("layout", "zorder"),
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering planner: normalize (l_orderkey, l_partkey) to
    10-bit ranks, interleave to a 20-bit Z-value, group into 64 z-tiles
    (the file grain), and report per-tile min/max of both dimensions plus
    whether a quarter-domain probe on EACH dimension overlaps the tile.
    Under Z-order a single-dimension probe overlaps ~probe_fraction of
    tiles on its own axis (16/64 here) instead of all of them — the
    tests write the tiles as real parquet files via repartitionByRange(z)
    and re-derive the same skipping from file-level stats.

    Physical shape: one tiny stats agg broadcast back over the scan, then
    one hash aggregate on zbucket; the Z-arithmetic is pure codegen
    (shift/mask), no UDF."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("x"), F.col("l_partkey").alias("y")
    )
    st = li.agg(
        F.min("x").alias("minx"),
        F.max("x").alias("maxx"),
        F.min("y").alias("miny"),
        F.max("y").alias("maxy"),
    )
    norm = li.crossJoin(F.broadcast(st)).selectExpr(
        f"((x - minx) * {2**_ZB}) div (maxx - minx + 1) AS xs",
        f"((y - miny) * {2**_ZB}) div (maxy - miny + 1) AS ys",
    )
    zed = norm.selectExpr("xs", "ys", f"{z_value_expr('xs', 'ys')} AS z")
    return zed.selectExpr(f"z >> {_ZTILE_SHIFT} AS zbucket", "xs", "ys").groupBy("zbucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("xs").alias("min_xs"),
        F.max("xs").alias("max_xs"),
        F.min("ys").alias("min_ys"),
        F.max("ys").alias("max_ys"),
        ((F.min("xs") <= _PROBE_HI) & (F.max("xs") >= _PROBE_LO)).alias("hit_x"),
        ((F.min("ys") <= _PROBE_HI) & (F.max("ys") >= _PROBE_LO)).alias("hit_y"),
    )


def zorder_write(spark: SparkSession, sf_dir: str, out: str, n_files: int = 32) -> None:
    """Materialize the Z-ordered layout: range-partition by Z-value into
    n_files contiguous z-runs, sort within, write parquet — exactly what
    OPTIMIZE ZORDER does. Used by tests/test_zorder.py to prove file-level
    skipping on both dimensions from read-side stats."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("x"), F.col("l_partkey").alias("y")
    )
    st = li.agg(
        F.min("x").alias("minx"),
        F.max("x").alias("maxx"),
        F.min("y").alias("miny"),
        F.max("y").alias("maxy"),
    )
    norm = li.crossJoin(F.broadcast(st)).selectExpr(
        "x",
        "y",
        f"((x - minx) * {2**_ZB}) div (maxx - minx + 1) AS xs",
        f"((y - miny) * {2**_ZB}) div (maxy - miny + 1) AS ys",
    )
    zed = norm.selectExpr("x", "y", "xs", "ys", f"{z_value_expr('xs', 'ys')} AS z")
    (
        zed.repartitionByRange(n_files, F.col("z"))
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(out)
    )
