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
