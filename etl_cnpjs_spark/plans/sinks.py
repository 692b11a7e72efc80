"""Sink plans — write-then-read-back round trips.

A sink has no result set of its own, so each plan materializes a
deterministic slice through the sink and returns the read-back DataFrame;
the oracle computes the same slice directly. Equality therefore proves the
round trip is lossless (schema + values), which is the sink property worth
testing — the reference's equivalent guarantee is "what to_csv wrote,
read_csv returns" (O6/O18) and "what to_sql appended, SELECT returns"
(O10).

CSV is the deliberately lossy-looking case: everything becomes text on
disk; the read-back declares the schema (never infers — SURVEY.md §1.2)
and must still reproduce bit-identical doubles (Java's shortest-round-trip
double formatting guarantees this).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.plans.registry import register
from etl_cnpjs_spark.sources.sinks import sink_csv, sink_parquet

_DEC = "decimal(27,6)"

# Small deterministic slice: one nation's customers (joins not needed —
# sinks are about the write path, not the plan above them).
_SLICE_SQL = """
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer WHERE c_nationkey IN (3, 7) AND c_acctbal > 0
"""


def _slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        c.filter(c.c_nationkey.isin(3, 7) & (c.c_acctbal > 0))
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    )


@register("sink_parquet", oracle=_SLICE_SQL)
def sink_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9-analog: parquet out, parquet back; schema travels in the footer."""
    out = os.path.join(tempfile.mkdtemp(prefix="sink_parquet_"), "slice.parquet")
    sink_parquet(_slice(spark, sf_dir), out)
    return spark.read.parquet(out)


@register("sink_csv_bom", oracle=_SLICE_SQL)
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6/O18-analog: ';' CSV with header out, declared-schema read back."""
    out = os.path.join(tempfile.mkdtemp(prefix="sink_csv_"), "slice_csv")
    sink_csv(_slice(spark, sf_dir), out)
    return (
        spark.read.schema(
            "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"
        )
        .option("sep", ";")
        .option("header", "true")
        .csv(out)
    )


@register(
    "sink_partitioned",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, c_nationkey
    FROM customer WHERE c_nationkey IN (3, 7)
    """,
)
def sink_partitioned_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout + partition pruning — the Spark
    answer to the reference's `idx_estab_uf` secondary index
    (etl.py:181, SURVEY.md §4.1): write customer partitioned by
    c_nationkey, read back with a nationkey predicate, and the scan
    touches ONLY the two matching directories (PartitionFilters in the
    plan, asserted by tests/test_plans.py). At 100 TB this is the
    difference between scanning 25 partitions and 2."""
    out = os.path.join(tempfile.mkdtemp(prefix="sink_part_"), "customer_by_nation")
    (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
        .write.mode("overwrite")
        .partitionBy("c_nationkey")
        .parquet(out)
    )
    df = spark.read.parquet(out).filter(F.col("c_nationkey").isin(3, 7))
    # partition column comes back from the directory name as the narrowest
    # inferred type — restore the source's int for schema parity
    return df.select(
        "c_custkey", "c_name", "c_acctbal", F.col("c_nationkey").cast("int").alias("c_nationkey")
    )


@register("scan_json", oracle=_SLICE_SQL)
def scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source round trip: write the slice as JSONL, read back
    with a DECLARED schema (never inferred — inference costs a full
    extra pass at 100 TB and can flip types between runs). Doubles
    survive via shortest-round-trip formatting, same guarantee as the
    CSV sink."""
    out = os.path.join(tempfile.mkdtemp(prefix="sink_json_"), "slice_json")
    _slice(spark, sf_dir).write.json(out)
    return spark.read.schema(
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"
    ).json(out)


@register(
    "udf_grouped_map",
    oracle="""
    SELECT c_custkey, c_nationkey,
           round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_nationkey), 6)
             AS bal_z
    FROM customer
    """,
    tags=("udf", "grouped_map"),
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-nation z-score normalization of
    account balance — whole-group-at-once Python (each group arrives as
    ONE pandas DataFrame over Arrow), the surface for group-local model
    scoring/fitting that window functions can't express. The oracle is
    the window-function formulation; round(6) absorbs summation-order
    drift between pandas and SQL aggregation. Scale caveat: a group must
    fit one worker's memory — partition-by keys need bounded
    cardinality-per-key (salt or pre-aggregate otherwise)."""
    import pandas as pd

    c = table(spark, sf_dir, "customer")

    def zscore(pdf: "pd.DataFrame") -> "pd.DataFrame":
        bal = pdf["c_acctbal"]
        z = (bal - bal.mean()) / bal.std(ddof=1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_nationkey": pdf["c_nationkey"],
                "bal_z": z.round(6),
            }
        )

    return (
        c.select("c_custkey", "c_nationkey", "c_acctbal")
        .groupBy("c_nationkey")
        .applyInPandas(zscore, "c_custkey bigint, c_nationkey int, bal_z double")
    )


@register(
    "sink_idempotent",
    oracle="""
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT)       AS n_rows,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum
    FROM customer WHERE c_nationkey IN (3, 7)
    GROUP BY c_nationkey
    """,
)
def sink_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2's idempotency (skip-if-exists download, etl.py:61-63) in its
    Spark-scale form: DYNAMIC partition overwrite. The same partitioned
    load runs TWICE into one target; with partitionOverwriteMode=dynamic
    each re-run replaces exactly the partitions it produces — no
    duplication, no truncation of untouched partitions. The read-back
    per-partition counts/checksums must equal a single clean load (the
    oracle) — re-run safety proved by construction. This is the
    recovery semantics a 1000-executor ingest needs: re-submit a failed
    day's job without wiping the table."""
    out = os.path.join(tempfile.mkdtemp(prefix="sink_idem_"), "by_nation")
    src = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(3, 7))
        .select("c_custkey", "c_acctbal", "c_nationkey")
    )
    writer = (
        src.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("c_nationkey")
    )
    writer.parquet(out)
    writer.parquet(out)  # identical re-run: must be a no-op net effect
    return (
        spark.read.parquet(out)
        .groupBy(F.col("c_nationkey").cast("int").alias("c_nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("c_custkey").alias("key_sum"),
        )
    )


@register(
    "sink_compact",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)      AS n_rows,
           CAST(4 AS BIGINT)             AS n_files,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum
    FROM customer WHERE c_nationkey IN (3, 7) AND c_acctbal > 0
    """,
)
def sink_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction — the maintenance pass every long-lived
    100 TB table needs (streaming/append writers leave thousands of tiny
    files; scan cost is per-file). Rewrite the slice into exactly 4
    target files (repartition(4); in production: maxRecordsPerFile or
    AQE-coalesced rewrite), then PROVE both properties from the read
    side: row/values survive (count + key checksum) and the layout is 4
    files (distinct input_file_name — metadata the oracle pins as a
    literal)."""
    out = os.path.join(tempfile.mkdtemp(prefix="sink_compact_"), "compacted")
    _slice(spark, sf_dir).repartition(4).write.parquet(out)
    back = spark.read.parquet(out).withColumn("__f", F.input_file_name())
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("__f").alias("n_files"),
        F.sum("c_custkey").alias("key_sum"),
    )


@register("sink_table", oracle=_SLICE_SQL)
def sink_table_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O10-analog: saveAsTable into the session catalog (external table —
    data lands in a temp dir, not the warehouse), read via spark.table.
    Unique name per run so concurrent or repeated runs never collide."""
    tmp = tempfile.mkdtemp(prefix="sink_table_")
    name = "sink_rt_" + os.path.basename(tmp).removeprefix("sink_table_")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        _slice(spark, sf_dir)
        .write.mode("overwrite")
        .format("parquet")
        .option("path", os.path.join(tmp, "data"))
        .saveAsTable(name)
    )
    return spark.table(name)


@register(
    "agg_incremental",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS {_DEC})) AS DOUBLE) AS total_price,
           CAST(SUM(CAST(o_totalprice AS {_DEC})) AS DOUBLE) / count(*) AS avg_price
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "incremental", "sink"),
)
def agg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregation — the nightly-pipeline state pattern: keep
    per-group PARTIAL aggregates (count + decimal sum, both mergeable) as
    a state table; when a delta arrives, aggregate ONLY the delta and
    merge with the state by re-summing; derive non-mergeable metrics
    (avg) at read time. The oracle is the full recompute over all data —
    equivalence proved every run. At 100 TB the delta is one day's
    partition, so the nightly cost is O(delta), not O(history). Here the
    'history' is orders before 1999, the 'delta' everything after."""
    o = table(spark, sf_dir, "orders")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(_DEC)).alias("s"),
        )

    state_dir = os.path.join(tempfile.mkdtemp(prefix="agg_incr_"), "state")
    partial(o.filter(F.col("o_orderdate") < "1999-01-01")).write.parquet(state_dir)
    state = spark.read.parquet(state_dir)
    delta = partial(o.filter(F.col("o_orderdate") >= "1999-01-01"))
    merged = (
        state.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(F.sum("n").alias("n_orders"), F.sum("s").alias("s"))
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        F.col("s").cast("double").alias("total_price"),
        (F.col("s").cast("double") / F.col("n_orders")).alias("avg_price"),
    )


@register(
    "scan_text",
    oracle="""
    SELECT md5(text) AS line_digest, length(text) AS n_chars
    FROM documents
    """,
    tags=("scan", "text"),
)
def scan_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text source: write the corpus as plain text (one doc
    per line — the log-file / pre-JSONL shape), read it back with
    spark.read.text, and prove byte fidelity by digesting every line.
    The oracle digests the original documents directly, so any encoding,
    trimming, or line-splitting defect in the text round-trip breaks the
    match. (Docs are single-line by construction; a real log pipeline
    would keep it that way by writing JSONL.)"""
    out = os.path.join(tempfile.mkdtemp(prefix="scan_text_"), "lines")
    d = table(spark, sf_dir, "documents").select(F.col("text").alias("value"))
    d.write.text(out)
    back = spark.read.text(out)
    return back.select(
        F.md5("value").alias("line_digest"),
        F.length("value").alias("n_chars"),
    )
