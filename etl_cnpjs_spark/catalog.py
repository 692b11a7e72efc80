"""Table catalog over parquet directories.

The reference's catalog is one SQLite file with two loaded tables and five
assumed-preexisting dimension tables (readme.md:149-159). Here a "database"
is a directory of parquet tables; each table registers as a temp view so
both the DataFrame API and ``spark.sql`` reach it. Parquet (columnar,
min/max pruned, predicate-pushdown-able) replaces the row-oriented B-tree —
an upgrade the reference's semantics never contradict (SURVEY.md §1.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Driver-provided synthetic star schema (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (region and
# nation are bounded by the real world: 5 regions / 25 nations). customer /
# orders / part grow with the fact table — those joins must stay shuffle-able
# and are left to AQE to promote when small.
ALWAYS_BROADCAST = frozenset({"region", "nation"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table. Schema comes from the parquet footer —
    declared at write time, never re-inferred (SURVEY.md §1.2).

    ``events.ts`` is INT64 TIMESTAMP(NANOS) in the source parquet, which
    Spark's parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). We read nanos
    as long (runtime conf) and floor-divide to microseconds — the same
    truncation DuckDB applies when it narrows ns → its µs timestamps, so
    both engines see identical values.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_all(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES) -> None:
    """Register every catalog table as a temp view for spark.sql plans."""
    for name in names:
        if os.path.exists(table_path(sf_dir, name)):
            table(spark, sf_dir, name).createOrReplaceTempView(name)
