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

    Timestamp normalization (the driver regenerates the testdata between
    rounds and has shipped two physical encodings so far):

    - INT64 TIMESTAMP(NANOS) (round-1 ``events.ts``): Spark's reader
      rejects it ([PARQUET_TYPE_ILLEGAL]); read nanos as long (runtime
      conf) and floor-divide to microseconds — the same truncation DuckDB
      applies when it narrows ns → µs.
    - naive µs (``isAdjustedToUTC=false``, round-2 ``events.ts`` /
      ``l_shipdate`` / ``o_orderdate``): Spark reads TIMESTAMP_NTZ, which
      fails analysis against TIMESTAMP literals/functions used throughout
      the plans. Cast to session-tz TIMESTAMP; this environment (and the
      driver) run with tz=UTC so the wall-clock values are preserved
      bit-exactly and match DuckDB's naive reading.

    Every plan goes through this loader, so the normalization happens in
    exactly one place and the rest of the engine sees one timestamp type.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_all(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES) -> None:
    """Register every catalog table as a temp view for spark.sql plans."""
    for name in names:
        if os.path.exists(table_path(sf_dir, name)):
            table(spark, sf_dir, name).createOrReplaceTempView(name)
