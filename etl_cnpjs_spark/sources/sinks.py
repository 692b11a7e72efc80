"""Sinks (SURVEY.md §2.2: sink_csv_bom / sink_parquet / sink_table).

The reference has three write paths — chunk-append CSV (O6,
ETLCNPJFinalEmpresaEstabelecimentos.py:89-93), SQLite table append (O10,
etl.py:171), and the final utf-8-sig CSV (O18, etl.py:187). Spark-side each
is one distributed `DataFrameWriter` call: parts written per task, committed
atomically (the reference's temp-file + os.replace dance, O7, is the commit
protocol). The reference's header-once append choreography disappears —
header handling is a writer option.

At 100 TB the sink IS the query's "fetch" (never collect(), SURVEY.md
§2.1 O17); these helpers therefore accept an optional partition spec so
large outputs land pruned (e.g. partitionBy('uf') replacing the uf index,
etl.py:181).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def sink_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> str:
    """Columnar sink — the engine's canonical persisted format (SURVEY.md
    §1.1: columnar is an upgrade the reference's semantics never forbid)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return path


def sink_csv(df: DataFrame, path: str, sep: str = ";", encoding: str = "UTF-8", header: bool = True, mode: str = "overwrite") -> str:
    """';'-separated CSV sink (O6/O18 shape). For the reference's exact
    single-file utf-8-sig artifact use cnpj.export.merge_single_file."""
    (
        df.write.mode(mode)
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("encoding", encoding)
        .csv(path)
    )
    return path


def sink_table(df: DataFrame, name: str, mode: str = "overwrite") -> str:
    """Managed-table sink (O9/O10: DROP+CREATE+append → one saveAsTable).
    Uses the session catalog (in-memory derby metastore on local; a real
    metastore on a cluster)."""
    df.write.mode(mode).format("parquet").saveAsTable(name)
    return name


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
