"""SparkSession factory.

The reference is single-process/single-threaded (SQLite bytecode VM,
ETLCNPJFinalEmpresaEstabelecimentos.py:186); here every knob is chosen for
multi-executor scale and merely *tested* on local[N]:

- AQE on: runtime re-plan (broadcast promotion, skew-join splitting,
  partition coalescing) replaces the reference's hand-built secondary
  indexes (etl.py:176-182).
- shuffle.partitions sized to the local core count; on a real cluster this
  is overridden (or left to AQE coalescing) — the plans themselves never
  depend on a partition count.
- UTC session timezone so timestamp semantics are stable across engines
  (the DuckDB oracle runs timezone-naive).
- Arrow enabled: every Python-side exchange (pandas UDFs, toPandas) is
  columnar-batched, never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "etl-cnpjs-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Settings that matter at 100 TB and are safe at test scale:
    AQE + skew join handling, broadcast threshold left at default (10 MB)
    so dimension tables broadcast automatically, parquet filter pushdown on
    (default, asserted by tests via .explain).
    """
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.caseSensitive", "false")  # reference resolves
        # e.ID_MUNICIPIO against id_municipio (etl.py:224 vs :152)
    )
    return builder.getOrCreate()
