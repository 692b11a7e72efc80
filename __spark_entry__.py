"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine's plan registry
(etl_cnpjs_spark/plans/registry.py). Every implemented operator from
SURVEY.md §2 is a named plan with a Spark implementation and — when
SQL-expressible — a DuckDB oracle twin with identical column names and
bit-identical values (see registry module docstring for the determinism
rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_cnpjs_spark.plans import QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship star-join query (QUERY_FINAL analog, SURVEY.md §2.3) on
    sf0.001; driver checks rows > 0."""
    return QUERIES["flagship"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible plan.
    Keys absent here (sketches, LSH, streaming state) get the driver's
    weaker rows-only check."""
    # cnpj_flagship's oracle reads a staged feed (the CNPJ fixture drop
    # ingested reference-faithfully) rather than the testdata views —
    # publish it for the SF the oracle SQL embeds (size-keyed dir; the
    # driver's sf0.01 unless the local suite overrode it) before handing
    # the SQL out, so the oracle runs even if executed before the Spark
    # side.
    import os as _os

    from etl_cnpjs_spark.plans.cnpj_parity import _sizes_for, stage_oracle_feed

    stage_oracle_feed(
        _sizes_for(_os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "sf0.01"))
    )
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
