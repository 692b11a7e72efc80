"""Query registry: every engine capability lands here as a named plan.

Each entry pairs
  - a Spark plan: Callable[(SparkSession, sf_dir) -> DataFrame], and
  - (when SQL-expressible) a DuckDB oracle: ANSI SQL over the same parquet
    tables, producing identical column names and bit-identical values.

The registry IS the contract surface exported by __spark_entry__.py
(queries() / oracle_sql()); it is also what the test harness iterates.

Determinism rules every plan follows (so order-insensitive value-hashes
match the oracle):
- every computed column is aliased identically on both sides;
- double-typed SUM/AVG go through DECIMAL accumulation, then cast back to
  double: exact, order-insensitive, identical across engines (a plain
  double sum is partition-order-dependent in Spark);
- top-k / window orderings are total orders (unique-key tiebreakers);
- no reliance on row order anywhere (the driver's hash is
  order-insensitive; the reference's golden CSV is unordered too,
  SURVEY.md §2.3).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver records weaker rows-only check
    tags: tuple[str, ...] = ()


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a plan to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco
