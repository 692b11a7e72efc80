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


def quantize(col, digits: int = 6):
    """Engine-portable decimal quantization of a double column:
    floor(x * 10^d + 0.5) / 10^d.

    NOT round(): when a double sits on a decimal half boundary, Spark's
    round() (BigDecimal HALF_UP over the shortest string repr) and
    DuckDB's (float multiply + native rounding) disagree about which
    neighbour to pick — a 1-in-thousands flip first observed on
    text_tfidf at sf0.1. floor over the SAME double is the same double
    in both engines, so plans quantize with this helper and oracles
    mirror it textually via quantize_sql()."""
    from pyspark.sql import functions as F

    scale = float(10**digits)
    return F.floor(col * scale + 0.5) / scale


def quantize_sql(expr: str, digits: int = 6) -> str:
    """DuckDB twin of quantize(): identical arithmetic, textual form."""
    scale = f"1e{digits}"
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
