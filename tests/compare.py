"""Spark-vs-DuckDB comparison harness, mirroring (conservatively) the
driver's correctness gate: row count + column names + order-insensitive
value comparison.

We hold ourselves to a stricter bar than any reasonable hash: values must
be *identical* after canonicalization (floats compared via full-precision
hex, so a single ulp of drift fails; Decimal is canonicalized
scale-preserving and NEVER folded into float, so decimal-vs-double
output-type divergence between the engines fails here too). If this
harness passes, any order-insensitive hash over sanely-normalized values
passes too.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import numpy as np
import pandas as pd


def canonical(v) -> str:
    """Canonical string for one cell, recursing into arrays/structs."""
    if v is None:
        return "∅"
    if isinstance(v, float) and math.isnan(v):
        return "∅"
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, float):
        # full precision: a single ulp difference must be visible
        return "f:" + v.hex()
    if isinstance(v, (np.integer,)):
        return "i:" + str(int(v))
    if isinstance(v, (int,)) and not isinstance(v, bool):
        return "i:" + str(v)
    if isinstance(v, bool):
        return "b:" + str(v)
    if isinstance(v, Decimal):
        # Scale-preserving and type-distinguishing: a DECIMAL(17,6)
        # Decimal('223.450000') must NOT collapse into the same token as
        # the double 223.45 — the driver's value-hash distinguishes the
        # two Python types, and folding them here (as an earlier
        # float(v).hex() canonicalization did) masked exactly the
        # tpch_q2 failure in CORRECTNESS_r04. A plan whose output
        # boundary leaks a raw Spark decimal against a DuckDB DOUBLE
        # oracle now fails locally too.
        return "dec:" + str(v)
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return "t:" + v.isoformat()
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return "t:" + v.isoformat()
    if isinstance(v, _dt.date):
        return "d:" + v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canonical(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canonical(v[k])}" for k in sorted(v)) + "}"
    if v is pd.NaT:
        return "∅"
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    return "s:" + str(v)


def normalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Column-name-sorted, canonicalized, row-sorted representation."""
    cols = sorted(df.columns)
    rows = [tuple(canonical(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return rows


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    assert s_cols == o_cols, f"{name}: column mismatch spark={s_cols} oracle={o_cols}"
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count mismatch spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows, o_rows = normalize(spark_pdf), normalize(oracle_pdf)
    if s_rows != o_rows:
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
        raise AssertionError(
            f"{name}: value mismatch in {len(diffs)}/{len(s_rows)} rows; "
            f"first diff:\n spark:  {diffs[0][0]}\n oracle: {diffs[0][1]}\n cols:   {s_cols}"
        )
