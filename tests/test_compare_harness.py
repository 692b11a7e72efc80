"""Regression tests for the comparison harness itself.

CORRECTNESS_r04 failed `tpch_q2` on the driver while the local sweep
called it exact: compare.canonical() used to fold Decimal into
float(v).hex(), collapsing a Spark DECIMAL(17,6) output against a
DuckDB DOUBLE oracle into one token. These tests pin the fixed
behavior: the harness must be at least as strict as the driver's
value-hash for every type class it can see at an output boundary.
No SparkSession needed — pure pandas frames.
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd
import pytest

from compare import assert_frames_match, canonical


def test_decimal_does_not_collapse_into_double():
    # The exact tpch_q2 class: same numeric value, different engine types.
    assert canonical(Decimal("223.450000")) != canonical(223.45)


def test_decimal_is_scale_preserving():
    # DECIMAL(17,6) vs DECIMAL(17,2) of the same value are different
    # output types; keep the harness able to see that too.
    assert canonical(Decimal("223.450000")) != canonical(Decimal("223.45"))


def test_equal_decimals_match():
    assert canonical(Decimal("10.50")) == canonical(Decimal("10.50"))


def test_frames_with_decimal_vs_double_mismatch_raise():
    spark_like = pd.DataFrame({"supplycost": [Decimal("223.450000")]})
    oracle_like = pd.DataFrame({"supplycost": [223.45]})
    with pytest.raises(AssertionError, match="value mismatch"):
        assert_frames_match(spark_like, oracle_like, "q2_regression")


def test_float_ulp_still_fails():
    import math

    a = pd.DataFrame({"x": [1.0]})
    b = pd.DataFrame({"x": [math.nextafter(1.0, 2.0)]})
    with pytest.raises(AssertionError):
        assert_frames_match(a, b, "ulp")


def test_identical_frames_pass():
    a = pd.DataFrame({"x": [1.5, 2.5], "y": ["a", "b"]})
    b = pd.DataFrame({"y": ["b", "a"], "x": [2.5, 1.5]})
    assert_frames_match(a, b, "ok")
