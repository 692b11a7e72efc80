"""agg_target_encode accumulation-regime boundary (r7 verdict item 5).

The r7 noop-materialized 100x stress found the int64 LOO form's
(s - cents) * 1e6 overflowing int64 under ANSI at ~3e6 rows/category —
exactly the docstring's predicted past-sf1 boundary. The registered plan
was promoted to DECIMAL(38,0) window accumulation (bit-identical below
the boundary, ~1e38 headroom above). These tests pin BOTH sides of that
contract on a synthetic category whose pairwise sums cross 2^63/1e6:

- the registered (DECIMAL) plan returns the exact python-int answer;
- the retired int64 form fails loudly under ANSI on the same input
  (if this ever stops raising, the boundary moved — re-adjudicate).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from etl_cnpjs_spark.plans import QUERIES

# three orders in one category, totalprice ~6e10 => cents ~6e12 (exact
# in double: < 2^53); the INTERMEDIATE product (s - cents) * 1e6 ~
# 1.25e19 > 2^63 overflows int64, while the output quotient
# product / (n-1) ~ 6.3e18 still FITS — isolating the accumulation
# boundary from the output type
_PRICES = [61_111_111_111.0, 62_222_222_222.0, 63_333_333_333.0]


@pytest.fixture(scope="module")
def big_orders_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tenc_boundary")
    pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [1, 1, 1],
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": _PRICES,
            "o_orderdate": pd.to_datetime(["2024-01-01"] * 3).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * 3,
            "o_clerk": ["c"] * 3,
            "o_shippriority": [0] * 3,
            "o_comment": ["x"] * 3,
        }
    ).to_parquet(d / "orders.parquet", index=False)
    return str(d)


def _expected():
    cents = [math.floor(p * 100 + 0.5) for p in _PRICES]
    s = sum(cents)
    return {
        k + 1: (s - c) * 1_000_000 // (len(cents) - 1)
        for k, c in enumerate(cents)
    }


def test_decimal_form_exact_past_int64_boundary(spark, big_orders_dir):
    rows = QUERIES["agg_target_encode"].fn(spark, big_orders_dir).collect()
    got = {r.o_orderkey: r.loo_mean_microcents for r in rows}
    exp = _expected()
    assert got == exp
    # the intermediate products really cross the int64 boundary while
    # every output quotient still fits (n - 1 == 2 here)
    assert all(v * 2 > 2**63 and v < 2**63 for v in exp.values())


def test_int64_form_overflows_at_boundary(spark, big_orders_dir):
    """The retired fast path raises under ANSI on the same input — the
    documented contract that motivated the DECIMAL promotion."""
    from etl_cnpjs_spark.catalog import table

    o = table(spark, big_orders_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    w = W.partitionBy("o_orderpriority")
    int64_form = (
        o.withColumn("s", F.sum("cents").over(w))
        .withColumn("n", F.count(F.lit(1)).over(w))
        .filter(F.col("n") > 1)
        .select(
            F.expr("CAST((s - cents) * 1000000 DIV (n - 1) AS BIGINT)").alias("loo")
        )
    )
    if spark.conf.get("spark.sql.ansi.enabled") == "true":
        with pytest.raises(Exception, match="(?i)overflow|arithmetic"):
            int64_form.collect()
    else:
        # non-ANSI sessions wrap silently — the worse failure mode the
        # DECIMAL promotion exists to rule out
        got = {r.loo for r in int64_form.collect()}
        assert got != set(_expected().values())
