"""The correctness gate, locally: every registered plan runs on Spark at
sf0.01 and (when an oracle exists) must match DuckDB bit-for-bit,
order-insensitively — a stricter local version of the driver's
CORRECTNESS_r{N}.json check."""

from __future__ import annotations

import pytest

from etl_cnpjs_spark.plans import QUERIES
from tests.compare import assert_frames_match


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, oracle_con, sf_dir):
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        # rows-only check (sketches / LSH / streaming state)
        assert len(spark_pdf.columns) > 0
        assert len(spark_pdf) >= 0  # must at least evaluate
        return
    oracle_pdf = oracle_con.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.schema) == 20


def test_contract_shape():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())
    assert all(
        isinstance(s, str) and s.strip().upper().startswith(("SELECT", "WITH"))
        for s in o.values()
    )
