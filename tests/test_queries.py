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


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_complex_toplevel_columns(name, spark, sf_dir):
    """Driver-boundary contract: the driver's canonicalizer sorts every
    output column with pandas (CORRECTNESS harness); raw array/map/struct
    top-level columns raise `unhashable type: 'list'` there (the round-1
    fn_array_ops FAIL). Complex intermediates are fine — they must leave
    the plan exploded or array_join'ed."""
    df = QUERIES[name].fn(spark, sf_dir)
    complex_cols = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    assert complex_cols == [], (
        f"{name} emits driver-unsortable top-level columns: {complex_cols}"
    )


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


def test_weighted_mix_hits_target_rates(spark):
    """Statistical check at the largest SF: each language's realized keep
    rate must be close to its target (multiplicative hashing is a good
    PRF; tolerance is generous because strata are hundreds-to-thousands
    of docs)."""
    import os

    import pytest

    from etl_cnpjs_spark.plans import QUERIES
    from etl_cnpjs_spark.plans.corpus import _MIX_RATES
    from etl_cnpjs_spark.catalog import table, table_path

    sf = "/root/testdata/sf0.1"  # largest staged SF: the statistical check
    if not os.path.exists(table_path(sf, "documents")):
        pytest.skip("sf0.1 testdata not staged on this box")
    totals = {
        r["lang"]: r["n"]
        for r in table(spark, sf, "documents").groupBy("lang").count()
        .withColumnRenamed("count", "n").collect()
    }
    kept = {
        r["lang"]: r["n"]
        for r in QUERIES["sample_weighted_mix"].fn(spark, sf).groupBy("lang").count()
        .withColumnRenamed("count", "n").collect()
    }
    for lang, rate in _MIX_RATES.items():
        if lang not in totals:  # driver regenerated data without this lang
            continue
        realized = kept.get(lang, 0) / totals[lang]
        assert abs(realized - rate) < 0.08, (lang, realized, rate)


def test_approx_topk_regime_is_exact(spark):
    """agg_approx_topk's GROUP BY oracle is an equality only while
    event_type cardinality stays under the sketch's k=64 — pin the
    regime so a testdata regeneration that blows past it fails loudly
    here instead of as a driver-row mismatch."""
    from etl_cnpjs_spark.catalog import table
    from tests.conftest import SF_DIR

    n = table(spark, SF_DIR, "events").select("event_type").distinct().count()
    assert n <= 64, f"event_type cardinality {n} exceeds the sketch k"
