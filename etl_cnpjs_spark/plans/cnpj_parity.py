"""Reference-parity surface as a registered plan: the ENTIRE CNPJ
pipeline — synthetic fixture ZIP/CSV drop (FIXTURES.md), suffix routing
(etl.py:97-110), latin-1 headerless ';' ingestion with declared schemas
(etl.py:87, 38-53), SQLite-affinity emulation views (etl.py:118-163),
and the verbatim QUERY_FINAL star join (etl.py:191-234) — executed end
to end inside one queries() key.

The driver's testdata has no CNPJ tables, so this plan generates its
fixtures in a temp dir and carries no DuckDB oracle (rows-only driver
check); the STRICT oracle comparison lives in tests/test_cnpj_parity.py,
which replays the same pipeline through a reference-faithful pandas →
DuckDB path and demands bit-identical output, including the golden-quirk
surface (decimal-comma capital, yyyymmdd text dates, padded municipio
names, IN-list dedup, orphan-dropping inner joins).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from etl_cnpjs_spark.cnpj import fixtures
from etl_cnpjs_spark.cnpj.flagship import register_affinity_views, run_flagship
from etl_cnpjs_spark.cnpj.ingest import discover
from etl_cnpjs_spark.cnpj.load import load_raw_parquet, register_raw
from etl_cnpjs_spark.cnpj.schemas import DIM_COLUMNS
from etl_cnpjs_spark.plans.registry import register

_env_cache: dict[str, bool] = {}


@register("cnpj_flagship", oracle=None, tags=("cnpj", "parity", "pipeline"))
def cnpj_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUERY_FINAL (etl.py:191-234) over the synthetic CNPJ drop —
    ignores sf_dir (the CNPJ tables aren't part of the TPC-H-ish
    testdata); fixture generation + raw load run once per session."""
    if spark.sparkContext.applicationId not in _env_cache:
        base = tempfile.mkdtemp(prefix="cnpj_plan_")
        paths = fixtures.generate(base, seed=42)
        routed = discover(os.path.join(base, "zips"))
        table_paths = load_raw_parquet(spark, routed, os.path.join(base, "raw"))
        dim_routed = {t: paths[t] for t in DIM_COLUMNS}
        table_paths.update(
            load_raw_parquet(spark, dim_routed, os.path.join(base, "raw"))
        )
        register_raw(spark, table_paths)
        register_affinity_views(spark)
        _env_cache[spark.sparkContext.applicationId] = True
    return run_flagship(spark)
