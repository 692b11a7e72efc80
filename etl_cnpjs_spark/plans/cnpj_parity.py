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
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession

from etl_cnpjs_spark.cnpj import fixtures
from etl_cnpjs_spark.cnpj.flagship import register_affinity_views, run_flagship
from etl_cnpjs_spark.cnpj.ingest import discover
from etl_cnpjs_spark.cnpj.load import load_raw_parquet, register_raw
from etl_cnpjs_spark.cnpj.schemas import DIM_COLUMNS
from etl_cnpjs_spark.plans.registry import register

# Fixture volume tracks the requested SF so the bench measures the
# flagship at real-shaped row counts (sf0.1 ≈ the suggested FIXTURES.md
# sizes ×100), while driver correctness (sf0.01) stays quick.
_SIZES = {"0.001": (1_000, 2_500), "0.01": (10_000, 25_000), "0.1": (100_000, 250_000)}

# applicationId → sizes currently registered in that session's views.
_env_cache: dict[str, tuple[int, int]] = {}


def _sizes_for(sf_dir: str) -> tuple[int, int]:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return _SIZES.get(m.group(1).rstrip(".") if m else "", _SIZES["0.001"])


def ensure_cnpj_env(spark: SparkSession, sf_dir: str) -> None:
    """Generate fixtures + raw-load + register views, once per
    (session, size) — staging, not query work (bench pre-warms it)."""
    sizes = _sizes_for(sf_dir)
    if _env_cache.get(spark.sparkContext.applicationId) == sizes:
        return
    base = tempfile.mkdtemp(prefix="cnpj_plan_")
    paths = fixtures.generate(
        base, seed=42, n_empresas=sizes[0], n_estab=sizes[1]
    )
    routed = discover(os.path.join(base, "zips"))
    table_paths = load_raw_parquet(spark, routed, os.path.join(base, "raw"))
    dim_routed = {t: paths[t] for t in DIM_COLUMNS}
    table_paths.update(
        load_raw_parquet(spark, dim_routed, os.path.join(base, "raw"))
    )
    register_raw(spark, table_paths)
    register_affinity_views(spark)
    _env_cache[spark.sparkContext.applicationId] = sizes


@register("cnpj_flagship", oracle=None, tags=("cnpj", "parity", "pipeline"))
def cnpj_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUERY_FINAL (etl.py:191-234) over the synthetic CNPJ drop — the
    CNPJ tables aren't part of the TPC-H-ish testdata, so sf_dir only
    sets fixture VOLUME (see _SIZES); generation + raw load run once
    per (session, size)."""
    ensure_cnpj_env(spark, sf_dir)
    return run_flagship(spark)
