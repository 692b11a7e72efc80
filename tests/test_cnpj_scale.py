"""CNPJ parity at sf0.1-shaped volume (VERDICT r1 #7): 100k empresas /
250k estabelecimentos through the full pipeline — suffix routing,
latin-1 raw load WITH the partitionBy('uf') scale path, affinity views,
QUERY_FINAL — strict DuckDB-oracle compare at that size, plus the
partition-pruning evidence the uf layout exists for."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from etl_cnpjs_spark.cnpj import fixtures
from etl_cnpjs_spark.cnpj.flagship import (
    QUERY_FINAL,
    affinity_view_sql,
    register_affinity_views,
    run_flagship,
)
from etl_cnpjs_spark.cnpj.ingest import discover
from etl_cnpjs_spark.cnpj.load import load_raw_parquet, register_raw
from etl_cnpjs_spark.cnpj.schemas import DIM_COLUMNS, TABLE_COLUMNS

from tests.compare import assert_frames_match

N_EMPRESAS, N_ESTAB = 100_000, 250_000


@pytest.fixture(scope="module")
def cnpj_scale_env(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("cnpj_scale"))
    paths = fixtures.generate(
        base, seed=42, n_empresas=N_EMPRESAS, n_estab=N_ESTAB
    )
    routed = discover(os.path.join(base, "zips"))
    table_paths = load_raw_parquet(
        spark, routed, os.path.join(base, "raw"), partition_estab_by_uf=True
    )
    dim_routed = {t: paths[t] for t in DIM_COLUMNS}
    table_paths.update(
        load_raw_parquet(spark, dim_routed, os.path.join(base, "raw"))
    )
    register_raw(spark, table_paths)
    register_affinity_views(spark)

    con = duckdb.connect()
    for table, cols in TABLE_COLUMNS.items():
        frames = [
            pd.read_csv(
                p, sep=";", header=None, dtype=str, encoding="latin1", names=cols
            )
            for p in paths[table]
        ]
        con.register(f"raw_{table}", pd.concat(frames, ignore_index=True))
    for table in (
        "empresas",
        "estabelecimentos",
        "cnae",
        "municipios",
        "motivo_situacao_cadastral",
    ):
        con.execute(
            f"CREATE VIEW {table} AS {affinity_view_sql(table, 'raw_' + table)}"
        )
    yield {"table_paths": table_paths}, con
    con.close()


def test_flagship_parity_at_scale(spark, cnpj_scale_env):
    """Bit-exact QUERY_FINAL parity at 250k estabelecimentos — the same
    contract test_cnpj_parity pins at 2.5k, two orders of magnitude up
    (different join orders / shuffle partitioning must not change the
    result)."""
    env, con = cnpj_scale_env
    got = run_flagship(spark).toPandas()
    oracle = con.execute(QUERY_FINAL).df()
    assert len(got) > 1_000  # volume sanity: the filters keep a real slice
    assert_frames_match(got, oracle, "cnpj_flagship_scale")


def test_uf_partition_prunes_scan(spark, cnpj_scale_env):
    """The partitionBy('uf') layout replaces the reference's uf index
    (etl.py:181): a uf-equality filter must reach the scan as a
    PartitionFilter and read only that partition's files."""
    env, con = cnpj_scale_env
    estab_path = env["table_paths"]["estabelecimentos"]
    df = spark.read.parquet(estab_path)
    ufs = [r.uf for r in df.select("uf").distinct().collect()]
    assert len(ufs) > 3, "fixture should span several UFs"
    one = df.filter(df.uf == ufs[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the uf equality must land in PartitionFilters (directory pruning),
    # not as a post-scan data Filter
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and f"= {ufs[0]})" in pf[0], plan
    # layout sanity: the table is physically hive-partitioned by uf, so
    # pruning to one uf skips every other partition directory
    part_dirs = [
        d
        for d in os.listdir(estab_path.replace("file:", ""))
        if d.startswith("uf=")
    ]
    assert len(part_dirs) == len(ufs) > 3
    # and the partition column round-trips values correctly
    n_match = one.count()
    n_oracle = con.execute(
        "SELECT count(*) FROM raw_estabelecimentos WHERE uf = ?", [ufs[0]]
    ).fetchone()[0]
    assert n_match == n_oracle
