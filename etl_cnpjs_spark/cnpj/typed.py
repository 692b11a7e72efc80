"""Typed layer — the §1.3 cast table over the raw all-string tables.

The reference never types anything (SQLite affinity decides per value);
analytics over the registry need real types. Casts, all JVM-side built-ins
(no UDFs):

- identifier codes → BIGINT (TRY_CAST: garbage → NULL, like a failed
  affinity match);
- capital_social 'decimal-comma' → DECIMAL(16,2) via regexp_replace;
- yyyymmdd text → DATE via to_date (the ER diagram calls these DATE,
  MER_BaseCNPJ.pdf p.1; storage is text, etl.py:138-142);
- cnae_fiscal_secundaria comma-packed string → ARRAY<BIGINT>;
- free text trimmed (raw preserves the source's padding; typed trims —
  SURVEY.md §7.3 #5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EMP_CODE = ["cnpj_basico", "natureza_juridica", "qualificacao_responsavel"]
_EST_CODE = [
    "cnpj_basico",
    "identificador_matriz_filial",
    "id_situacao_cadastral",
    "motivo_cadastral",
    "pais",
    "id_cnae",
    "id_municipio",
    "ddd1",
    "telefone1",
    "ddd2",
    "telefone2",
    "ddd_do_fax",
    "fax",
]
_EST_DATE = ["data_situacao_cadastro", "data_de_inicio_atividade", "data_da_situacao_especial"]
_EST_TEXT = [
    "nome_fantasia",
    "nome_da_cidade_no_exterior",
    "tipo_do_logradouro",
    "logradouro",
    "complemento",
    "bairro",
    "uf",
    "correio_eletronico",
    "situacao_especial",
]


def _code(c: str):
    return F.col(c).try_cast("bigint").alias(c)


def typed_empresas(raw: DataFrame) -> DataFrame:
    out = raw
    for c in _EMP_CODE:
        out = out.withColumn(c, _code(c))
    return (
        out.withColumn(
            "capital_social",
            F.regexp_replace("capital_social", ",", ".").try_cast("decimal(16,2)"),
        )
        .withColumn("razao_social", F.trim("razao_social"))
        .withColumn("ente_federativo_responsavel", F.trim("ente_federativo_responsavel"))
    )


def typed_estabelecimentos(raw: DataFrame) -> DataFrame:
    out = raw
    for c in _EST_CODE:
        out = out.withColumn(c, _code(c))
    for c in _EST_DATE:
        out = out.withColumn(c, F.to_date(c, "yyyyMMdd"))
    for c in _EST_TEXT:
        out = out.withColumn(c, F.trim(c))
    return out.withColumn(
        "cnae_fiscal_secundaria",
        F.when(
            F.col("cnae_fiscal_secundaria").isNotNull(),
            F.transform(
                F.split("cnae_fiscal_secundaria", ","),
                lambda x: F.trim(x).try_cast("bigint"),
            ),
        ),
    )


def register_typed(spark: SparkSession, prefix: str = "raw_") -> None:
    """typed_empresas / typed_estabelecimentos temp views over the raw ones."""
    typed_empresas(spark.table(prefix + "empresas")).createOrReplaceTempView("typed_empresas")
    typed_estabelecimentos(spark.table(prefix + "estabelecimentos")).createOrReplaceTempView(
        "typed_estabelecimentos"
    )
