"""Declared CNPJ schemas — never inferred (SURVEY.md §1.2-1.3).

Column names and order are positional contracts from the reference
(ETLCNPJFinalEmpresaEstabelecimentos.py:38-53; DDL :118-163). The raw layer
is all-StringType, bit-faithful to the reference's ``dtype=str`` ingestion
(etl.py:87). The typed layer applies the §1.3 cast table; key columns that
the reference compares numerically via SQLite NUMERIC affinity
(etl.py:224-233) are listed in AFFINITY_KEYS so the flagship can emulate
that comparison without retyping the text columns.
"""

from __future__ import annotations

from pyspark.sql.types import StringType, StructField, StructType

# etl.py:38-42
COLUNAS_EMPRESAS = [
    "cnpj_basico",
    "razao_social",
    "natureza_juridica",
    "qualificacao_responsavel",
    "capital_social",
    "porte_empresa",
    "ente_federativo_responsavel",
]

# etl.py:44-53
COLUNAS_ESTABELECIMENTOS = [
    "cnpj_basico",
    "cnpj_ordem",
    "cnpj_dv",
    "identificador_matriz_filial",
    "nome_fantasia",
    "id_situacao_cadastral",
    "data_situacao_cadastro",
    "motivo_cadastral",
    "nome_da_cidade_no_exterior",
    "pais",
    "data_de_inicio_atividade",
    "id_cnae",
    "cnae_fiscal_secundaria",
    "tipo_do_logradouro",
    "logradouro",
    "numero",
    "complemento",
    "bairro",
    "cep",
    "uf",
    "id_municipio",
    "ddd1",
    "telefone1",
    "ddd2",
    "telefone2",
    "ddd_do_fax",
    "fax",
    "correio_eletronico",
    "situacao_especial",
    "data_da_situacao_especial",
]

# Dimension tables the reference assumes pre-exist (readme.md:149-159,
# FK/join sites etl.py:143-152,215-222, ER MER_BaseCNPJ.pdf p.1).
DIM_COLUMNS: dict[str, list[str]] = {
    "cnae": ["id_cnae", "descricao_cnae"],
    "municipios": ["id_municipio", "nome_municipio"],
    "motivo_situacao_cadastral": ["id_situacao_cadastral", "descricao_situacao_cadastral"],
    "natureza_juridica": ["natureza_juridica", "descricao"],
    "qualificacao_responsavel": ["codigo", "descricao"],
}

# Columns QUERY_FINAL joins/filters on; SQLite NUMERIC affinity makes these
# comparisons numeric even though every value enters as a string
# (SURVEY.md §1.3). The flagship's affinity views cast exactly these.
AFFINITY_KEYS: dict[str, list[str]] = {
    "empresas": ["cnpj_basico"],
    "estabelecimentos": ["cnpj_basico", "id_situacao_cadastral", "id_cnae", "id_municipio"],
    "cnae": ["id_cnae"],
    "municipios": ["id_municipio"],
    "motivo_situacao_cadastral": ["id_situacao_cadastral"],
}

TABLE_COLUMNS: dict[str, list[str]] = {
    "empresas": COLUNAS_EMPRESAS,
    "estabelecimentos": COLUNAS_ESTABELECIMENTOS,
    **DIM_COLUMNS,
}

# O8 suffix routing (etl.py:102-105): Receita Federal ships empresas shards
# as *.EMPRECSV and estabelecimentos shards as *.ESTABELE.
SUFFIX_TO_TABLE = {
    ".EMPRECSV": "empresas",
    ".ESTABELE": "estabelecimentos",
}


def raw_schema(table: str) -> StructType:
    """All-string declared schema for the raw layer."""
    return StructType([StructField(c, StringType(), True) for c in TABLE_COLUMNS[table]])
