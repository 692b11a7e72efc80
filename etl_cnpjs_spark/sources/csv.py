"""CSV scan (reference O4/O5: headerless ';'-separated latin-1, schema
stamped positionally — ETLCNPJFinalEmpresaEstabelecimentos.py:87-88).

The reference reads in 25,000-row pandas chunks purely for bounded memory
(etl.py:35, readme.md:106-118). In Spark the chunking disappears: the file
splits into partitions and each task streams its split — same bounded
memory, but parallel. Schemas are always *declared* (StructType or DDL
string), never inferred: inference costs an extra full read and can drift
(the reference's types are declared too, positionally).

Reader-option pinning (SURVEY.md §7.3 item 4): the CNPJ data is null-heavy
and pandas/SQLite treat missing as NULL → empty CSV field. We pin
``nullValue=''`` / ``emptyValue=''`` explicitly in the raw path so Spark's
empty-string-vs-null split is a deliberate choice, not a default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    sep: str = ";",
    encoding: str = "UTF-8",
    header: bool = False,
) -> DataFrame:
    """Scan CSV with a declared schema. For reference-parity raw reads use
    ``encoding='ISO-8859-1'`` and an all-string schema."""
    return (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("encoding", encoding)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_roundtrip_csv(df: DataFrame, path: str, sep: str = ";") -> None:
    """Write a headerless ';'-separated CSV dir (distributed write: one part
    file per task, committed atomically via Spark's commit protocol — the
    reference's write-temp-then-os.replace dance, O7, built in)."""
    df.write.mode("overwrite").option("sep", sep).option("header", "false").csv(path)
