"""Python UDTF surface (Spark 3.5+/4.x): one row in, many rows out, with
per-row Python logic — the third member of the UDF / UDAF / UDTF triple
(`udf_cnpj_format` / `udf_grouped_map` cover the first two).

Use a UDTF only when the fan-out logic genuinely needs Python: the
bigram expansion here is deliberately ALSO expressible relationally
(doc_chunk's sequence+slice pattern), which is what makes a bit-exact
DuckDB oracle possible — the oracle proves the UDTF path produces
exactly what the relational path would, so swapping either way is safe.
At 100 TB prefer the relational form (whole-stage codegen, no Python
workers); the UDTF is the escape hatch for logic Catalyst can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.plans.registry import register
from etl_cnpjs_spark.serde import pickle_by_value


@udtf(returnType="pos int, gram string")
class _BigramUDTF:
    """Yield (0-based position, space-joined bigram) per whitespace token
    pair. Mirrors functions/text.py::tokens' split semantics."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        toks = text.strip().split()
        for i in range(len(toks) - 1):
            yield i, toks[i] + " " + toks[i + 1]


@register(
    "udtf_bigrams",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents)
    SELECT doc_id,
           CAST(u.i - 1 AS INT)  AS pos,
           u.gram                AS gram
    FROM (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(toks) - 1),
               i -> {'i': i, 'gram': toks[i] || ' ' || toks[i + 1]})) AS u
      FROM t) s
    """,
    tags=("udtf", "text"),
)
def udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional bigram expansion via Python UDTF + SQL LATERAL join.
    Arrow-batched rows stream through the Python worker; empty and
    single-token docs yield no rows (inner lateral semantics) on both
    engines."""
    spark.udtf.register("__udtf_bigrams", _BigramUDTF)
    table(spark, sf_dir, "documents").createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, b.pos, b.gram
        FROM __udtf_docs d, LATERAL __udtf_bigrams(d.text) AS b
        """
    )


# --- udtf_polymorphic --------------------------------------------------------
#
# Polymorphic Python UDTF (Spark 4 analyze() API): the OUTPUT SCHEMA is
# computed at ANALYSIS time from a constant argument — the extension
# point for generic expanders (split-to-N-columns, parse-to-schema)
# that a fixed returnType UDTF cannot express. Here: the first N=3
# whitespace tokens of each document become typed columns; the oracle
# is plain list indexing.


class _FirstTokensUDTF:
    @staticmethod
    def analyze(text, n):
        from pyspark.sql.types import StructType
        from pyspark.sql.udtf import AnalyzeResult

        assert n.isConstantExpression, "n must be a literal"
        schema = StructType()
        for i in range(n.value):
            schema = schema.add(f"tok{i + 1}", "string")
        return AnalyzeResult(schema=schema)

    def eval(self, text, n):
        parts = (text or "").strip().split()
        yield tuple(
            (parts[i] if i < len(parts) else None) for i in range(n)
        )


@register(
    "udtf_polymorphic",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           CASE WHEN len(toks) >= 1 AND toks[1] <> '' THEN toks[1] END AS tok1,
           CASE WHEN len(toks) >= 2 THEN toks[2] END AS tok2,
           CASE WHEN len(toks) >= 3 THEN toks[3] END AS tok3
    FROM t
    """,
    tags=("udtf", "text"),
)
def udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-3-token columns via an analyze()-schema'd UDTF in a
    LATERAL join. The schema (tok1..tok3) exists only because the
    literal 3 is visible at analysis time — the polymorphic half of
    the UDTF surface (udtf_bigrams covers the fixed-schema half).
    Empty docs yield a row of NULLs (python split() of '' is [] —
    mirrored by the oracle's empty-token guard)."""
    spark.udtf.register("__udtf_first_toks", udtf(_FirstTokensUDTF))
    table(spark, sf_dir, "documents").filter(
        "doc_id < 300"
    ).createOrReplaceTempView("__udtf_docs_poly")
    return spark.sql(
        """
        SELECT d.doc_id, t.tok1, t.tok2, t.tok3
        FROM __udtf_docs_poly d,
             LATERAL __udtf_first_toks(d.text, 3) AS t
        """
    )


pickle_by_value(__name__)
