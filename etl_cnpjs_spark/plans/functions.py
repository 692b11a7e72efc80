"""Scalar function plans (SURVEY.md §2.2 fn_*): string / date / math /
array / JSON surfaces, plus the CNPJ check-digit pandas UDF — the one
piece of domain compute worth leaving the JVM for (everything else stays
inside whole-stage codegen).

The reference computes none of these (its dates stay yyyymmdd text,
etl.py:138-142; its money stays decimal-comma text, SURVEY.md §1.3) — but
its *data* demands them, so the engine surfaces each family explicitly.

Oracle-determinism notes:
- regexp_replace: Spark replaces all matches; DuckDB needs the 'g' flag —
  every oracle spells it.
- ln/sqrt go through quantize(…, 6) (floor-based): libm vs JVM may drift an ulp.
- integer '/' yields double in both engines (same IEEE division of the
  same ints → bit-identical).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.plans.registry import quantize, register
from etl_cnpjs_spark.serde import pickle_by_value

# the CNPJ pandas UDF below ships to Python workers — serialize this
# module's functions by value so executors need no package install
pickle_by_value(__name__)


@register(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                                   AS name_upper,
           trim(c_name)                                    AS name_trim,
           length(c_name)                                  AS name_len,
           substr(c_name, 1, 8)                            AS name_prefix,
           replace(c_name, '#', '-')                       AS name_dash,
           regexp_replace(c_name, '[0-9]+', 'N', 'g')      AS name_masked,
           concat_ws('|', c_mktsegment, c_name)            AS seg_name,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0')       AS key_padded
    FROM customer
    """,
    tags=("fn", "string"),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String kernel: the ops the CNPJ clean layer needs — trim (padding,
    SURVEY.md §7.3-5), regexp (decimal-comma fix), lpad (zero-padded
    codes), concat (full CNPJ assembly). All JVM built-ins."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.trim("c_name").alias("name_trim"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dash"),
        F.regexp_replace("c_name", "[0-9]+", "N").alias("name_masked"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_padded"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)                    AS order_year,
           CAST(month(o_orderdate) AS INT)                   AS order_month,
           CAST(day(o_orderdate) AS INT)                     AS order_day,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)      AS order_date,
           date_trunc('month', o_orderdate)                  AS month_start,
           CAST(CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS TIMESTAMP)
                                                             AS month_end,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                                                             AS days_since_1995,
           strftime(o_orderdate, '%Y%m%d')                   AS yyyymmdd
    FROM orders
    -- date-valued outputs are surfaced as midnight TIMESTAMPs on both
    -- engines: DATE round-trips differently through pandas (datetime.date
    -- vs datetime64), which would break value-hash comparison.
    """,
    tags=("fn", "date"),
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date kernel — includes the reference's yyyymmdd text form
    (etl.py:138-142) as a *derived* format, with a real DateType
    underneath (typed-layer rule, SURVEY.md §1.3)."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        d.cast("date").cast("timestamp").alias("order_date"),
        F.date_trunc("month", d).alias("month_start"),
        F.last_day(d.cast("date")).cast("timestamp").alias("month_end"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since_1995"),
        F.date_format(d, "yyyyMMdd").alias("yyyymmdd"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * 1e1 + 0.5) / 1e1       AS price_rounded,
           abs(l_discount - 0.05)                          AS disc_centered,
           CAST(ceil(l_quantity) AS BIGINT)                AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT)               AS qty_floor,
           floor(sqrt(l_extendedprice) * 1e6 + 0.5) / 1e6 AS price_sqrt,
           floor(ln(l_extendedprice + 1) * 1e6 + 0.5) / 1e6 AS price_ln,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
           greatest(l_discount, l_tax)                     AS max_rate,
           CAST(sign(l_discount - l_tax) AS DOUBLE)        AS disc_vs_tax
    FROM lineitem
    """,
    tags=("fn", "math"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math kernel. Per-row IEEE double arithmetic is engine-identical;
    libm-backed ln/sqrt and the decimal display rounding go through the
    floor-based quantize() (registry) so both engines pick the same
    neighbour at decimal half boundaries."""
    li = table(spark, sf_dir, "lineitem")
    p, q, dsc, tax = (F.col(c) for c in ("l_extendedprice", "l_quantity", "l_discount", "l_tax"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        quantize(p, 1).alias("price_rounded"),
        F.abs(dsc - 0.05).alias("disc_centered"),
        F.ceil(q).alias("qty_ceil"),
        F.floor(q).alias("qty_floor"),
        quantize(F.sqrt(p)).alias("price_sqrt"),
        quantize(F.log(p + 1)).alias("price_ln"),
        (p * (1 - dsc) * (1 + tax)).alias("charged"),
        F.greatest(dsc, tax).alias("max_rate"),
        F.signum(dsc - tax).alias("disc_vs_tax"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT p_partkey, unnest(string_split(p_type, ' ')) AS type_word
    FROM part
    """,
    tags=("fn", "array"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode — the normalization the reference never does to its
    comma-packed cnae_fiscal_secundaria column (etl.py:48); here applied
    to part.p_type. One row per element; no shuffle (explode is a
    narrow op)."""
    p = table(spark, sf_dir, "part")
    return p.select("p_partkey", F.explode(F.split("p_type", " ")).alias("type_word"))


@register(
    "fn_array_ops",
    oracle="""
    SELECT p_partkey,
           array_to_string(string_split(p_type, ' '), ',')        AS type_words_csv,
           len(string_split(p_type, ' '))                         AS n_words,
           list_contains(string_split(p_type, ' '), 'BRUSHED')    AS has_brushed,
           array_to_string(list_sort(list_distinct(string_split(p_type, ' '))), ',')
                                                                  AS words_csv
    FROM part
    """,
    tags=("fn", "array"),
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array kernel without explode: size/contains/distinct/sort/join —
    all computed inside the row (no fanout, codegen-friendly).

    Boundary rule: the plan's OUTPUT carries only scalar columns — the
    array intermediates are array_join'ed at the projection boundary
    (raw array columns aren't sortable by the driver's pandas
    canonicalizer; the array ops themselves all still execute)."""
    p = table(spark, sf_dir, "part")
    words = F.split("p_type", " ")
    return p.select(
        "p_partkey",
        F.array_join(words, ",").alias("type_words_csv"),
        F.size(words).alias("n_words"),
        F.array_contains(words, "BRUSHED").alias("has_brushed"),
        F.array_join(F.array_sort(F.array_distinct(words)), ",").alias("words_csv"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                    AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT)    AS k_int
    FROM events
    """,
    tags=("fn", "json"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props (JSON text column). Scalar
    get_json_object — no parse-to-struct materialization; at scale prefer
    from_json with a declared schema once per pipeline stage."""
    ev = table(spark, sf_dir, "events", parallel=True)
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("bigint").alias("k_int"),
    )


# --- CNPJ check-digit UDF (the only custom compute; SURVEY.md §7.2) --------

_CNPJ_W1 = [5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2]
_CNPJ_W2 = [6] + _CNPJ_W1


def _cnpj_dv(digits12: str) -> str:
    """Mod-11 check digits for a 12-digit CNPJ stem (8 base + 4 ordem) —
    the public CNPJ algorithm; reference stores dv as data
    (cnpj_dv, etl.py:44) and never validates it."""
    s1 = sum(int(d) * w for d, w in zip(digits12, _CNPJ_W1))
    d13 = 11 - (s1 % 11)
    d13 = 0 if d13 >= 10 else d13
    s2 = sum(int(d) * w for d, w in zip(digits12 + str(d13), _CNPJ_W2))
    d14 = 11 - (s2 % 11)
    d14 = 0 if d14 >= 10 else d14
    return f"{d13}{d14}"


@pandas_udf(StringType())
def cnpj_format_udf(basico: pd.Series) -> pd.Series:
    """Arrow-batched: base8 + ordem '0001' → formatted
    '##.###.###/####-##' with computed check digits. Vectorized enough at
    batch level; pure-Python per value (string munging, not numeric)."""

    def fmt(v) -> str | None:
        if v is None:
            return None
        stem = f"{int(v) % 100_000_000:08d}0001"
        dv = _cnpj_dv(stem)
        return f"{stem[0:2]}.{stem[2:5]}.{stem[5:8]}/{stem[8:12]}-{dv}"

    return basico.map(fmt)


# DuckDB twin of the same arithmetic, over the same synthesized stem.
_CNPJ_ORACLE = """
    WITH stems AS (
      SELECT c_custkey,
             lpad(CAST(c_custkey % 100000000 AS VARCHAR), 8, '0') || '0001' AS stem
      FROM customer
    ), s1 AS (
      SELECT c_custkey, stem,
             list_sum(list_transform(generate_series(1, 12),
               i -> CAST(substr(stem, CAST(i AS INT), 1) AS BIGINT)
                    * ([5,4,3,2,9,8,7,6,5,4,3,2])[i])) AS sum1
      FROM stems
    ), d1 AS (
      SELECT *, CASE WHEN 11 - (sum1 % 11) >= 10 THEN 0 ELSE 11 - (sum1 % 11) END AS d13
      FROM s1
    ), s2 AS (
      SELECT c_custkey, stem, d13,
             list_sum(list_transform(generate_series(1, 13),
               i -> CAST(substr(stem || CAST(d13 AS VARCHAR), CAST(i AS INT), 1) AS BIGINT)
                    * ([6,5,4,3,2,9,8,7,6,5,4,3,2])[i])) AS sum2
      FROM d1
    )
    SELECT c_custkey,
           substr(stem,1,2) || '.' || substr(stem,3,3) || '.' || substr(stem,6,3)
             || '/' || substr(stem,9,4) || '-'
             || CAST(d13 AS VARCHAR)
             || CAST(CASE WHEN 11 - (sum2 % 11) >= 10 THEN 0 ELSE 11 - (sum2 % 11) END AS VARCHAR)
             AS cnpj
    FROM s2
"""


@register("udf_cnpj_format", oracle=_CNPJ_ORACLE, tags=("fn", "udf", "reference"))
def udf_cnpj_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDF (Arrow-batched — never a row-at-a-time Python UDF) that
    formats a full 14-digit CNPJ with mod-11 check digits from a synthetic
    8-digit stem. Oracle re-derives the identical arithmetic in SQL."""
    c = table(spark, sf_dir, "customer")
    return c.select("c_custkey", cnpj_format_udf(F.col("c_custkey")).alias("cnpj"))
