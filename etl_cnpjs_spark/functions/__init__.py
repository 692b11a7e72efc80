"""Column-expression library (pure functions Column -> Column).

Everything here compiles to JVM Catalyst expressions — no Python in the
hot path. The single exception, the CNPJ pandas UDF, lives in
plans/functions.py next to its plan.
"""

from etl_cnpjs_spark.functions.text import (  # noqa: F401
    shingles,
    tokens,
)
