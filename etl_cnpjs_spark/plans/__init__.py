"""Plan registry — importing this package registers every query.

Modules register plans via @register(name, oracle=...) into
registry.QUERIES; __spark_entry__.py re-exports that dict as the driver
contract.
"""

from etl_cnpjs_spark.plans.registry import QUERIES, QuerySpec, register  # noqa: F401

# Import order == SURVEY.md §2 inventory order; each import populates QUERIES.
from etl_cnpjs_spark.plans import relational  # noqa: E402,F401
from etl_cnpjs_spark.plans import sinks  # noqa: E402,F401
from etl_cnpjs_spark.plans import functions  # noqa: E402,F401
from etl_cnpjs_spark.plans import text  # noqa: E402,F401
from etl_cnpjs_spark.plans import dedup  # noqa: E402,F401
from etl_cnpjs_spark.plans import similarity  # noqa: E402,F401
from etl_cnpjs_spark.plans import multimodal  # noqa: E402,F401
from etl_cnpjs_spark.plans import streaming  # noqa: E402,F401
from etl_cnpjs_spark.plans import extended  # noqa: E402,F401
from etl_cnpjs_spark.plans import extended2  # noqa: E402,F401
from etl_cnpjs_spark.plans import tpch  # noqa: E402,F401
from etl_cnpjs_spark.plans import corpus  # noqa: E402,F401
from etl_cnpjs_spark.plans import udtf_plans  # noqa: E402,F401
from etl_cnpjs_spark.plans import layout  # noqa: E402,F401
from etl_cnpjs_spark.plans import cnpj_parity  # noqa: E402,F401

__all__ = ["QUERIES", "QuerySpec", "register"]
