"""Scan connectors (reference ops O1-O8, SURVEY.md §2.1)."""

from etl_cnpjs_spark.sources.csv import read_csv  # noqa: F401
