"""CNPJ reference-parity pipeline (SURVEY.md §7.1 M3).

The reference (ETLCNPJFinalEmpresaEstabelecimentos.py) is: download sharded
ZIPs → extract headerless ';'-separated latin-1 CSVs → stamp column names →
bulk-load SQLite → indexes → one 5-table star join (QUERY_FINAL) → CSV with
UTF-8 BOM. This package re-expresses each stage Spark-first:

  ingest.py   O1-O3, O8: manifest fetch (idempotent), zip extract,
              suffix-routed discovery — driver-side, like the reference
  schemas.py  declared all-string raw schemas + typed cast specs (§1.3)
  load.py     O4-O5, O9-O10: latin-1 CSV → raw parquet, schema stamped
  typed.py    the typed layer: decimal-comma, yyyyMMdd, CNAE-list split
  flagship.py O13-O15, O17: QUERY_FINAL verbatim over affinity views
  export.py   O18: UTF-8-BOM ';' CSV sink
  fixtures.py synthetic CNPJ-shaped data (FIXTURES.md §B) for parity tests
"""

from etl_cnpjs_spark.cnpj.flagship import QUERY_FINAL, register_affinity_views, run_flagship

__all__ = ["QUERY_FINAL", "register_affinity_views", "run_flagship"]
