"""etl_cnpjs_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ETL pipeline
(Alexander-Missias/etl-cnpjs, a single-file pandas+SQLite batch ETL over
the Brazilian CNPJ company registry) as an idiomatic Spark engine:

- declarative DataFrame/SQL plans (Catalyst picks physical strategy),
- explicit StructType schemas (the reference declares schemas positionally,
  ETLCNPJFinalEmpresaEstabelecimentos.py:38-53),
- two-layer typing: raw all-string (bit-faithful to the reference's
  ``dtype=str`` ingestion) + typed/clean layer,
- LLM-data-pipeline extensions (dedup, similarity search, multimodal
  columns, text analysis) designed for 100 TB scale.

Package layout:
    session.py    SparkSession factory (AQE on, UTC, tuned shuffle)
    catalog.py    table registry over parquet dirs
    schemas.py    declared StructTypes (CNPJ tables + testdata tables)
    operators/    composable DataFrame operators (joins, dedup, similarity…)
    functions/    scalar/column function library (strings, dates, CNPJ UDF)
    sources/      scan connectors (csv, parquet, zip, http manifest)
    sinks/        writers (csv w/ BOM, parquet, tables)
    plans/        concrete query plans + DuckDB oracle twins (the registry)
    streaming/    Structured Streaming variants (tumbling windows, state)
    ingest/       CNPJ reference-parity pipeline (download→extract→load)
"""

__version__ = "0.1.0"
