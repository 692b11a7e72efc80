"""Multimodal decode operators: opaque binary media columns → typed
features via Arrow-batched Python (mapInPandas).

Real media decoding (PIL / torchaudio / pyav) is NOT available in this
environment — the decoder seam is ``decode_media``, which raises
NotImplementedError, and ``_stub_decode`` stands in with a deterministic
fake so the entire Spark-side contract is real and testable:

- input: Arrow record batches with a ``binary`` column (zero-copy from
  the JVM),
- per-batch vectorized work (never per-row Python),
- output: typed columns declared in an explicit schema,
- executor-side execution: the decode runs where the data is; only
  features cross back.

At 100 TB: decode after partition pruning / frame sampling, keep batches
~64 MB (spark.sql.execution.arrow.maxRecordsPerBatch), and pin thread
pools inside the UDF to 1 (the task is the parallelism unit).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from etl_cnpjs_spark.serde import pickle_by_value

DECODE_SCHEMA = "doc_id long, n_bytes long, width long, height long, n_frames long"


def decode_media(blob: bytes) -> dict:
    """THE REAL-DECODER SEAM. Plug PIL/pyav/torchaudio here.

    Not implemented in this environment (no media libraries baked in).
    """
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; the pipeline uses the deterministic stub instead"
    )


def _stub_decode(n_bytes: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode, derived from byte length only — keeps
    every downstream schema/partitioning decision testable and
    oracle-checkable."""
    return pd.DataFrame(
        {
            "n_bytes": n_bytes,
            "width": n_bytes % 640,
            "height": (n_bytes * 7) % 480,
            "n_frames": 1 + (n_bytes % 120),
        }
    )


def decode_features_map_in_pandas(df: DataFrame) -> DataFrame:
    """blob → features via mapInPandas (Arrow batches in and out)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["blob"].map(len).astype("int64")
            out = _stub_decode(n_bytes)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


# ship this module's functions by value inside serialized tasks — executors
# don't have the package installed (see serde.py)
pickle_by_value(__name__)
