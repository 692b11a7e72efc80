"""Structured Streaming surface (SURVEY.md §2.2 streaming row; reference
is strictly batch — whole file).

Design rule: every streaming computation is a *transform shared with the
batch path* (streaming/windows.py functions accept either a batch or a
streaming DataFrame). The batch form is what the correctness oracle
checks; the streaming form (readStream → withWatermark → same transform →
writeStream) is exercised by tests/test_streaming.py with availableNow
triggers. That one-definition-two-executions shape is the Spark-native
analog of kappa architecture — and the guarantee that stream results can
be backfilled by the batch engine bit-for-bit.
"""

from etl_cnpjs_spark.streaming.windows import session_windows, tumbling_counts  # noqa: F401
