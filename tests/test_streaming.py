"""Structured Streaming execution tests: the SAME transforms the batch
oracle validated, executed as streams (file source → watermark →
windowed agg / custom state → memory sink, availableNow trigger)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.streaming.stateful import running_user_totals
from etl_cnpjs_spark.streaming.windows import tumbling_counts


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Stage events as a clean µs-timestamp parquet dir (the ns source
    needs the catalog's conversion, readStream needs a directory)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    table(spark, sf_dir, "events").write.mode("overwrite").parquet(out)
    return out


def _run_to_memory(stream_df, name: str, mode: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_tumbling_matches_batch(spark, sf_dir, events_dir):
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in tumbling_counts(table(spark, sf_dir, "events")).collect()
    }
    stream_src = (
        spark.readStream.schema(spark.read.parquet(events_dir).schema)
        .parquet(events_dir)
        .withWatermark("ts", "1 hour")
    )
    _run_to_memory(tumbling_counts(stream_src), "t_tumbling", "complete")
    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("t_tumbling").collect()
    }
    assert streamed == batch


def test_stateful_running_totals(spark, sf_dir, events_dir):
    batch = {
        r.user_id: (r.n_events, r.total_value)
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .collect()
    }
    stream_src = spark.readStream.schema(spark.read.parquet(events_dir).schema).parquet(
        events_dir
    )
    _run_to_memory(running_user_totals(stream_src), "t_totals", "update")
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.table("t_totals").collect()
    }
    assert set(got) == set(batch)
    for uid, (n, total) in batch.items():
        gn, gtotal = got[uid]
        assert gn == n
        assert abs(gtotal - total) < 1e-6  # float sum order may differ
