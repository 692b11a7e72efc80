"""Windowed event-time aggregations, batch/stream agnostic.

Both transforms run unchanged on a batch DataFrame (the oracle-checked
form in plans/streaming.py) and on a streaming DataFrame behind
``withWatermark`` (tests/test_streaming.py). Decimal accumulation keeps
sums exact and engine-portable (see plans/registry.py).

Late data: in streaming execution, callers apply
``df.withWatermark("ts", <delay>)`` before these transforms; events later
than the watermark are dropped by the engine and windows finalize once the
watermark passes their end — semantics the batch form trivially satisfies
(batch sees all data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(27,6)"

TUMBLING_WINDOW = "10 minutes"
SESSION_GAP = "30 minutes"


def tumbling_counts(events: DataFrame) -> DataFrame:
    """10-minute tumbling windows per event_type: count + exact value sum.
    window().start is epoch-aligned — floor(epoch/600)*600, which is what
    the DuckDB oracle mirrors with make_timestamp."""
    return (
        events.groupBy(F.window("ts", TUMBLING_WINDOW).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SLIDING_WINDOW = "10 minutes"
SLIDING_SLIDE = "5 minutes"


def sliding_counts(events: DataFrame) -> DataFrame:
    """10-minute windows sliding every 5 — each event lands in exactly
    width/slide = 2 windows (Spark expands them in-place, no shuffle
    beyond the aggregation's)."""
    return (
        events.groupBy(
            F.window("ts", SLIDING_WINDOW, SLIDING_SLIDE).alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_windows(events: DataFrame) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap.
    session_window() is Spark's native mergeable session operator (works
    under streaming state management); its semantics — start = min(ts),
    end = max(ts) + gap, new session when the gap is reached (end is
    exclusive) — are re-derived by the oracle's lag/cumsum SQL."""
    return (
        events.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


DEDUP_KEYS = ("user_id", "event_type", "ts")
DEDUP_HORIZON = "1 hour"


def dedup_events(events: DataFrame, streaming: bool = False) -> DataFrame:
    """Exactly-once event delivery: suppress redelivered copies of the
    same logical event, identified by its natural key (user, type,
    event time). Output is the distinct key set — only key columns, so
    the result never depends on which physical copy arrived first.

    Batch: plain dropDuplicates (hash aggregate, one shuffle on the
    key). Streaming: dropDuplicatesWithinWatermark bounds state to the
    watermark horizon — the key store evicts entries older than
    DEDUP_HORIZON, which is what makes this runnable forever on an
    unbounded stream; the batch form is the all-data limit of the same
    operator."""
    keyed = events.select(*DEDUP_KEYS)
    if streaming:
        return keyed.withWatermark("ts", DEDUP_HORIZON).dropDuplicatesWithinWatermark(
            list(DEDUP_KEYS)
        )
    return keyed.dropDuplicates(list(DEDUP_KEYS))


def click_purchase_join(clicks: DataFrame, buys: DataFrame) -> DataFrame:
    """Event-time interval join: each click matched to the same user's
    purchases within the next 10 minutes. Shared by the batch plan
    (stream_join) and the streaming test
    (tests/test_streaming.py::test_stream_stream_interval_join); under
    readStream both sides carry watermarks, and the interval + watermark
    BOUND click-state retention — the property that makes a
    stream-stream join runnable forever. Inputs must carry
    (cu, cts, cid) / (bu, bts, bid) columns."""
    cond = (
        (F.col("cu") == F.col("bu"))
        & (F.col("bts") >= F.col("cts"))
        & (F.col("bts") <= F.col("cts") + F.expr("INTERVAL 10 MINUTES"))
    )
    return clicks.join(buys, cond).select(
        F.col("cid"),
        F.col("bid"),
        (F.unix_micros(F.col("bts")) - F.unix_micros(F.col("cts"))).alias(
            "lag_us"
        ),
    )


INCIDENT_WINDOW_SEC = 300  # errors attributed to signups in the next 5 min


def signup_error_interval_join(
    signups: DataFrame, errors: DataFrame, streaming: bool = False
) -> DataFrame:
    """Time-range-ONLY stream-stream join — NO natural equi key: every
    error within 5 minutes AFTER any signup (global incident
    attribution; deploy→error, campaign→traffic-spike are the same
    shape). This is the state shape plain equi+interval joins
    (click_purchase_join) don't exercise: with no key, naive planning is
    a cross product, and naive streaming state probes every buffered row.

    Both faces get a SYNTHETIC equi key instead — the bin-blocking trick
    in stream form: the signup's 5-minute validity interval explodes to
    the 1-2 fixed 5-minute time buckets it covers, the error maps to
    exactly ONE bucket (a point never explodes), and the join becomes
    bucket-equality + the true range condition as residual. Matches are
    unique per pair (a pair can only meet in the error's bucket) so no
    distinct is needed. Under readStream the bucket is the state-store
    grouping key and the watermark + range bound state eviction; in
    batch it is a plain shuffle key. Inputs carry (sid, sts) / (eid,
    ets) columns; output (sid, eid, lag_us) in exact integer µs."""
    w = INCIDENT_WINDOW_SEC
    s = signups.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"unix_timestamp(sts) DIV {w}"),
                F.expr(f"(unix_timestamp(sts) + {w}) DIV {w}"),
            )
        ),
    )
    e = errors.withColumn("__bucket", F.expr(f"unix_timestamp(ets) DIV {w}"))
    if streaming:
        s = s.withWatermark("sts", "10 minutes")
        e = e.withWatermark("ets", "10 minutes")
    cond = (
        (F.col("ets") > F.col("sts"))
        & (F.col("ets") <= F.col("sts") + F.expr(f"INTERVAL {w} SECONDS"))
    )
    return (
        s.join(e, on=[s["__bucket"] == e["__bucket"], cond])
        .select(
            "sid",
            "eid",
            (F.unix_micros(F.col("ets")) - F.unix_micros(F.col("sts"))).alias(
                "lag_us"
            ),
        )
    )


def top_users_by_value(events: DataFrame, k: int) -> DataFrame:
    """Top-k users by decimal-exact lifetime value, ties broken by
    user_id (a total order — the cut line is deterministic). The SAME
    transform is legal in batch and in streaming COMPLETE output mode
    (sorting is only allowed there: the sink rewrites the whole result
    each trigger, so the leaderboard is always globally correct)."""
    return (
        events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,6)")).alias("tv"),
        )
        .orderBy(F.col("tv").desc(), F.col("user_id"))
        .limit(k)
        .select(
            "user_id", "n_events", F.col("tv").cast("double").alias("total_value")
        )
    )
