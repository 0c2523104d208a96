"""Event-time streaming operators the reference lacks (SURVEY §2.8:
no watermark/window/session state in the reference — added here as the
streaming face of the batch plans in plans/events.py).

Each builder takes a *streaming* DataFrame with an event-time ``ts``
column and returns the windowed aggregation; the logical plans match
the batch analogs, so the DuckDB-oracle checks on plans/events.py
transfer to these (same plan, streaming source).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def tumbling_counts(
    stream: DataFrame, width: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling event-time window with watermark for late data."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def sliding_counts(
    stream: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding window (overlapping)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


def session_counts(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session window: native session_window (state-store backed) —
    the streaming twin of plans/events.py::events_sessionize."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stream_stream_click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "INTERVAL 1 HOUR",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with event-time bounds: purchases match
    clicks by the same user within ``within`` BEFORE the purchase.
    Both sides carry watermarks, and the time-range condition bounds
    the join state — without it a stream-stream join buffers forever
    (the state-retention contract of Structured Streaming joins)."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.expr(f"purchase_ts - {within}"))
    )
    return p.join(c, cond, "inner").select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        "purchase_value",
    )


def dedup_stream(stream: DataFrame, keys: list[str], watermark: str = "1 hour") -> DataFrame:
    """Cross-batch streaming dedup with bounded state:
    dropDuplicatesWithinWatermark keeps each key's state only until the
    watermark passes — unlike the reference, whose dedup is
    within-batch only (SURVEY §2.8) and relies on MERGE idempotency
    across batches. Use for exactly-once-ish event feeds where the
    same record may be redelivered within a bounded horizon."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


RUNNING_TOTAL_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

RUNNING_TOTAL_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value total across micro-batches (the pattern
    for arbitrary keyed state the built-in windows can't express).
    State per key = two numbers — bounded, shuffle key = user_id."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTAL_OUTPUT,
        stateStructType=RUNNING_TOTAL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
