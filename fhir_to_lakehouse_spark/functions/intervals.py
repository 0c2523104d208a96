"""Interval operators: gaps-and-islands coalescing.

The classic merge-overlapping-intervals operator (hospitalization
stays, machine uptime, contiguous user activity) as a reusable
DataFrame transform — the plans/events.py registry entry and the truth
tables both drive this one implementation.

100 TB shape: everything keys on the partition columns, so Catalyst
plans ONE exchange for the two window passes and any downstream
per-island aggregate; per-key state during the scan is a single
running max. AQE skew handling applies to the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def coalesce_intervals(
    df: DataFrame,
    keys: list[str],
    start: str,
    end: str,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Number each row with the maximal-overlap island it belongs to.

    Within each key group, rows ordered by (start, tiebreak) begin a
    new island exactly when their start exceeds the RUNNING MAX of all
    previous ends — touching intervals (start == previous end) merge,
    and a long early interval can swallow many later ones (which a
    lag-only comparison would get wrong). Adds an ``island_id`` column
    (1-based per key group); all input columns pass through.
    """
    order = [F.col(start)] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_max_end: Column = F.max(end).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "_is_new",
        F.when(F.col(start) <= prev_max_end, 0).otherwise(1),
    )
    return flagged.withColumn(
        "island_id",
        F.sum("_is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    ).drop("_is_new")
