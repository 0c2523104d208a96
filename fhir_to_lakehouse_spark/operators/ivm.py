"""Incremental view maintenance from the change data feed.

The point of emitting a change feed (sinks/keyed_table.py::table_changes)
is that downstream aggregates need not re-scan the table: a grouped
SUM/COUNT view is maintainable from deltas alone. ``delta_of_changes``
turns one batch of CDF rows into per-group (count_delta, sum_delta)
contributions — inserts and update-postimages count +1, deletes and
update-preimages count -1 — and ``apply_deltas`` folds them into the
materialized view with one outer-join merge.

At 100 TB the maintained view updates in O(changes) instead of
O(table): the CDF read prunes to new commit_version partitions and the
merge joins on group keys only. Groups whose net count reaches 0 are
dropped, so the view never accumulates tombstones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def delta_of_changes(
    changes: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Aggregate one CDF batch into per-group deltas."""
    sign = (
        F.when(F.col("_change_type").isin("insert", "update_postimage"), F.lit(1))
        .when(F.col("_change_type").isin("delete", "update_preimage"), F.lit(-1))
        .otherwise(F.lit(0))
    )
    return changes.groupBy(*group_cols).agg(
        F.sum(sign).alias("count_delta"),
        F.sum(sign * F.col(value_col)).alias("sum_delta"),
    )


def apply_deltas(view: DataFrame | None, deltas: DataFrame) -> DataFrame:
    """Merge deltas into the materialized view (schema: group cols +
    ``n`` + ``total``). ``None`` view = first refresh."""
    group_cols = [c for c in deltas.columns if c not in ("count_delta", "sum_delta")]
    if view is None:
        merged = deltas.select(
            *group_cols,
            F.col("count_delta").alias("n"),
            F.col("sum_delta").alias("total"),
        )
    else:
        merged = (
            view.join(deltas, on=group_cols, how="full_outer")
            .select(
                *group_cols,
                (F.coalesce(F.col("n"), F.lit(0))
                 + F.coalesce(F.col("count_delta"), F.lit(0))).alias("n"),
                (F.coalesce(F.col("total"), F.lit(0.0))
                 + F.coalesce(F.col("sum_delta"), F.lit(0.0))).alias("total"),
            )
        )
    return merged.filter(F.col("n") > 0)


def maintain_view(
    view: DataFrame | None,
    changes: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """One refresh step: fold a CDF batch into the grouped view."""
    return apply_deltas(view, delta_of_changes(changes, group_cols, value_col))
