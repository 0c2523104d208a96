"""Time-series kernels: truncated EWMA as a window aggregate.

Truncating the exponential kernel is what turns EWMA from a sequential
recursion (s_t = a*v_t + (1-a)*s_{t-1}, row-at-a-time state) into a
sliding-window dot product Spark can run as one window pass — and 0.7^20
leaves <0.1% residual weight, so the truncation error is below any
rounded output digit. The plans/events.py registry entry and the truth
tables both drive this one implementation.

100 TB shape: one exchange on the key columns, one sort, one window
buffering at most ``taps`` rows per key; the kernel is codegen'd
higher-order folds (no Python, no absolute power beyond alpha^-(taps-1)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ewma(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    value: str,
    alpha: float = 0.7,
    taps: int = 20,
    out: str = "ewma",
) -> DataFrame:
    """Append a truncated-EWMA column: each row's ``value`` smoothed
    over its ``taps`` most recent predecessors (inclusive) with
    geometric weights ``alpha^k``, normalized by the realized weight
    sum so short early histories stay unbiased.

    The window frame is materialized once as an <=taps-element array
    (oldest first) and the kernel is two higher-order folds over
    positions — factoring the weight as alpha^t/alpha^i would overflow
    alpha^-i on long histories.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(-(taps - 1), 0)
    )
    vals: Column = F.collect_list(value).over(w)
    a = repr(float(alpha))
    weighted = F.expr(
        f"aggregate(zip_with(_ewma_vals, sequence(0, size(_ewma_vals) - 1),"
        f" (v, j) -> v * pow({a}, size(_ewma_vals) - 1 - j)),"
        f" 0D, (acc, x) -> acc + x)"
    )
    wsum = F.expr(
        f"aggregate(transform(sequence(0, size(_ewma_vals) - 1),"
        f" j -> pow({a}, size(_ewma_vals) - 1 - j)),"
        f" 0D, (acc, x) -> acc + x)"
    )
    return (
        df.withColumn("_ewma_vals", vals)
        .withColumn(out, weighted / wsum)
        .drop("_ewma_vals")
    )
