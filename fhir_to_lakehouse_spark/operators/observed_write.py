"""Write-time QA metrics via the batch Observation API — one pass.

The 100 TB anti-pattern this kills: write a table, then RE-SCAN it to
count rows / nulls / violations for the data-quality report. Spark's
`Observation` attaches aggregate expressions to the SAME plan the
write executes, collected through accumulators as the write job runs —
the metrics cost zero extra scans and describe EXACTLY the rows
written (not a later, possibly-changed state of the table).

Streaming twin: the pipeline's named ``observe()`` set +
``ThroughputListener`` gauges (streaming/metrics.py). This is the
batch face of the same API for backfills and lakehousekeeper-style
jobs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def write_parquet_observed(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column] | None = None,
    mode: str = "overwrite",
) -> dict[str, object]:
    """Write ``df`` as parquet and return QA metrics computed INSIDE
    the write job. ``metrics`` maps metric name -> aggregate Column
    (count/count_if/min/max/sum/avg — any accumulator-backed
    aggregate); default is a bare row count.

    Returns the observed values as a plain dict. The metrics are
    exact for the written rows: Observation values come from the
    job's task accumulators, so retried/speculative tasks don't
    double-count (Spark de-duplicates per-task updates at the stage
    level for SQL metrics accumulators)."""
    metrics = metrics or {"rows_written": F.count(F.lit(1))}
    obs = Observation()
    first, *rest = [v.alias(k) for k, v in metrics.items()]
    df.observe(obs, first, *rest).write.mode(mode).parquet(path)
    return dict(obs.get)


def null_fraction_metrics(
    df: DataFrame, columns: list[str] | None = None
) -> dict[str, Column]:
    """Convenience metric set: row count plus a null count per column
    (pair with write_parquet_observed for a per-write completeness
    report)."""
    cols = columns or df.columns
    out: dict[str, Column] = {"rows_written": F.count(F.lit(1))}
    for c in cols:
        out[f"nulls_{c}"] = F.count_if(F.col(c).isNull())
    return out
