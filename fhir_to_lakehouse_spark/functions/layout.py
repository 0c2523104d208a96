"""Data-layout keys: Z-order (Morton) interleaving as Catalyst expressions.

The reference gets multi-column data layout from Delta liquid clustering
(S6, /root/reference/src/bundle_processor.py:198-202) — a black box the
parquet fallback lacks. This provides the classic explicit alternative:
interleave the bits of N bucketed dimensions into one sort key, so
sorting by that key co-locates rows that are close in ALL dimensions,
tightening per-file min/max statistics for multi-dimensional range
predicates (the OPTIMIZE ZORDER BY analog).

Everything is built from `shiftright/shiftleft/&/|` built-ins — stays
inside WholeStageCodegen, no UDF — and is therefore cheap enough to
compute at write time on 100 TB: one projection over the write path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column (round-robin,
    col 0 owns the least-significant lane) into one BIGINT sort key.

    Inputs must already be non-negative bucket ordinals in
    ``[0, 2**bits)`` — e.g. ``F.col("k") % 256`` or a rank. With N
    columns the key uses N*bits bits, so N*bits must stay < 63.
    """
    ncols = len(cols)
    if ncols * bits > 62:
        raise ValueError(f"{ncols} cols x {bits} bits exceeds a BIGINT")
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(col, i).bitwiseAND(F.lit(1)), i * ncols + j)
            )
    return out


def morton_key_sql(cols: list[str], bits: int = 16) -> str:
    """The identical computation as engine-portable ANSI SQL (used as
    the DuckDB oracle for the Spark expression — bit-for-bit parity)."""
    ncols = len(cols)
    terms = [
        f"((({c} >> {i}) & 1) << {i * ncols + j})"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return " | ".join(terms)
