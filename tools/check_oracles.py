"""Local replica of the driver's correctness gate.

Runs every declared query on Spark and its oracle SQL on DuckDB against
the same parquet tables, then compares row count, column names, and an
order-insensitive value multiset (exact equality after per-cell
normalization). Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from fhir_to_lakehouse_spark.session import get_spark
from fhir_to_lakehouse_spark.sources.tables import TABLES


import decimal


def norm_cell(v, lenient_decimal: bool = False):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-side hashing needs identical values; we round defensively
        # at 9 digits to flag real mismatches but ignore representation noise
        return round(v, 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm_cell(x, lenient_decimal) for x in v)
    if isinstance(v, decimal.Decimal):
        if lenient_decimal:
            return round(float(v), 9)
        # REPRESENTATION-EXACT: the driver hashes values as rendered, so
        # DECIMAL(18,2) 90.00 and DECIMAL(38,18) 90.000000000000000000
        # must NOT compare equal here (r7 verdict item 2 — the old
        # float() normalization masked exactly that drift). Fixed-point
        # format preserves the scale; Decimal str() could use E-notation.
        return f"dec:{v:f}"
    return v


def _col_kinds(rows, ncols):
    """Per-column set of non-null python types, sampling every row."""
    kinds = [set() for _ in range(ncols)]
    for r in rows:
        for i in range(ncols):
            v = r[i]
            if v is not None:
                kinds[i].add(type(v))
    return kinds


def compare(scols, srows, dcols, drows):
    """Replicates the driver's gate: (problems, warnings).

    Decimal columns compare scale-exact when BOTH engines return
    Decimal. When the engines disagree on the numeric family (one
    Decimal, one float/int) the compare falls back to the lenient
    9-digit numeric form but emits a warning — the driver's hash may
    or may not forgive that, so it should be visible locally."""
    problems: list[str] = []
    warnings: list[str] = []
    if len(srows) != len(drows):
        problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
    if problems:
        return problems, warnings

    s_order = sorted(range(len(scols)), key=lambda i: scols[i])
    d_order = sorted(range(len(dcols)), key=lambda i: dcols[i])
    s_kinds = _col_kinds(srows, len(scols))
    d_kinds = _col_kinds(drows, len(dcols))
    lenient: list[bool] = []
    for si, di in zip(s_order, d_order):
        sk, dk = s_kinds[si], d_kinds[di]
        has_dec = decimal.Decimal in sk or decimal.Decimal in dk
        both_dec = (decimal.Decimal in sk or not sk) and (
            decimal.Decimal in dk or not dk
        )
        lenient.append(has_dec and not both_dec)
        if has_dec and not both_dec:
            warnings.append(
                f"col {scols[si]!r}: numeric family differs "
                f"(spark={[t.__name__ for t in sk]} "
                f"duck={[t.__name__ for t in dk]}) — lenient compare"
            )
    sm = Counter(
        tuple(norm_cell(r[i], lx) for i, lx in zip(s_order, lenient))
        for r in srows
    )
    dm = Counter(
        tuple(norm_cell(r[i], lx) for i, lx in zip(d_order, lenient))
        for r in drows
    )
    if sm != dm:
        diff_s = list((sm - dm).items())[:3]
        diff_d = list((dm - sm).items())[:3]
        problems.append(f"values spark-only={diff_s} duck-only={diff_d}")
    return problems, warnings


def row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    from fhir_to_lakehouse_spark.functions.cache import (
        release_all_persistent_rdds,
    )

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        finally:
            # same per-entry hygiene as bench.py (code-review finding:
            # this harness is the 'one-shot run' functions/cache.py's
            # contract describes, so it must actually clear): builder
            # persists + iterative checkpoints would otherwise
            # accumulate across all registered queries in one session
            spark.catalog.clearCache()
            release_all_persistent_rdds(spark)
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only check)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems, warnings = compare(scols, srows, dcols, drows)
        for w in warnings:
            print(f"warn  {name}: {w}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"ok    {name}: {len(srows)} rows")
            n_pass += 1

    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
