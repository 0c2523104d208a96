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


def norm_cell(v):
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
        return tuple(norm_cell(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


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
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            sm, dm = row_multiset(scols, srows), row_multiset(dcols, drows)
            if sm != dm:
                diff_s = list((sm - dm).items())[:3]
                diff_d = list((dm - sm).items())[:3]
                problems.append(f"values spark-only={diff_s} duck-only={diff_d}")
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
