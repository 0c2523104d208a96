"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the declared operator library from
fhir_to_lakehouse_spark.plans (one entry per implemented operator from
SURVEY.md §2 plus the north-star extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the engine package lives next to this file; make the import work
# regardless of the caller's cwd/sys.path
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from fhir_to_lakehouse_spark.plans import QUERIES

    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from fhir_to_lakehouse_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY registered query — since round
    12 the oracle map covers the full registry (279/279; the iterative
    BPE pair runs as a recursive-CTE twin, see plans/text.py)."""
    from fhir_to_lakehouse_spark.plans import ORACLES

    return dict(ORACLES)
