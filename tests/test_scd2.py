"""SCD Type 2 goldens: version chaining, no-change collapse, AS OF.

Extends the reference's SCD1 merge semantics (J1,
/root/reference/src/bundle_processor.py:256-262) with history keeping;
the truth-table style mirrors the reference's in-batch conflict tests
(/root/reference/tests/unit/test_bundle_processor.py:280-374).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from fhir_to_lakehouse_spark.operators.scd import apply_scd2, as_of, current_of
from fhir_to_lakehouse_spark.sinks.keyed_table import KeyedTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _t(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_first_load_opens_current_versions(spark):
    out = apply_scd2(
        None, _batch(spark, [("a", "new", _t(1)), ("b", "new", _t(1))]),
        key="id", ts_col="ts", tracked=["status"],
    )
    rows = out.collect()
    assert len(rows) == 2
    assert all(r.is_current and r.valid_to is None for r in rows)


def test_change_closes_previous_version(spark):
    state = apply_scd2(
        None, _batch(spark, [("a", "new", _t(1))]),
        key="id", ts_col="ts", tracked=["status"],
    )
    state = apply_scd2(
        state, _batch(spark, [("a", "active", _t(5))]),
        key="id", ts_col="ts", tracked=["status"],
    )
    by_status = {r.status: r for r in state.collect()}
    assert by_status["new"].valid_to == _t(5)
    assert not by_status["new"].is_current
    assert by_status["active"].is_current
    assert by_status["active"].valid_from == _t(5)
    # SCD1 projection sees only the latest version
    assert [r.status for r in current_of(state).collect()] == ["active"]


def test_no_change_rows_collapse(spark):
    state = apply_scd2(
        None, _batch(spark, [("a", "new", _t(1))]),
        key="id", ts_col="ts", tracked=["status"],
    )
    state = apply_scd2(
        state, _batch(spark, [("a", "new", _t(7))]),
        key="id", ts_col="ts", tracked=["status"],
    )
    rows = state.collect()
    assert len(rows) == 1  # same attrs -> no new version
    assert rows[0].valid_from == _t(1) and rows[0].is_current


def test_multiple_versions_within_one_batch_chain(spark):
    state = apply_scd2(
        None,
        _batch(
            spark,
            [
                ("a", "new", _t(1)),
                ("a", "active", _t(3)),
                ("a", "active", _t(4)),  # collapses into the t(3) version
                ("a", "churned", _t(9)),
            ],
        ),
        key="id", ts_col="ts", tracked=["status"],
    )
    rows = sorted(state.collect(), key=lambda r: r.valid_from)
    assert [r.status for r in rows] == ["new", "active", "churned"]
    assert [r.valid_to for r in rows] == [_t(3), _t(9), None]
    # point-in-time reads land in the right interval
    assert [r.status for r in as_of(state, _t(5)).collect()] == ["active"]
    assert [r.status for r in as_of(state, _t(1)).collect()] == ["new"]


def test_keyed_table_scd2_roundtrip(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "dim.parquet"), key="id")
    t.merge_scd2(_batch(spark, [("a", "new", _t(1))]), "ts", ["status"])
    t.merge_scd2(_batch(spark, [("a", "active", _t(6))]), "ts", ["status"])
    out = t.to_df()
    assert out.count() == 2
    assert out.filter("is_current").count() == 1
    assert (
        out.filter("is_current").select("status").first().status == "active"
    )
