"""Known-answer tests for the moment/contingency statistics: a
hand-built 2x2 table with chi2 = N (perfect association), and a
symmetric two-point distribution whose skewness is exactly 0 and
excess kurtosis exactly -2."""

from __future__ import annotations

import datetime as dt

from fhir_to_lakehouse_spark.plans import QUERIES

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def test_chi_square_perfect_association(spark, tmp_path):
    # cohort 0 (even user_id) only ever does "view"; cohort 1 only
    # "click" — 10 events each. Expected cells are all 5, so
    # chi2 = 4 * (5^2 / 5) = 20 = N, the 2x2 maximum — and HALF of it
    # comes from the two EMPTY cells, which is what this test pins:
    # a sparse groupBy that drops them reports 10, not 20.
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(10):
        rows.append((i, t0 + dt.timedelta(minutes=i), 2, "view", 1.0, "{}"))
        rows.append(
            (100 + i, t0 + dt.timedelta(minutes=i), 3, "click", 1.0, "{}")
        )
    spark.createDataFrame(rows, _EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    row = QUERIES["stats_chi_square_independence"](
        spark, str(tmp_path)
    ).collect()[0]
    assert row.n_cells == 4  # densified: empty cells present as zeros
    assert row.dof == 1
    assert row.chi2 == 20.0


def test_skewness_kurtosis_two_point_symmetric(spark, tmp_path):
    # l_quantity alternating 10/30: mean 20, symmetric -> skew 0;
    # two-point distributions have kurtosis m4/m2^2 = 1 -> excess -2.
    rows = [
        (1, 1, 1, i, float(10 if i % 2 == 0 else 30), 1.0, 0.0, 0.0,
         "A", "F", dt.date(2024, 1, 1))
        for i in range(8)
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate date",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    row = QUERIES["agg_skewness_kurtosis"](spark, str(tmp_path)).collect()[0]
    assert row.n == 8
    assert row.skew_qty == 0.0
    assert row.kurt_qty == -2.0


def test_mode_per_group_deterministic_tie_break(spark, tmp_path):
    # status P: priority "1-URGENT" x2 beats "2-HIGH" x1.
    # status F: exact tie ("1-URGENT" x1, "2-HIGH" x1) -> the smaller
    # priority string must win on every engine.
    rows = [
        (1, 1, "P", 1.0, dt.date(2024, 1, 1), "1-URGENT"),
        (2, 1, "P", 1.0, dt.date(2024, 1, 1), "1-URGENT"),
        (3, 1, "P", 1.0, dt.date(2024, 1, 1), "2-HIGH"),
        (4, 1, "F", 1.0, dt.date(2024, 1, 1), "2-HIGH"),
        (5, 1, "F", 1.0, dt.date(2024, 1, 1), "1-URGENT"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    out = {
        r.o_orderstatus: r
        for r in QUERIES["agg_mode_per_group"](spark, str(tmp_path)).collect()
    }
    assert out["P"].mode_priority == "1-URGENT"
    assert out["P"].n_mode == 2
    assert out["F"].mode_priority == "1-URGENT"
    assert out["F"].n_mode == 1
