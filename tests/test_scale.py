"""Physical-plan assertions: the properties that matter at 100 TB —
partition pruning, bucketed joins without shuffles, broadcast
selection, salted-join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.functions.skew import (
    salted_join,
    write_bucketed,
)
from fhir_to_lakehouse_spark.sources.tables import load_table


def explain_str(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    out = str(tmp_path / "li_part")
    (
        li.withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
        .write.mode("overwrite")
        .partitionBy("ship_month")
        .parquet(out)
    )
    df = spark.read.parquet(out).filter(F.col("ship_month") == "1996-03")
    plan = explain_str(df)
    # partition filter must reach the scan (pruned read, not post-filter)
    assert "PartitionFilters" in plan
    assert "1996-03" in plan
    got = df.count()
    want = li.filter(F.date_format("l_shipdate", "yyyy-MM") == "1996-03").count()
    assert got == want > 0


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    write_bucketed(li, "t_li_b", "l_orderkey", num_buckets=8, sort_key="l_orderkey")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "t_or_b",
        "l_orderkey",
        num_buckets=8,
        sort_key="l_orderkey",
    )
    # force the SMJ path: on production-sized tables the planner picks
    # it by size; the tiny fixtures would broadcast and skip bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_li_b").join(spark.table("t_or_b"), "l_orderkey")
        plan = explain_str(joined)
        # the join runs shuffle-free on co-bucketed inputs: no Exchange
        # between the scans and the SortMergeJoin
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"join shuffled:\n{plan}"
        assert joined.count() > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_broadcast_picked_for_small_dimension(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    joined = li.join(supp, li.l_suppkey == supp.s_suppkey)
    assert "BroadcastHashJoin" in explain_str(joined)


def test_salted_join_left_semantics(spark):
    big = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z"), (3, "w")], "k int, v string"
    )
    small = spark.createDataFrame([(1, "A"), (2, "B")], "k int, name string")
    out = salted_join(big, small, "k", salt_buckets=4, how="left").collect()
    assert len(out) == 4  # every big row exactly once
    by_v = {r["v"]: r["name"] for r in out}
    assert by_v == {"x": "A", "y": "A", "z": "B", "w": None}


def test_salted_join_rejects_outer(spark):
    import pytest

    df = spark.range(1).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="full")


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    """When the dimension side can't broadcast, AQE's runtime Bloom
    filter (semi-join reduction) must land on the fact-side scan:
    might_contain(<bloom of s_suppkey>) filters lineitem BEFORE the
    shuffle, so at 100 TB the exchange carries only plausibly-matching
    rows. (Thresholds forced here because local testdata is tiny.)"""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 4500)
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        j = li.join(supp, li.l_suppkey == supp.s_suppkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
        # and the reduction must not change results
        n_plain = li.join(supp.hint("broadcast"), li.l_suppkey == supp.s_suppkey).count()
        assert j.count() == n_plain
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
