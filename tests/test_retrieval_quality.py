"""Value-level invariants for the retrieval / data-quality / graph-rank
families (plans/retrieval.py, plans/quality_checks.py,
plans/graph_rank.py). The DuckDB oracle carries exact value parity;
these tests pin the semantic properties that would survive a refactor
of both sides at once."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.plans import QUERIES
from fhir_to_lakehouse_spark.sources.tables import load_table


def test_bm25_scores_positive_descending_and_capped(spark, sf_dir):
    rows = QUERIES["search_bm25_topk"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    scores = [r.bm25 for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_bm25_more_matching_terms_scores_higher_on_crafted_docs(spark, tmp_path):
    """On a crafted corpus of equal-length docs, a doc matching all three
    query terms must outscore a doc matching one, which must outscore a
    doc matching none (absent entirely)."""
    docs = spark.createDataFrame(
        [
            (1, "merge window spark pad"),
            (2, "merge pad pad pad"),
            (3, "pad pad pad pad"),
        ],
        "doc_id long, text string",
    )
    docs.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("t")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = QUERIES["search_bm25_topk"](spark, str(tmp_path)).collect()
    by_id = {r.doc_id: r.bm25 for r in rows}
    assert 3 not in by_id  # no query term -> no score row
    assert by_id[1] > by_id[2] > 0


def test_inverted_postings_df_and_head_agree_with_recount(spark, sf_dir):
    out = {r.term: r for r in QUERIES["search_inverted_postings"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    spark_df = (
        docs.select("doc_id", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t"))
        .filter(F.col("t") == "spark")
        .select("doc_id")
        .distinct()
    )
    expected_ids = sorted(r.doc_id for r in spark_df.collect())
    got = out["spark"]
    assert got.df == len(expected_ids)
    # postings_head is the boundary-contract CSV of the sorted head
    head = lambda r: [int(x) for x in r.postings_head.split(",") if x]  # noqa: E731
    assert head(got) == expected_ids[:20]
    for r in out.values():
        assert head(r) == sorted(head(r))
        assert len(head(r)) <= 20
        assert r.total_tf >= r.df


def test_constraint_checks_all_pass_on_clean_testdata(spark, sf_dir):
    rows = QUERIES["quality_constraint_checks"](spark, sf_dir).collect()
    assert len(rows) == 5
    assert all(r.passed for r in rows), [r.check_name for r in rows if not r.passed]
    by_name = {r.check_name: r.metric for r in rows}
    assert by_name["completeness_custkey"] == 1.0
    assert by_name["uniqueness_orderkey"] == 1.0
    assert by_name["status_domain"] == 1.0


def test_constraint_checks_catch_injected_violations(spark, tmp_path):
    """Nulls, duplicate keys, and an out-of-domain status must flip the
    corresponding checks to failed with the exact violation fraction."""
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 100.0),
            (1, None, "F", 200.0),  # dup orderkey + null custkey
            (2, 30, "X", 300.0),  # bad status
            (3, 40, "P", 400.0),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
    )
    orders.write.parquet(str(tmp_path / "orders.parquet"))
    rows = {r.check_name: r for r in QUERIES["quality_constraint_checks"](spark, str(tmp_path)).collect()}
    assert not rows["completeness_custkey"].passed
    assert rows["completeness_custkey"].metric == 0.75
    assert not rows["uniqueness_orderkey"].passed
    assert rows["uniqueness_orderkey"].metric == 0.75
    assert not rows["status_domain"].passed
    assert rows["status_domain"].metric == 0.75
    assert rows["min_totalprice_positive"].passed
    assert rows["max_totalprice_bounded"].passed


def test_outlier_zscore_counts_partition_the_table(spark, sf_dir):
    rows = QUERIES["quality_outlier_zscore"](spark, sf_dir).collect()
    n_total = sum(r.n for r in rows)
    assert n_total == load_table(spark, sf_dir, "orders").count()
    for r in rows:
        assert 0 <= r.n_outliers < r.n
        assert r.max_abs_z > 0
        # Chebyshev: at most n/2.5^2 rows can sit beyond 2.5 sigma
        assert r.n_outliers <= r.n / 2.5**2 + 1


def test_feature_dim_stats_cover_every_dim_exactly(spark, sf_dir):
    rows = QUERIES["feature_dim_stats"](spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    dims = sorted(r.dim for r in rows)
    assert dims == list(range(1, len(dims) + 1))
    for r in rows:
        assert r.n == n_vecs
        assert r.min_v <= r.mean_v <= r.max_v


def test_pagerank_is_a_probability_distribution(spark, sf_dir):
    rows = QUERIES["graph_pagerank_trade"](spark, sf_dir).collect()
    assert len(rows) > 0
    total = sum(r.pagerank for r in rows)
    # dangling-mass redistribution preserves total mass = 1 each iteration
    assert math.isclose(total, 1.0, abs_tol=1e-4)
    assert all(r.pagerank > 0 for r in rows)


def test_pagerank_hand_computed_two_node_cycle(spark, tmp_path):
    """Two nations trading only with each other in one direction each:
    the graph is a 2-cycle, whose stationary (and every-iteration)
    distribution is uniform — each node must hold rank 0.5 after any
    number of iterations."""
    # nation 0 customer buys from nation 1 supplier and vice versa
    spark.createDataFrame(
        [(0, "ALPHA", 0, "x"), (1, "BETA", 1, "x")],
        "n_nationkey long, n_name string, n_regionkey long, n_comment string",
    ).write.parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        [(1, 0, "c"), (2, 1, "c")], "c_custkey long, c_nationkey long, c_name string"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(1, 1, "s"), (2, 0, "s")], "s_suppkey long, s_nationkey long, s_name string"
    ).write.parquet(str(tmp_path / "supplier.parquet"))
    spark.createDataFrame(
        [(10, 1), (20, 2)], "o_orderkey long, o_custkey long"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(10, 1), (20, 2)], "l_orderkey long, l_suppkey long"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    rows = {r.node: r.pagerank for r in QUERIES["graph_pagerank_trade"](spark, str(tmp_path)).collect()}
    assert rows == {"ALPHA": 0.5, "BETA": 0.5}
