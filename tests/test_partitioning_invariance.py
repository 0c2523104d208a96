"""Parallelism invariance: query results must not depend on HOW the
data is split — scan partitioning, shuffle partition count, or the
per-partition evaluation order they induce. This is the miniature form
of the 1000-executor guarantee: a query whose answer changes when
spark.sql.shuffle.partitions changes is wrong at scale even if every
single-layout oracle check passes.

The queries picked here are the ones with a theoretical sensitivity:
argmin/argmax aggregates (tie-break discipline), window ranks over
rounded floats, distributed rank/shuffle (epoch permutation), mergeable
sampling sketches, candidate-pair generation (prefix join), and salted
two-level aggregation."""

from __future__ import annotations

import pytest

from fhir_to_lakehouse_spark.plans import QUERIES

SENSITIVE = [
    "dedup_exact_groups",
    "dedup_survivor_pick",
    "dedup_prefix_filter_join",
    "window_topk_orders_per_customer",
    "quality_ccnet_buckets",
    "corpus_epoch_shuffle",
    "sample_bottomk_mergeable",
    "sample_weighted_es",
    "agg_two_level_skew_safe",
    "text_hapax_spectrum",
    "corpus_leakproof_split",
    "events_anomaly_mad",
    "events_changepoint_cusum",
    "similarity_hard_negatives",
    # round 5: WindowGroupLimit rank under re-partitioning; W1 dedup +
    # anti-join through the bundle chain; iterative argmax tie-breaks
    "search_inverted_postings",
    "pipeline_dangling_references",
    "text_bpe_learn_merges",
    # MG candidate sets differ per layout; the exact recount must not
    "text_heavy_hitters_exact",
    # session boundaries (lag order) + bucketized join under re-split
    "events_interval_join_bucketized",
    # typed reference resolution + W1 dedup through the bundle chain
    "pipeline_reference_join_typed",
    # round 9: cross-doc gram df + per-doc covered-position rebuild;
    # bucket-parallel prefix-sum CDFs; top-k over rounded distances
    # with explicit tie-breaks; SAX words from float discretization
    "dedup_span_removal",
    "quality_ks_two_sample",
    "timeseries_znorm_subsequence_topk",
    "timeseries_sax_motifs",
    # round 9 cont.: LEAD pairing under re-split (per-user order must
    # come from the window sort, never partition order); contingency
    # marginals from exact counts; mode tie-breaks
    "events_markov_transitions",
    "stats_chi_square_independence",
    "agg_mode_per_group",
    # round 9 cont.: union-form fusion — masked ranks must come from
    # the two window sorts' total orders, never from union/partition
    # interleaving
    "search_hybrid_rrf",
    # round 9 cont. (review finding): the FLOAT-merge members of the
    # new statistics family — CentralMomentAgg partial merges and the
    # daily SUM(value) feeding CORR are not float-associative, so a
    # layout change exercises exactly the 6dp-rounding stability these
    # queries' oracles rely on
    "agg_skewness_kurtosis",
    "events_autocorrelation",
]

# (shuffle partitions, max scan partition bytes): one layout splits the
# small parquet into many tiny scan tasks with a near-serial shuffle,
# the other is the standard test layout
LAYOUTS = [("3", "32768"), ("32", "134217728")]


def _rows(spark, name, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    cols = sorted(df.columns)
    out = []
    for r in df.collect():
        d = r.asDict(recursive=True)
        out.append(tuple(repr(d[c]) for c in cols))
    return sorted(out)


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_to_partitioning(spark, sf_dir, name):
    results = []
    orig_sp = spark.conf.get("spark.sql.shuffle.partitions")
    orig_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        for sp, mpb in LAYOUTS:
            spark.conf.set("spark.sql.shuffle.partitions", sp)
            spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
            results.append(_rows(spark, name, sf_dir))
            spark.catalog.clearCache()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig_sp)
        spark.conf.set("spark.sql.files.maxPartitionBytes", orig_mpb)
    a, b = results
    assert a == b, (
        f"{name}: result depends on physical layout "
        f"({len(a)} vs {len(b)} rows; first diff: "
        f"{next((x for x, y in zip(a, b) if x != y), 'row count')})"
    )
