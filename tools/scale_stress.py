"""Scaling-curve stress: synthesize a 10x corpus (sf1-equivalent) from
sf0.1 and time the single-table workloads at sf0.01 / sf0.1 / sf1 to
measure how cost grows with data. No oracle at sf1 — this is the
perf-shape check behind SCALING.md's 100x claims, run on demand:

    python tools/scale_stress.py            # all default queries
    python tools/scale_stress.py q1 q2 ...  # subset

The synthetic sf1 documents table has deliberate duplicate structure:
each sf0.1 doc appears 10x — 5 copies byte-identical (exact-dup load)
and 5 with one extra token appended (near-dup load, J ~ 0.9) — so the
dedup operators face a WORSE duplicate mix than real data, not a
trivially unique corpus. Events/embeddings are id-shifted copies.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/sfscale"

QUERIES_TO_RUN = [
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_prefix_filter_join",
    "decontaminate_bloom_prefilter",
    "text_term_frequency",
    "text_trigram_lm_counts",
    "corpus_curation_funnel",
    "corpus_leakproof_split",
    "events_sessionize",
    "events_time_rollup",
    "events_changepoint_cusum",
    "similarity_matmul_topk",
    "similarity_ivf_topk",
    # retrieval family (VERDICT r4 item 7): bm25's persisted tf
    # aggregate and the postings-list slice cap are the guards under
    # validation — the 10x corpus has 10x docs per term, so an
    # uncapped postings list would grow superlinearly in build+store
    "search_bm25_topk",
    "search_inverted_postings",
    # round 5: the two CC algorithms on the 10x duplicate-heavy pair
    # graph — label propagation's per-round cost vs star contraction's
    # bounded round count, same answer (shared oracle)
    "dedup_cluster_components",
    "dedup_cluster_components_star",
    # round 7 (VERDICT r6 item 8): the bucketized interval join — the
    # quadratic corner under validation is buckets-per-session (a
    # session spanning H hours explodes into H+1 bucket rows);
    # main() also prints the measured bucket-multiplicity bound
    "events_interval_join_bucketized",
    # round 7 (cont.): the subsumption BFS — 10x parts deepen the
    # binary-tree hierarchy by ~3 levels (log2), so the guard under
    # validation is rounds x per-round cost, not data volume; the
    # cohort compartment union scales with the fact scans only
    "terminology_subsumed_by",
    "compartment_patient_everything",
    # round 8: trigram scoring joins the 3x-amplified gram stream back
    # to its own count tables — the n-gram-keyed shuffle join is the
    # cost under validation; interval coalescing should stay ~linear
    # (one user_id exchange); domain quality is a broadcast-dim join
    "text_trigram_perplexity",
    "events_interval_coalesce",
    "corpus_domain_quality_filter",
    # round 9: sliding-window span dedup (gram aggregate on the
    # duplicate-heavy corpus) and time-series shape search (10x users
    # = 10x window rows, per-user series length unchanged)
    "dedup_span_removal",
    "timeseries_znorm_subsequence_topk",
    # round 9 cont.: full-headline coverage. The TPC-H facts now scale
    # 10x with consistent key shifts (see synthesize()), so the
    # relational headline queries get real 10x curves too: fixed dims
    # mean every dim join is 10x denser per key, the global sorts/
    # percentiles see 6M lineitems, pagerank's trade graph gets 10x
    # edges, and the recursive referral CTE gains ~log2(10) levels.
    "q1_pricing_summary",
    "q3_top_unshipped_orders",
    "q5_local_supplier_volume",
    "join_left_outer_order_counts",
    "agg_distinct_parts_per_supplier",
    "window_topk_orders_per_customer",
    "percentile_exact_prices",
    "asof_join_last_click_before_purchase",
    "pipeline_latest_per_url",
    "tfidf_top_terms",
    "similarity_brute_topk",
    "quality_linear_filter",
    "dedup_semantic_ivf",
    "text_bpe_pair_counts",
    "similarity_hyperplane_lsh_topk",
    "media_checksums",
    "corpus_epoch_shuffle",
    "quality_constraint_checks",
    "graph_pagerank_trade",
    "quality_ccnet_buckets",
    "quality_gopher_filter",
    "similarity_brute_topk_q500",
    "similarity_matmul_topk_q500",
    "events_funnel_conversion",
    "text_heavy_hitters_exact",
    "pipeline_invoice_decode",
    "viewdef_observation_components",
    "terminology_memberof",
    "fhir_validation_summary",
    "corpus_chunk_sliding",
    "fhir_observation_lastn",
    "search_hybrid_rrf",
    "fhir_comorbidity_pairs",
    "fhir_medication_mpr",
    "recursive_cte_referral_depth",
    "lateral_top_customers_per_nation",
    "pipeline_xml_observation_decode",
]


def interval_join_bucket_stats(spark, sf_dir: str) -> dict[str, float]:
    """Measured buckets-per-session distribution — the blow-up factor
    the bucketized interval join (plans/events.py) pays in exchange
    for an equi join. Under the 30-min-gap sessionization a session
    GROWS only while events keep arriving <30 min apart, so session
    length (and with it bucket multiplicity) is bounded by activity,
    not by data volume: the p99/max printed here validate that the
    explode stays ~1-2 rows per session even on the skew-heavy 10x
    corpus (10x users with identical per-user activity patterns)."""
    from pyspark.sql import functions as F

    from fhir_to_lakehouse_spark.plans.events import _sessionized_events
    from fhir_to_lakehouse_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    sessions = (
        _sessionized_events(ev)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    n_buckets = (
        F.floor(
            (F.unix_timestamp("e") - F.unix_timestamp(F.date_trunc("hour", "s")))
            / 3600
        )
        + 1
    )
    row = (
        sessions.select(n_buckets.cast("double").alias("nb"))
        .agg(
            F.count(F.lit(1)).alias("sessions"),
            F.avg("nb").alias("avg"),
            F.expr("percentile_approx(nb, 0.99)").alias("p99"),
            F.max("nb").alias("max"),
        )
        .collect()[0]
    )
    return {
        "sessions": int(row["sessions"]),
        "avg_buckets": round(float(row["avg"]), 3),
        "p99_buckets": float(row["p99"]),
        "max_buckets": float(row["max"]),
    }


def synthesize(spark, fresh: bool = False) -> None:
    from pyspark.sql import functions as F

    from fhir_to_lakehouse_spark.sources.tables import load_table

    os.makedirs(OUT, exist_ok=True)
    # the synthesis is deterministic, so an existing sf1 dir is
    # byte-equivalent to a fresh one: skip the ~2 min rebuild unless
    # --fresh (or a missing table) says otherwise. The scaled tables
    # must be Spark-written DIRECTORIES — a flat fact FILE is a
    # leftover from the pre-fact-scaling tool (which shutil.copy'd 1x
    # facts) and must trigger a rebuild, or every "sf1" relational
    # curve would silently measure 1x data
    dims = "region nation part supplier".split()
    scaled = "customer orders lineitem documents events embeddings".split()
    # a directory alone isn't proof of a complete write: a run killed
    # mid-write leaves a partial directory without Spark's _SUCCESS
    # marker, and skipping on it would make every later curve silently
    # measure truncated data (ADVICE r9)
    if (
        not fresh
        and all(os.path.exists(os.path.join(OUT, f"{t}.parquet")) for t in dims)
        and all(
            os.path.isdir(os.path.join(OUT, f"{t}.parquet"))
            and os.path.exists(os.path.join(OUT, f"{t}.parquet", "_SUCCESS"))
            for t in scaled
        )
    ):
        return
    # dimensions stay fixed-size (as they would at a real 10x: TPC-H
    # scales facts, not nation/region; part/supplier growth is sublinear
    # and keeping them fixed makes the fact-side join 10x DENSER per
    # dim key — the harder case for broadcast/shuffle joins)
    for t in "region nation part supplier".split():
        src = os.path.join(BASE, f"{t}.parquet")
        dst = os.path.join(OUT, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copy(src, dst)

    # facts scale 10x with CONSISTENT key shifts so referential
    # integrity holds: customer copy i shifts c_custkey by i*ncust;
    # orders copy i shifts o_orderkey by i*nord and o_custkey by the
    # same i*ncust (each order still points at a valid customer);
    # lineitem copy i shifts l_orderkey by i*nord (l_partkey/l_suppkey
    # unshifted -> 10x lineitems per part/supplier). Date/price columns
    # untouched, so selectivity of every filter is scale-invariant.
    from functools import reduce

    def _next_key(df, col: str) -> int:
        return df.agg(F.max(col)).collect()[0][0] + 1

    def _write_10x(df, shifts: dict[str, int], table: str, mutate=None):
        """Replicate df 10x, shifting each key column by copy_index *
        its population size (so copies never collide and references
        shifted by the SAME base stay consistent), optionally mutating
        each copy's rows, then write to OUT."""
        parts = []
        for i in range(10):
            c = df
            for col, base_n in shifts.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * base_n))
            if mutate is not None:
                c = mutate(c, i)
            parts.append(c)
        out = reduce(lambda a, b: a.unionByName(b), parts)
        dst = os.path.join(OUT, f"{table}.parquet")
        if os.path.isfile(dst):  # pre-fact-scaling runs copied a flat file
            os.remove(dst)
        out.repartition(32).write.mode("overwrite").parquet(dst)

    cust = load_table(spark, BASE, "customer")
    ords = load_table(spark, BASE, "orders")
    ncust = _next_key(cust, "c_custkey")
    nord = _next_key(ords, "o_orderkey")
    _write_10x(cust, {"c_custkey": ncust}, "customer")
    _write_10x(ords, {"o_orderkey": nord, "o_custkey": ncust}, "orders")
    _write_10x(
        load_table(spark, BASE, "lineitem"), {"l_orderkey": nord}, "lineitem"
    )

    docs = load_table(spark, BASE, "documents")
    _write_10x(
        docs,
        {"doc_id": _next_key(docs, "doc_id")},
        "documents",
        # copies 5-9 are near-dups: one appended token re-keys the
        # fingerprint but leaves ~95% of shingles shared
        mutate=lambda c, i: c.withColumn(
            "text", F.concat("text", F.lit(f" copytoken{i}"))
        )
        if i >= 5
        else c,
    )

    ev = load_table(spark, BASE, "events")
    _write_10x(
        ev,
        {
            "event_id": _next_key(ev, "event_id"),
            "user_id": _next_key(ev, "user_id"),
        },
        "events",
    )

    emb = load_table(spark, BASE, "embeddings")
    _write_10x(emb, {"vec_id": _next_key(emb, "vec_id")}, "embeddings")


def main() -> int:
    from fhir_to_lakehouse_spark.functions.cache import (
        release_all_persistent_rdds,
    )
    from fhir_to_lakehouse_spark.plans import QUERIES
    from fhir_to_lakehouse_spark.session import get_spark

    args = sys.argv[1:]
    fresh = "--fresh" in args
    names = [a for a in args if not a.startswith("--")] or QUERIES_TO_RUN
    spark = get_spark("scale-stress")
    synthesize(spark, fresh=fresh)

    # unrecorded JVM/JIT warmer: the first query of a sweep otherwise
    # pays codegen-compiler cold start in ITS medians (the r9 full
    # table's dedup_exact_groups artifact); one throwaway aggregate
    # run warms the machinery all entries share
    QUERIES[names[0]](spark, BASE).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()
    release_all_persistent_rdds(spark)

    results: dict[str, dict[str, float]] = {}
    for name in names:
        results[name] = {}
        for label, sf_dir in (
            ("sf0.01", "/root/testdata/sf0.01"),
            ("sf0.1", BASE),
            ("sf1", OUT),
        ):
            # warm-up + median of 3, same policy as bench.py — and the
            # same clock placement: the BUILD is inside the timed
            # window, because iterative builders (CC, BPE) do their
            # rounds at build time and a post-build clock would time
            # only the final projection
            times = []
            for i in range(4):
                t0 = time.perf_counter()
                df = QUERIES[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - t0)
                # cold protocol (code-review finding): clear INSIDE the
                # loop, or passes 1-3 read pass-0's persisted plans and
                # the reported median is warm, not cold; the RDD sweep
                # also frees the CC entries' localCheckpoint blocks,
                # which clearCache cannot see (functions/cache.py)
                spark.catalog.clearCache()
                release_all_persistent_rdds(spark)
            timed = sorted(times[1:])
            results[name][label] = round(timed[1], 3)
        r = results[name]
        ratio = r["sf1"] / max(r["sf0.1"], 1e-9)
        print(
            f"{name:36s} {r['sf0.01']:7.2f} {r['sf0.1']:7.2f} "
            f"{r['sf1']:7.2f}   x{ratio:.1f} for 10x data",
            flush=True,
        )
    if "events_interval_join_bucketized" in names:
        stats = {
            label: interval_join_bucket_stats(spark, sf_dir)
            for label, sf_dir in (("sf0.1", BASE), ("sf1", OUT))
        }
        results["_interval_join_bucket_stats"] = stats
        for label, s in stats.items():
            print(
                f"interval-join buckets/session @{label}: "
                f"avg {s['avg_buckets']} p99 {s['p99_buckets']} "
                f"max {s['max_buckets']} over {s['sessions']} sessions",
                flush=True,
            )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
