"""Value assertions for the sketch-based rows-only registry entries
(VERDICT r3 item 7): approx_count_distinct / percentile_approx sketch
internals and JVM xxhash64 aren't reproducible in DuckDB, so the
driver's oracle shows `no_oracle` — these tests are the standing
verification cited in COVERAGE.md.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.plans import QUERIES
from fhir_to_lakehouse_spark.sources.tables import load_table


def test_approx_distinct_sketch_within_rsd(spark, sf_dir):
    """HLL++ at rsd=0.02 must land within 3 sigma (6%) of the exact
    distinct count for every group. The registry output now carries the
    verdict column (its raw estimate moved out so the DuckDB oracle
    can value-check the row); this test recomputes the estimate
    INDEPENDENTLY from the table so the bound is still asserted on raw
    values, not on the query's own verdict alone."""
    rows = QUERIES["approx_distinct_sketch"](spark, sf_dir).collect()
    assert rows
    assert all(r["within_3rsd"] == 1 for r in rows)
    li = load_table(spark, sf_dir, "lineitem")
    indep = {
        r["l_returnflag"]: (r["approx"], r["exact"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
            F.countDistinct("l_orderkey").alias("exact"),
        )
        .collect()
    }
    for r in rows:
        approx, exact = indep[r["l_returnflag"]]
        assert r["exact_orders"] == exact
        assert abs(approx - exact) / exact < 0.06


def test_approx_percentile_sketch_rank_error_bounded(spark, sf_dir):
    """percentile_approx(accuracy=10000) guarantees rank error
    <= N/accuracy. The sketch returns an actual data value (no
    interpolation), so the right check is rank-based: the value's rank
    interval in the sorted group must cover the target rank q*N within
    the guaranteed error plus one for rank-rounding."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    got = QUERIES["approx_percentile_sketch"](spark, sf_dir).collect()
    assert got
    # the registry output is now the rank gate itself (oracle-checkable)
    for r in got:
        for c in ("p50_rank_ok", "p90_rank_ok", "p99_rank_ok"):
            assert r[c] == 1, (r["l_returnflag"], c)
    # independent re-derivation: recompute the sketch values directly
    # from the table and rank-check them here, so the bound is asserted
    # on raw values, not on the query's own verdict alone
    pcts = F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000)
    sk = {
        r["l_returnflag"]: (r["vs"][0], r["vs"][1], r["vs"][2])
        for r in li.groupBy("l_returnflag").agg(pcts.alias("vs")).collect()
    }
    for r in got:
        flag = r["l_returnflag"]
        grp = li.filter(F.col("l_returnflag") == flag)
        n = grp.count()
        assert n == r["n"]
        err = n / 10000 + 1
        for q, val in zip([0.5, 0.9, 0.99], sk[flag]):
            rank_lo = grp.filter(F.col("l_extendedprice") < val).count()
            rank_hi = grp.filter(F.col("l_extendedprice") <= val).count()
            target = q * n
            assert rank_lo - err <= target <= rank_hi + err, (
                f"{flag} q={q}: value {val} spans ranks "
                f"[{rank_lo},{rank_hi}], target {target:.1f}, err {err:.1f}"
            )


def test_minhash_xxhash_twin_matches_md5_twin(spark, sf_dir):
    """The production xxhash64 MinHash must be structurally equivalent
    to its oracle-checked md5 twin: identical candidate PAIR SET (both
    LSH layouts catch the same near-dups on this corpus — measured
    exactly equal at seed defaults), and per-pair similarity estimates
    within MinHash sampling variance of each other (16 vs 12
    independent hashes -> sd of the difference ~0.16 at J=0.5; the
    0.35 bound is >2 sigma; measured max 0.1875)."""
    md5 = {
        (r["id_a"], r["id_b"]): r["est_sim"]
        for r in QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    from fhir_to_lakehouse_spark.plans.dedup import xxhash_lsh_est_pairs
    from fhir_to_lakehouse_spark.sources.tables import (
        fan_out_small_scan,
        load_table,
    )

    xx = {
        (r["id_a"], r["id_b"]): r["est_sim"]
        for r in xxhash_lsh_est_pairs(
            fan_out_small_scan(load_table(spark, sf_dir, "documents"))
        ).collect()
    }
    assert md5, "md5 twin found no pairs — fixture drifted"
    assert set(md5) == set(xx)
    for k in md5:
        assert abs(md5[k] - xx[k]) <= 0.35, (k, md5[k], xx[k])
    # both twins should agree that estimates are probabilities
    assert all(0.0 <= v <= 1.0 for v in list(md5.values()) + list(xx.values()))
