"""Hand-computed tests for the round-9 drift monitors and the
sliding-window duplicated-span remover: planted cross-document spans
(including one straddling a 5-token chunk boundary — the case the
chunk-aligned dedup misses by construction), and known-answer PSI/KS
values on 8-row order populations."""

from __future__ import annotations

import math

from fhir_to_lakehouse_spark.plans.dedup import dedup_span_removal
from fhir_to_lakehouse_spark.plans.quality_checks import (
    quality_ks_two_sample,
    quality_psi_drift,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderstatus string"
    )


def test_span_removal_planted_cross_doc_run(spark, tmp_path):
    # c1..c6 is a 6-token run shared by docs 1 and 2 — at token offset
    # 3 in doc 1 (straddling the 5-token chunk boundary, so the
    # chunk-aligned remover would NOT cut it there) and offset 1 in
    # doc 2. It yields exactly two duplicated 5-grams
    # ("c1..c5", "c2..c6") covering positions 3-8 / 1-6.
    d = _docs(
        spark,
        [
            (1, "u1 u2 c1 c2 c3 c4 c5 c6 a1 a2", "en", "t", 30),
            (2, "c1 c2 c3 c4 c5 c6 b1 b2 b3", "en", "t", 27),
            (3, "z1 z2 z3 z4 z5 z6 z7", "en", "t", 20),  # all unique
            (4, "tiny doc", "en", "t", 8),  # < 5 tokens: no grams
        ],
    )
    d.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r for r in dedup_span_removal(spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["n_tokens"] == 10
    assert out[1]["n_removed"] == 6
    assert out[1]["removed_frac"] == 0.6
    assert out[1]["cleaned_text"] == "u1 u2 a1 a2"
    assert out[2]["n_removed"] == 6
    assert out[2]["cleaned_text"] == "b1 b2 b3"
    assert out[2]["removed_frac"] == round(6 / 9, 6)
    assert out[3]["n_removed"] == 0
    assert out[3]["cleaned_text"] == "z1 z2 z3 z4 z5 z6 z7"
    assert out[4]["n_removed"] == 0
    assert out[4]["cleaned_text"] == "tiny doc"


def test_span_removal_within_doc_repeat_survives(spark, tmp_path):
    # The same 5-gram twice INSIDE one document is not cross-document
    # duplication (distinct-doc count 1) — nothing is removed.
    d = _docs(
        spark,
        [
            (1, "r1 r2 r3 r4 r5 x r1 r2 r3 r4 r5", "en", "t", 33),
            (2, "q1 q2 q3 q4 q5 q6", "en", "t", 18),
        ],
    )
    d.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r for r in dedup_span_removal(spark, str(tmp_path)).collect()
    }
    assert out[1]["n_removed"] == 0
    assert out[1]["cleaned_text"] == "r1 r2 r3 r4 r5 x r1 r2 r3 r4 r5"


def test_psi_known_answer(spark, tmp_path):
    # bin 0 (< 50k): ref 3/4 vs cur 1/4; bin 1: ref 1/4 vs cur 3/4.
    # Each bin's PSI term is 0.5 * ln(3) = 0.549306; status P excluded.
    rows = (
        [(i, 10_000.0, "F") for i in range(3)]
        + [(3, 60_000.0, "F")]
        + [(4, 10_000.0, "O")]
        + [(5 + i, 60_000.0, "O") for i in range(3)]
        + [(8, 10_000.0, "P")]
    )
    _orders(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = {r["bin"]: r for r in quality_psi_drift(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1}
    term = round(0.5 * math.log(3), 6)
    assert out[0]["ref_n"] == 3 and out[0]["cur_n"] == 1
    assert out[0]["ref_frac"] == 0.75 and out[0]["cur_frac"] == 0.25
    assert out[0]["psi_term"] == term
    assert out[1]["psi_term"] == term


def test_ks_known_answer_across_buckets(spark, tmp_path):
    # Supports span three 50k range buckets, exercising the
    # distributed prefix sum's offset path. CDF gap is 1/3 at every
    # pooled support value below the max -> D = 0.333333.
    rows = [
        (0, 10_000.0, "F"),
        (1, 60_000.0, "F"),
        (2, 120_000.0, "F"),
        (3, 60_000.0, "O"),
        (4, 120_000.0, "O"),
        (5, 200_000.0, "O"),
        (6, 1.0, "P"),  # excluded
    ]
    _orders(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    [r] = quality_ks_two_sample(spark, str(tmp_path)).collect()
    assert r["n_ref"] == 3 and r["n_cur"] == 3
    assert r["ks_stat"] == round(1 / 3, 6)
