"""KeyedTable sink goldens: upsert/delete/read-back/optimize/vacuum."""

from __future__ import annotations

from pyspark.sql import types as T

from fhir_to_lakehouse_spark.sinks.keyed_table import KeyedTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("v", T.IntegerType()),
    ]
)


def make(spark, tmp_path):
    return KeyedTable(spark, str(tmp_path / "t.parquet"), key="id")


def df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_upsert_insert_then_update(spark, tmp_path):
    t = make(spark, tmp_path)
    t.merge_upsert(df(spark, [("a", 1), ("b", 2)]))
    assert t.to_df().count() == 2
    t.merge_upsert(df(spark, [("b", 20), ("c", 3)]))
    out = {r["id"]: r["v"] for r in t.to_df().collect()}
    assert out == {"a": 1, "b": 20, "c": 3}


def test_merge_delete(spark, tmp_path):
    t = make(spark, tmp_path)
    t.merge_upsert(df(spark, [("a", 1), ("b", 2), ("c", 3)]))
    t.merge_delete(df(spark, [("b", 0)]).select("id"))
    assert sorted(r["id"] for r in t.to_df().collect()) == ["a", "c"]


def test_delete_on_missing_table_is_noop(spark, tmp_path):
    t = make(spark, tmp_path)
    t.merge_delete(df(spark, [("x", 0)]).select("id"))
    assert not t.exists()


def test_create_if_not_exists_idempotent(spark, tmp_path):
    t = make(spark, tmp_path)
    t.create_if_not_exists(SCHEMA)
    t.create_if_not_exists(SCHEMA)
    assert t.exists() and t.to_df().count() == 0


def test_optimize_compacts_files(spark, tmp_path):
    t = make(spark, tmp_path)
    t.merge_upsert(df(spark, [(str(i), i) for i in range(100)]).repartition(8))
    t.optimize(target_files=1)
    assert t.to_df().count() == 100
    assert t.detail()["numFiles"] == 1


def test_vacuum_noop_without_garbage(spark, tmp_path):
    t = make(spark, tmp_path)
    t.merge_upsert(df(spark, [("a", 1)]))
    t.vacuum(0.0)
    assert t.to_df().count() == 1


def test_duplicate_key_source_rejected(spark, tmp_path):
    """Both backends reject ambiguous merge sources: Delta MERGE errors
    on multiple source matches; the fallback raises up front."""
    import pytest

    from fhir_to_lakehouse_spark.sinks.keyed_table import DuplicateKeySourceError

    t = make(spark, tmp_path)
    t.merge_upsert(df(spark, [("a", 1)]))
    with pytest.raises(DuplicateKeySourceError):
        t.merge_upsert(df(spark, [("a", 2), ("a", 3)]))
    # table untouched by the failed merge
    assert {r["id"]: r["v"] for r in t.to_df().collect()} == {"a": 1}


def test_duplicate_key_probe_can_be_disabled(spark, tmp_path):
    t = KeyedTable(
        spark,
        str(tmp_path / "t.parquet"),
        key="id",
        verify_unique_source=False,
    )
    t.merge_upsert(df(spark, [("a", 2), ("a", 3)]))
    assert t.to_df().count() == 2  # documented: caller owns uniqueness


def test_swap_crash_window_recovers_stranded_table(spark, tmp_path):
    """Simulate a crash between the two swap renames: path missing,
    pre-swap data stranded in .tmp-old-*. exists()/reads must restore
    it instead of treating the table as absent (which would make the
    next merge silently drop all pre-existing rows)."""
    import os

    t = make(spark, tmp_path)
    t.merge_upsert(df(spark, [("a", 1), ("b", 2)]))
    # crash simulation: rename path -> .tmp-old-xyz and stop there
    stranded = f"{t.path}.tmp-old-deadbeef"
    os.rename(t.path, stranded)
    assert not os.path.exists(t.path)
    assert t.exists()  # recovery ran
    assert {r["id"]: r["v"] for r in t.to_df().collect()} == {"a": 1, "b": 2}
    # and a merge after recovery keeps the pre-existing rows
    t.merge_upsert(df(spark, [("c", 3)]))
    assert t.to_df().count() == 3


def test_vacuum_does_not_sweep_stranded_table(spark, tmp_path):
    import os

    t = make(spark, tmp_path)
    t.merge_upsert(df(spark, [("a", 1)]))
    os.rename(t.path, f"{t.path}.tmp-old-cafe0000")
    t.vacuum(0.0)  # must recover, not delete, the stranded copy
    assert t.to_df().count() == 1


def test_retry_skips_deterministic_errors(spark, tmp_path):
    """AnalysisException/validation errors must fail fast, not burn the
    5-attempt backoff re-running a deterministic failure."""
    import time as _time

    from fhir_to_lakehouse_spark.sinks.keyed_table import retry

    calls = {"n": 0}

    @retry(attempts=5, base_s=0.2)
    def bad():
        calls["n"] += 1
        raise ValueError("deterministic")

    t0 = _time.monotonic()
    try:
        bad()
    except ValueError:
        pass
    assert calls["n"] == 1
    assert _time.monotonic() - t0 < 0.2


def test_fallback_rejects_remote_scheme(spark):
    """Without Delta, a remote-scheme path must fail construction:
    exists() would be os.path.exists('s3a://...') == False forever, so
    merge_delete would silently no-op and every merge would rewrite an
    'initial' table."""
    import pytest as _pytest

    from fhir_to_lakehouse_spark.session import delta_available
    from fhir_to_lakehouse_spark.sinks.keyed_table import KeyedTable

    if delta_available():
        _pytest.skip("Delta backend handles remote schemes")
    with _pytest.raises(ValueError, match="Delta backend"):
        KeyedTable(spark, "s3a://bucket/Patient.parquet")
    # local URI forms stay accepted (both Hadoop renderings)
    KeyedTable(spark, "file:///tmp/t.parquet")
    KeyedTable(spark, "file:/tmp/t.parquet")


def test_known_empty_fast_path_revalidates_on_disk(spark, tmp_path):
    """The initial-write fast path must not trust the in-memory
    _known_empty flag blindly (ADVICE r12): a second writer to the
    same path after our create_if_not_exists would be clobbered by
    the fast-path swap. The _SUCCESS stamp check detects the foreign
    write and falls back to the full anti-join merge."""
    a = make(spark, tmp_path)
    b = KeyedTable(spark, str(tmp_path / "t.parquet"), key="id")
    a.create_if_not_exists(SCHEMA)
    assert a._fresh_empty()
    # a foreign instance lands rows in the same path
    b.merge_upsert(df(spark, [("x", 1)]))
    assert not a._fresh_empty()
    # our merge must now PRESERVE the foreign row, not clobber it
    a.merge_upsert(df(spark, [("y", 2)]))
    got = {(r["id"], r["v"]) for r in a.to_df().collect()}
    assert got == {("x", 1), ("y", 2)}
