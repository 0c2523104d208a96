"""Keyed mutable table sink: MERGE upsert / MERGE delete semantics.

Reference parity (J1/J2 at /root/reference/src/bundle_processor.py:
256-262 and 287-292): one table per resource type, upsert on PUT
(``whenMatchedUpdateAll + whenNotMatchedInsertAll`` on ``s.id = t.id``),
delete on DELETE (``whenMatchedDelete``), with app-level retry on
concurrent-write conflicts (:240-244).

Two backends behind one API:
- **Delta** (when delta-spark jars are present): real ``DeltaTable
  .merge`` — Delta compiles MERGE to a join, AQE broadcasts the small
  micro-batch side; liquid-clustering/optimize/vacuum supported.
  This is the production path at 100 TB: merge touches only files
  whose min/max id-stats overlap the batch keys (data skipping), not
  the whole table.
- **Parquet fallback** (this container): copy-on-write rewrite —
  new = batch ∪ (existing ⟕anti batch). Correct same semantics;
  rewrite cost is proportional to table size, which is acceptable for
  tests and clearly documented as the non-Delta degradation.

Write atomicity in the fallback: write to ``<path>.tmp-<n>`` then swap
directories, so a reader never sees a half-written table.
"""

from __future__ import annotations

import functools
import os
import re
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.session import delta_available


class DuplicateKeySourceError(ValueError):
    """Source of a merge has multiple rows per key. Delta MERGE raises
    when several source rows match one target row; the fallback raises
    up front for ANY duplicated key so both backends reject ambiguous
    sources instead of silently keeping both rows (strictly stronger:
    Delta tolerates duplicate keys that match no target row and inserts
    both — rows the next merge would then fail on)."""


def _non_retryable(exc: Exception) -> bool:
    """Deterministic failures that retrying cannot fix — re-running an
    AnalysisException (missing column/table, type mismatch) or a
    validation error 5x with sleeps only delays the real traceback.
    Everything else (Delta concurrent-commit conflicts, transient IO)
    stays retryable, like the reference's tenacity policy."""
    try:
        from pyspark.errors import AnalysisException, IllegalArgumentException

        if isinstance(exc, (AnalysisException, IllegalArgumentException)):
            return True
    except ImportError:
        pass
    return isinstance(exc, (ValueError, TypeError))


def retry(attempts: int = 5, base_s: float = 0.05, cap_s: float = 30.0):
    """Exponential-backoff retry — thin replacement for the reference's
    tenacity decorators (/root/reference/src/bundle_processor.py:240-244,
    backoff 5-30 s, 5 attempts; shorter base locally). Deterministic
    errors (analysis/validation) are raised immediately."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            delay = base_s
            for i in range(attempts):
                try:
                    return fn(*args, **kwargs)
                except Exception as exc:
                    if i == attempts - 1 or _non_retryable(exc):
                        raise
                    time.sleep(min(delay, cap_s))
                    delay *= 2

        return wrapper

    return deco


class KeyedTable:
    """A mutable table keyed on ``key`` at ``path``."""

    # reference delta.* table-property defaults (settings.py:43-49,
    # applied at create: bundle_processor.py:172-196)
    DEFAULT_TABLE_PROPERTIES = {
        "delta.autoOptimize.autoCompact": "false",
        "delta.autoOptimize.optimizeWrite": "false",
        "delta.checkpointInterval": "100",
        "delta.checkpoint.writeStatsAsJson": "false",
        "delta.checkpoint.writeStatsAsStruct": "true",
    }

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str = "id",
        sort_on_write: bool = True,
        changelog: bool = False,
        verify_unique_source: bool = True,
        table_properties: dict[str, str] | None = None,
    ):
        self.spark = spark
        self.path = path
        # the fallback's directory swaps/sweeps run through os.*, which
        # needs a plain filesystem path; Spark reads/writes accept the
        # URI form unchanged. Hadoop renders local URIs as both
        # file:///p and file:/p — strip either. Other schemes (s3a://)
        # have no parquet fallback — they require the Delta backend.
        self._os_path = path
        if path.startswith("file:"):
            self._os_path = "/" + path.removeprefix("file:").lstrip("/")
        self.key = key
        self._delta = delta_available() and not os.environ.get("FORCE_PARQUET_SINK")
        # enforce the comment above: on a remote scheme without Delta,
        # exists() would os.path.exists("s3a://...") == False forever —
        # merge_delete no-ops and every merge rewrites an "initial"
        # table. Fail construction instead of corrupting silently.
        if not self._delta and re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", path) and not (
            path.startswith("file:")
        ):
            raise ValueError(
                f"KeyedTable parquet fallback only supports local paths; "
                f"{path!r} needs the Delta backend (delta-spark on the "
                f"classpath)"
            )
        # fallback merge guard: reject duplicate-key sources like Delta
        # MERGE would. Callers that provably dedup first (the pipeline's
        # latest_per_key) may disable to skip the probe job.
        self.verify_unique_source = verify_unique_source
        # fallback-path analog of Delta optimizeWrite/liquid clustering:
        # sorting by key within partitions tightens per-file min/max
        # statistics, so later key lookups and merge joins skip files
        self.sort_on_write = sort_on_write
        # Change Data Feed analog (delta.enableChangeDataFeed): every
        # merge also appends its row-level changes (_change_type +
        # commit_version) to <path>.changelog for incremental consumers
        self.changelog = changelog
        # set when the parquet fallback just wrote a ZERO-ROW table via
        # create_if_not_exists: the next merge_upsert can take the
        # initial-write fast path instead of reading the empty table
        # back through the full anti-join/union machinery (a first
        # batch on a fresh warehouse pays that per resource type).
        # Any _swap_write clears it; _fresh_empty() re-validates the
        # flag against the on-disk _SUCCESS stamp before the fast path
        # trusts it, so a second writer to the same path is never
        # clobbered (ADVICE r12).
        self._known_empty = False
        self._empty_stamp: tuple[int, int] | None = None
        self.table_properties = (
            dict(table_properties)
            if table_properties is not None
            else dict(self.DEFAULT_TABLE_PROPERTIES)
        )

    @property
    def is_delta(self) -> bool:
        """True when this table runs on the Delta backend (callers that
        piggyback work on merge jobs need to know which engine plans
        the merge)."""
        return self._delta

    # -- existence / read ------------------------------------------------

    def _fresh_empty(self) -> bool:
        """True only while the zero-row table THIS instance created is
        still what's on disk. The in-memory flag alone is not enough:
        another KeyedTable instance (or process) writing to the same
        path after our create_if_not_exists would be silently clobbered
        by the fast-path _swap_write. One stat() of _SUCCESS re-validates
        — any foreign _swap_write replaces the directory, giving the
        marker a new inode/mtime."""
        if not self._known_empty or self._empty_stamp is None:
            return False
        try:
            st = os.stat(os.path.join(self._os_path, "_SUCCESS"))
        except OSError:
            return False
        return (st.st_mtime_ns, st.st_ino) == self._empty_stamp

    def exists(self) -> bool:
        if self._delta:
            from delta.tables import DeltaTable

            return DeltaTable.isDeltaTable(self.spark, self.path)
        self._recover_stranded()
        return os.path.exists(os.path.join(self._os_path, "_SUCCESS"))

    def _recover_stranded(self) -> None:
        """Crash recovery for the fallback swap: a failure between
        rename(path -> old) and rename(tmp -> path) leaves no table at
        ``path`` while the pre-swap data sits in a ``.tmp-old-*``
        sibling. Without recovery, exists() would report False and the
        next merge would silently discard every pre-existing row.
        Restore the newest complete stranded copy before answering any
        existence/read question."""
        if os.path.exists(self._os_path):
            return
        parent, base = os.path.split(self._os_path.rstrip("/"))
        if not os.path.isdir(parent):
            return
        stranded = [
            os.path.join(parent, d)
            for d in os.listdir(parent)
            if d.startswith(f"{base}.tmp-old-")
            and os.path.exists(os.path.join(parent, d, "_SUCCESS"))
        ]
        if stranded:
            newest = max(stranded, key=os.path.getmtime)
            os.rename(newest, self._os_path)

    def to_df(self) -> DataFrame:
        """Read back (reference S8: DeltaTable.forPath(...).toDF())."""
        if self._delta:
            from delta.tables import DeltaTable

            return DeltaTable.forPath(self.spark, self.path).toDF()
        return self.spark.read.parquet(self.path)

    # -- DDL -------------------------------------------------------------

    def create_if_not_exists(
        self, schema, cluster_by: list[str] | None = None
    ) -> None:
        """Idempotent create with table properties + optional liquid
        clustering (reference S6,
        /root/reference/src/bundle_processor.py:172-204)."""
        if self._delta:
            from delta.tables import DeltaTable

            builder = (
                DeltaTable.createIfNotExists(self.spark)
                .location(self.path)
                .addColumns(schema)
            )
            # property set + values from settings, reference defaults
            # (bundle_processor.py:172-196 / settings.py:43-49)
            for k, v in self.table_properties.items():
                builder = builder.property(k, v)
            if cluster_by:
                builder = builder.clusterBy(*cluster_by)
            builder.execute()
        elif not self.exists():
            # repartition(1): an empty frame otherwise inherits
            # default-parallelism partitions and the commit protocol
            # pays per-task setup for dozens of empty writers (~2 s on
            # local[32] for a zero-row table; one task is ~0.4 s)
            self.spark.createDataFrame([], schema).repartition(1).write.mode(
                "overwrite"
            ).parquet(self.path)
            try:
                st = os.stat(os.path.join(self._os_path, "_SUCCESS"))
                self._empty_stamp = (st.st_mtime_ns, st.st_ino)
                self._known_empty = True
            except OSError:  # pragma: no cover — marker missing: no fast path
                self._known_empty = False

    # -- MERGE -----------------------------------------------------------

    def _check_unique_source(self, src: DataFrame) -> None:
        if not self.verify_unique_source:
            return
        dup = (
            src.groupBy(self.key)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise DuplicateKeySourceError(
                f"merge source has multiple rows for key "
                f"{self.key}={dup[0][self.key]!r}; dedup the source "
                f"(e.g. latest_per_key) before merging"
            )

    @retry()
    def merge_upsert(self, src: DataFrame) -> None:
        """J1: upsert rows of ``src`` by key (latest batch row wins)."""
        if self._delta:
            from delta.tables import DeltaTable

            # Delta path: CDF comes from delta.enableChangeDataFeed +
            # table_changes(), not from this class
            (
                DeltaTable.forPath(self.spark, self.path)
                .alias("t")
                .merge(src.alias("s"), f"s.{self.key} = t.{self.key}")
                .whenMatchedUpdateAll()
                .whenNotMatchedInsertAll()
                .execute()
            )
            return
        self._check_unique_source(src)
        if not self.exists() or self._fresh_empty():
            # initial write (or the table was just created EMPTY by
            # create_if_not_exists): merging into zero rows is the
            # source itself — skip reading the empty table back and
            # the anti-join/union pass
            if self.changelog:
                self._append_changes(src.withColumn("_change_type", F.lit("insert")))
            self._swap_write(src)
            return
        # Read the existing table through the SOURCE frame's session,
        # not self.spark: inside a streaming foreachBatch the batch df
        # belongs to the stream's CLONED session, and a merge plan
        # rooted on a self.spark read would execute under the original
        # session's UUID — so a listener registered on the clone (the
        # pipeline's Observation counts) never sees the completion
        # event and Observation.get blocks forever (reproduced:
        # test_recovery_processes_only_new_data_after_commit hung on
        # the first post-create merge). Executing the whole merge in
        # the caller's session is also simply correct — its confs are
        # the ones in force for this batch.
        existing = src.sparkSession.read.parquet(self.path)
        if self.changelog:
            matched_keys = src.select(self.key).distinct()
            pre = existing.join(matched_keys, on=self.key, how="left_semi")
            post = src.join(
                existing.select(self.key).distinct(), on=self.key, how="left_semi"
            )
            ins = src.join(existing.select(self.key), on=self.key, how="left_anti")
            self._append_changes(
                pre.withColumn("_change_type", F.lit("update_preimage"))
                .unionByName(
                    post.withColumn("_change_type", F.lit("update_postimage")),
                    allowMissingColumns=True,
                )
                .unionByName(
                    ins.withColumn("_change_type", F.lit("insert")),
                    allowMissingColumns=True,
                )
            )
        keep = existing.join(
            src.select(self.key), on=self.key, how="left_anti"
        )
        self._swap_write(keep.unionByName(src, allowMissingColumns=True))

    @retry()
    def merge_delete(self, ids: DataFrame, id_col: str | None = None) -> None:
        """J2: delete rows whose key appears in ``ids`` (semi-join-shaped
        merge, reference /root/reference/src/bundle_processor.py:287-292).
        """
        id_col = id_col or self.key
        if self._delta:
            from delta.tables import DeltaTable

            (
                DeltaTable.forPath(self.spark, self.path)
                .alias("t")
                .merge(ids.alias("s"), f"s.{id_col} = t.{self.key}")
                .whenMatchedDelete()
                .execute()
            )
            return
        if not self.exists():
            return
        existing = self.to_df()
        if self.changelog:
            deleted = existing.join(
                ids.select(F.col(id_col).alias(self.key)),
                on=self.key,
                how="left_semi",
            )
            self._append_changes(
                deleted.withColumn("_change_type", F.lit("delete"))
            )
        keep = existing.join(
            ids.select(F.col(id_col).alias(self.key)),
            on=self.key,
            how="left_anti",
        )
        self._swap_write(keep)

    @retry()
    def merge_scd2(
        self, batch: DataFrame, ts_col: str, tracked: list[str]
    ) -> None:
        """History-keeping upsert (SCD Type 2): closes the previous
        version of each changed key and inserts the new one, instead of
        updating in place like :meth:`merge_upsert`. See operators/scd.py
        for semantics. On Delta this would be two data-skipping MERGEs
        (close + insert); the fallback rewrites via the same atomic swap.
        """
        from fhir_to_lakehouse_spark.operators.scd import apply_scd2

        existing = self.to_df() if self.exists() else None
        self._swap_write(
            apply_scd2(existing, batch, self.key, ts_col, tracked)
        )

    # -- maintenance (reference S13/S14, lakehousekeeper parity) ---------

    def optimize(
        self,
        target_files: int | None = None,
        zorder_by: list[str] | None = None,
    ) -> None:
        """Compaction: Delta OPTIMIZE (plain or ZORDER BY), or a
        rewrite in the parquet fallback (reference
        /root/reference/src/bundle_processor.py:310).

        With ``zorder_by``, the fallback performs the real OPTIMIZE
        ZORDER BY layout change: numeric dimensions are normalized to
        bucket ordinals against their observed min/max (one aggregate
        pass -> a handful of driver scalars), interleaved into a
        Morton key (functions/layout.py — pure Catalyst bit
        expressions), and the table is range-partitioned + sorted by
        that key so per-file min/max statistics tighten in ALL z-order
        dimensions (the point of Z-ordering: multi-dimensional range
        predicates prune files). The write preserves the z-layout
        (presorted=True skips the default key sort)."""
        if self._delta:
            from delta.tables import DeltaTable

            opt = DeltaTable.forPath(self.spark, self.path).optimize()
            if zorder_by:
                opt.executeZOrderBy(*zorder_by)
            else:
                opt.executeCompaction()
            return
        if not self.exists():
            return
        df = self.to_df()
        if zorder_by:
            zkey = self._zorder_expr(df, zorder_by)
            df = df.repartitionByRange(
                target_files or 1, zkey
            ).sortWithinPartitions(zkey)
            self._swap_write(df, presorted=True)
        else:
            self._swap_write(df.coalesce(target_files or 1))

    def _zorder_expr(self, df: DataFrame, cols: list[str]):
        """Morton key over min/max-normalized numeric columns; string
        columns are rejected (rank-based bucketing — what Delta does
        via range ids — needs a sampling pass; numeric covers the
        clustering keys this engine uses)."""
        from fhir_to_lakehouse_spark.functions.layout import morton_key

        numeric = {"int", "bigint", "smallint", "tinyint", "double", "float",
                   "date", "timestamp", "timestamp_ntz"}
        for c in cols:
            base = dict(df.dtypes)[c].split("(")[0]
            if base not in numeric and not base.startswith("decimal"):
                raise ValueError(
                    f"zorder_by column {c!r} has non-numeric type "
                    f"{dict(df.dtypes)[c]!r}; only numeric/temporal "
                    "dimensions are supported in the parquet fallback"
                )
        bits = min(16, 62 // max(len(cols), 1))
        aggs = []
        for i, c in enumerate(cols):
            cd = F.col(c).cast("double")
            aggs += [F.min(cd).alias(f"mn{i}"), F.max(cd).alias(f"mx{i}")]
        row = df.agg(*aggs).collect()[0]
        ordinals = []
        for i, c in enumerate(cols):
            mn, mx = row[f"mn{i}"], row[f"mx{i}"]
            span = (mx - mn) if (mx is not None and mn is not None and mx > mn) else 1.0
            ordinals.append(
                F.least(
                    F.lit(2**bits - 1),
                    F.floor(
                        (F.coalesce(F.col(c).cast("double"), F.lit(mn or 0.0)) - F.lit(mn or 0.0))
                        / F.lit(span)
                        * F.lit(2**bits - 1)
                    ),
                ).cast("long")
            )
        return morton_key(ordinals, bits)

    # Delta's default deletedFileRetentionDuration: 1 week
    RETENTION_FLOOR_HOURS = 168.0

    def vacuum(
        self,
        retention_hours: float = 24.0,
        enforce_retention_duration: bool = False,
    ) -> None:
        """Remove unreferenced files (reference
        /root/reference/src/bundle_processor.py:321). Fallback: clear
        leftover tmp dirs older than retention.

        ``enforce_retention_duration`` mirrors the reference
        lakehousekeeper guard (/root/reference/src/lakehousekeeper.py:
        121-127 / Delta's retentionDurationCheck): when on, a retention
        below the 1-week floor is rejected — vacuuming a window shorter
        than the longest-running reader permanently breaks its
        snapshot. Default off here because the reference app itself
        disables the check session-wide (src/main.py:71); the
        maintenance CLI turns it on by default like the reference CLI.
        """
        if enforce_retention_duration and retention_hours < self.RETENTION_FLOOR_HOURS:
            raise ValueError(
                f"retention_hours={retention_hours} is below the "
                f"{self.RETENTION_FLOOR_HOURS} h retention floor; pass "
                f"enforce_retention_duration=False (CLI: "
                f"--no-enforce-retention-duration) to override"
            )
        if self._delta:
            from delta.tables import DeltaTable

            DeltaTable.forPath(self.spark, self.path).vacuum(retention_hours)
            return
        # recover before sweeping: if the table path is missing, the
        # newest .tmp-old-* sibling IS the table, not garbage
        self._recover_stranded()
        parent, base = os.path.split(self._os_path.rstrip("/"))
        if not os.path.isdir(parent):
            return
        cutoff = time.time() - retention_hours * 3600
        for d in os.listdir(parent):
            if d.startswith(f"{base}.tmp-") and os.path.getmtime(
                os.path.join(parent, d)
            ) < cutoff:
                shutil.rmtree(os.path.join(parent, d), ignore_errors=True)

    def detail(self) -> dict:
        """Table metadata (reference S15 delta_table.detail())."""
        if self._delta:
            import json

            from delta.tables import DeltaTable

            # parse: toJSON().collect() yields a JSON *string*; the
            # fallback branch returns a dict — both backends must agree
            # on the return type (caught by the Delta API double test)
            return json.loads(
                DeltaTable.forPath(self.spark, self.path)
                .detail()
                .toJSON()
                .collect()[0]
            )
        n_files = (
            len([f for f in os.listdir(self._os_path) if f.endswith(".parquet")])
            if self.exists()
            else 0
        )
        return {"location": self.path, "numFiles": n_files, "format": "parquet"}

    # -- change data feed (fallback analog of Delta CDF) -----------------

    @property
    def _changelog_path(self) -> str:
        return f"{self.path.rstrip('/')}.changelog"

    def changelog_version(self) -> int:
        """Latest committed change version, -1 if none."""
        base = f"{self._os_path.rstrip('/')}.changelog"
        if not os.path.isdir(base):
            return -1
        versions = [
            int(d.split("=", 1)[1])
            for d in os.listdir(base)
            if d.startswith("commit_version=")
        ]
        return max(versions, default=-1)

    def table_changes(self, starting_version: int = 0) -> DataFrame:
        """Row-level changes since ``starting_version`` (inclusive) —
        the ``table_changes('t', n)`` TVF analog. Each row carries
        ``_change_type`` (insert | update_preimage | update_postimage |
        delete) and the partition column ``commit_version``, so an
        incremental consumer reads only the new version directories
        (partition pruning on commit_version).

        mergeSchema is ON: the changelog is append-only, so commits
        written before a schema widening (an encoder-catalog upgrade
        adding nested fields) carry the OLD file schema — without
        merging, Spark samples one file's schema and silently DROPS
        the new fields from every post-image, corrupting as_of
        reconstruction and incremental view refresh (regression:
        tests/test_changelog.py::test_change_feed_survives_schema_widening)."""
        df = (
            self.spark.read.option("basePath", self._changelog_path)
            .option("mergeSchema", "true")
            .parquet(self._changelog_path)
        )
        return df.filter(F.col("commit_version") >= starting_version)

    def upserted_since(self, starting_version: int) -> DataFrame:
        """Incremental read off the change feed: the latest post-image
        of every key whose most recent change AT OR AFTER
        ``starting_version`` is not a delete — the Bulk Data `_since`
        export primitive (and any downstream incremental consumer's
        pull). One hot-key-safe grouped max_by over the pruned
        changelog partitions (commit_version >= N), O(changed rows)
        regardless of table size — the same aggregate shape as the W1
        dedup rewrite. Keys created-then-deleted inside the window
        surface as nothing, matching what a full re-export would show.
        """
        ch = self.table_changes(starting_version).filter(
            F.col("_change_type") != "update_preimage"
        )
        data_cols = [
            c
            for c in ch.columns
            if c not in ("_change_type", "commit_version")
        ]
        latest = ch.groupBy(self.key).agg(
            F.max(
                F.struct(
                    F.col("commit_version"),
                    F.col("_change_type").alias("__ct"),
                    F.struct(*data_cols).alias("__row"),
                )
            ).alias("m")
        )
        return latest.filter(F.col("m.__ct") != "delete").select("m.__row.*")

    def as_of(self, version: int) -> DataFrame:
        """Time-travel read: the table state as of changelog commit
        ``version`` (inclusive) — the ``VERSION AS OF`` analog,
        reconstructed by folding the change feed distributedly (one
        hash aggregate: max_by commit_version per key, then drop
        deletes). Partition pruning on commit_version bounds the read
        to versions <= ``version``. Requires ``changelog=True``."""
        if not self.changelog:
            raise ValueError("as_of requires changelog=True on this table")
        effects = (
            self.table_changes(0)
            .filter(F.col("commit_version") <= version)
            .filter(F.col("_change_type") != "update_preimage")
        )
        data_cols = [c for c in effects.columns if c != "commit_version"]
        latest = (
            effects.groupBy(self.key)
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in data_cols]),
                    F.col("commit_version"),
                ).alias("w")
            )
            .select("w.*")
        )
        return latest.filter(F.col("_change_type") != "delete").drop(
            "_change_type"
        )

    def restore_to(self, version: int) -> None:
        """``RESTORE TABLE ... TO VERSION`` analog: rewrite the table to
        its :meth:`as_of` state. Like Delta's RESTORE, the restore is
        itself a NEW commit — the diff (current vs target) is appended
        to the change feed, so history is preserved, never rewritten,
        and incremental consumers see the restore as ordinary changes."""
        target = self.as_of(version).persist()
        target.count()  # snapshot BEFORE the swap invalidates to_df()
        current = self.to_df()
        key = self.key
        dels = current.join(target.select(key), key, "left_anti").withColumn(
            "_change_type", F.lit("delete")
        )
        ins = target.join(current.select(key), key, "left_anti").withColumn(
            "_change_type", F.lit("insert")
        )
        cur_k = current.select(
            F.col(key), F.struct(*current.columns).alias("_cur")
        )
        tgt_k = target.select(F.col(key).alias("_k"), F.struct(*target.columns).alias("_tgt"))
        changed = cur_k.join(tgt_k, cur_k[key] == tgt_k["_k"]).filter(
            F.col("_cur") != F.col("_tgt")
        )
        pre = changed.select("_cur.*").withColumn(
            "_change_type", F.lit("update_preimage")
        )
        post = changed.select("_tgt.*").withColumn(
            "_change_type", F.lit("update_postimage")
        )
        diff = (
            dels.unionByName(ins, allowMissingColumns=True)
            .unionByName(pre, allowMissingColumns=True)
            .unionByName(post, allowMissingColumns=True)
        )
        self._append_changes(diff)
        self._swap_write(target)
        target.unpersist()

    def _append_changes(self, changes: DataFrame) -> None:
        """Materialize one commit's changes under a new
        commit_version=N directory. Must run BEFORE the table swap:
        the change rows are computed against the pre-merge state."""
        version = self.changelog_version() + 1
        changes.write.mode("errorifexists").parquet(
            f"{self._changelog_path}/commit_version={version}"
        )

    # -- internals -------------------------------------------------------

    def _swap_write(self, df: DataFrame, presorted: bool = False) -> None:
        """Copy-on-write directory swap. Readers see the old or the new
        table, never a partial write. The swap itself is two renames,
        so a crash between them can leave ``path`` momentarily absent —
        :meth:`_recover_stranded` (run by exists()/vacuum()) restores
        the pre-swap directory in that window, so no committed rows are
        ever lost."""
        self._known_empty = False
        suffix = f".tmp-{uuid.uuid4().hex[:8]}"
        if not presorted and self.sort_on_write and self.key in df.columns:
            df = df.sortWithinPartitions(self.key)
        # Spark writes via the URI form; the renames below are plain
        # filesystem moves on the local equivalent
        df.write.mode("overwrite").parquet(f"{self.path.rstrip('/')}{suffix}")
        tmp_os = f"{self._os_path.rstrip('/')}{suffix}"
        old = f"{self._os_path.rstrip('/')}.tmp-old-{uuid.uuid4().hex[:8]}"
        if os.path.exists(self._os_path):
            os.rename(self._os_path, old)
        os.rename(tmp_os, self._os_path)
        shutil.rmtree(old, ignore_errors=True)
