"""Micro-batch pipeline orchestration (foreachBatch core + stream shell).

Reference parity: process_batch / _process_df_of_single_resource_type
(/root/reference/src/bundle_processor.py:79-238) — dedup, encode,
upsert, delete, periodic upkeep — with the documented inefficiencies
fixed (SURVEY §4 "known physical inefficiencies"):

- ONE streaming query, not N+1: the reference starts a query per hot
  resource type, each re-reading and re-parsing the whole Kafka stream
  (/root/reference/src/main.py:119-124 documents the starvation risk).
  We filter per type inside one foreachBatch over one cached batch.
- ONE pass of actions: the batch is cached; count() runs once, the
  per-type loop reuses the cache (reference re-counts 4× per batch at
  :82, :229, :248, :279).
- Table handles are cached across batches (reference re-runs
  createIfNotExists + detail() every batch; its own `XXX: not necessary
  for every batch` at :211).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.operators.bundles import (
    encode_resources,
    latest_per_key,
    prepare_stream,
    split_by_method,
)
from fhir_to_lakehouse_spark.sinks.keyed_table import KeyedTable
from fhir_to_lakehouse_spark.streaming.metrics import (
    DELTA_OPERATION_SECONDS,
    HistogramSnapshot,
    MeasureElapsed,
)


@dataclass
class PipelineConfig:
    warehouse_dir: str = "/tmp/fhir-warehouse"
    checkpoint_dir: str = "/tmp/fhir-checkpoints"
    # reference settings.py:39 — OPTIMIZE+VACUUM every N batches
    upkeep_interval: int = 50
    vacuum_retention_hours: float = 24.0
    # liquid-clustering columns per resource type (reference README:19-23)
    clustering_columns: dict[str, list[str]] = field(
        default_factory=lambda: {
            "Patient": ["id"],
            "Condition": ["id"],
            "Observation": ["id"],
        }
    )
    log_batch_stats: bool = False
    # reference settings: log_resource_count_by_source_topic
    log_topic_counts: bool = False
    # reference: register tables in the catalog when metastore configured
    register_schema: str | None = None
    # delta.* properties applied at table create (None = reference
    # defaults, settings.py:43-49); flows from Settings.delta
    table_properties: dict[str, str] | None = None
    # EXPLICITLY OFF by default (ADVICE r5): the stored tables keep
    # Reference.reference strings verbatim, byte-compatible with what
    # the reference's Pathling encoder writes — normalization is a
    # query-time concern (operators.bundles.resolve_references).
    # Turning this on is a table-format version change: existing rows
    # keep prefixed references while new merges write bare ids, so
    # only enable it on fresh tables or after a one-off rewrite.
    normalize_references_at_write: bool = False
    # Pathling `enableExtensions` analog (OFF like Pathling's
    # default): widen every stored table with the shared typed FHIR
    # `extension` element (schemas.EXTENSION_SCHEMA) so compiled
    # views can answer extension('url') paths from columns instead of
    # resource_json. Turning it on widens the table schema — the
    # keyed-table MERGE path already handles additive widening, so an
    # existing deployment can flip it and old rows read NULL
    # extensions.
    encode_extensions: bool = False
    # profile-validation specs (operators/validation.py), applied to
    # each batch's encoded PUT rows for their resource type: per-rule
    # violation/checked counts accumulate on
    # BundlePipeline.validation_stats (data-quality monitoring inside
    # the ETL — one extra map-side-combinable aggregate per matching
    # batch, O(batch) not O(table)). Binding rules additionally need
    # `validation_valuesets` (an expand_valueset frame).
    validation_specs: list[dict] = field(default_factory=list)
    validation_valuesets: object | None = None
    # Per-type processing concurrency (guide §2.6 overlap of
    # independent jobs): the resource types in a batch maintain
    # DISJOINT tables, so their dedup/encode/merge job chains are
    # independent — running them from a small driver thread pool lets
    # one type's job tail back-fill executors the previous type would
    # have left idle. The reference gets this concurrency by running
    # one streaming query PER type (at N× the parse cost and with
    # documented starvation risk, /root/reference/src/main.py:119-124);
    # a pool over one cached parse keeps its concurrency without its
    # redundancy. 2-3 in flight is plenty (guide); 1 = the old
    # sequential behavior.
    max_concurrent_types: int = 3
    # (ViewDefinition dict, destination path) pairs: each view is
    # materialized flat and refreshed INCREMENTALLY at the upkeep
    # cadence (operators/materialized_view.py — per-resource
    # post-image recompile off the change feed). Configuring a view
    # turns the change feed on for its resource type's table.
    materialized_views: list[tuple[dict, str]] = field(default_factory=list)


class BundlePipeline:
    """Stream/batch-agnostic engine core: feed it a Kafka-shaped
    DataFrame (streaming micro-batch or static test frame) and it
    maintains one keyed table per resource type."""

    def __init__(self, spark: SparkSession, cfg: PipelineConfig | None = None):
        self.spark = spark
        self.cfg = cfg or PipelineConfig()
        self._tables: dict[str, KeyedTable] = {}
        # per-operation latency histogram, labeled (operation,
        # resource_type) — reference delta_operations_timer
        # (/root/reference/src/bundle_processor.py:213-233)
        self.op_timer = HistogramSnapshot()
        # cumulative {(resource_type, rule): [violations, checked]}
        # fed by cfg.validation_specs via _validate_batch
        self.validation_stats: dict[tuple[str, str], list[int]] = {}
        # serializes the few cross-type shared effects under the
        # per-type thread pool: appends to the ONE dead-letter path
        # (two concurrent append jobs would race on the same
        # _temporary staging dir) and catalog DDL
        import threading

        self._shared_sink_lock = threading.Lock()

    # -- table access ----------------------------------------------------

    def table(self, resource_type: str) -> KeyedTable:
        if resource_type not in self._tables:
            viewed = {
                v.get("resource") for v, _ in self.cfg.materialized_views
            }
            self._tables[resource_type] = KeyedTable(
                self.spark,
                os.path.join(
                    self.cfg.warehouse_dir, f"{resource_type}.parquet"
                ),
                key="id",
                # W1 dedup (latest_per_key) runs before every merge, so
                # the source is key-unique by construction — skip the
                # fallback's duplicate-key probe job
                verify_unique_source=False,
                # a configured materialized view consumes this table's
                # change feed — turn it on
                changelog=resource_type in viewed,
                table_properties=self.cfg.table_properties,
            )
        return self._tables[resource_type]

    # -- the foreachBatch callback --------------------------------------

    def _validate_batch(self, resource_type: str, encoded) -> None:
        """Apply the configured validation specs to this batch's
        encoded PUT rows and fold the per-rule counts into
        ``validation_stats``. One small global aggregate per matching
        spec; skipped entirely when no spec targets the type."""
        specs = [
            sp
            for sp in self.cfg.validation_specs
            if sp.get("resource") == resource_type
        ]
        if not specs:
            return
        from fhir_to_lakehouse_spark.operators.validation import (
            validation_summary,
        )

        for sp in specs:
            rows = validation_summary(
                sp, encoded, valuesets=self.cfg.validation_valuesets
            ).collect()
            # the fold is read-modify-write on shared state; under the
            # per-type pool two types sharing a rule name would race —
            # the collect() above (the expensive part) stays outside
            # the critical section
            with self._shared_sink_lock:
                for r in rows:
                    slot = self.validation_stats.setdefault(
                        (resource_type, r["rule"]), [0, 0]
                    )
                    slot[0] += r["violations"] or 0
                    slot[1] += r["checked"]
            if self.cfg.log_batch_stats:
                for r in rows:
                    print(
                        f"validation {resource_type}.{r['rule']}: "
                        f"{r['violations']}/{r['checked']}"
                    )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Reference process_batch parity
        (/root/reference/src/bundle_processor.py:79-155), single-pass,
        plus dead-lettering: rows whose payload fails the envelope parse
        (malformed JSON / not a bundle) are appended to a ``_corrupt``
        table with provenance instead of vanishing — silent drops are
        how streaming pipelines lose data unnoticed.
        """
        from fhir_to_lakehouse_spark.operators.bundles import (
            explode_entries,
            parse_bundles,
        )

        # one JSON parse for the whole batch: the corrupt probe and the
        # explode chain both read the cached parse (re-deriving prepared
        # from the raw frame would from_json the batch a second time)
        parsed = parse_bundles(batch_df).persist()
        prepared = explode_entries(parsed).persist()
        try:
            # corrupt = the JSON failed to parse entirely, or its entry
            # failed to parse: either the envelope is not a Bundle, or
            # the raw payload HAS an "entry" key whose shape from_json
            # could not read (Spark 4 partial-result parsing nulls just
            # that field, so parsed_bundle.entry.isNull() alone cannot
            # tell "absent" from "present but malformed" — probe the raw
            # string). A syntactically valid Bundle with no entry array
            # (e.g. an empty transaction) is NOT corrupt — like the
            # reference, it just yields no rows.
            corrupt = parsed.filter(
                F.col("parsed_bundle").isNull()
                | (
                    F.col("parsed_bundle.entry").isNull()
                    & (
                        ~F.col("parsed_bundle.resourceType").eqNullSafe("Bundle")
                        | F.get_json_object(
                            F.col("value").cast("string"), "$.entry"
                        ).isNotNull()
                    )
                )
            )
            # The counts aggregate runs FIRST: one fully-parallel job
            # materializes the parse/explode caches and answers batch
            # emptiness, the type list, and per-type PUT/DELETE presence
            # at once. The corrupt probe then counts against the warm
            # parsed cache (~0.2 s). Ordering matters: probing corrupt
            # first via isEmpty() pays executeTake's sequential
            # 1/4/16/... partition scale-up against the COLD cache —
            # measured ~4x the cost of a full parallel scan at sf0.1 —
            # and a union-of-aggregates single action races both
            # subtrees into recomputing the same cold cache partitions
            # concurrently (measured slower than sequential).
            counts = {
                (r["resource_type"], r["request_method"]): r["count"]
                for r in prepared.groupBy("resource_type", "request_method")
                .count()
                .collect()
            }
            if corrupt.count():
                self._dead_letter(corrupt, batch_id)
            types = sorted({rt for rt, _ in counts if rt})
            if not types:
                return
            if self.cfg.log_batch_stats:
                prepared.groupBy("resource_type").count().show(truncate=False)

            def _one(rt: str) -> None:
                self._process_single_type(
                    prepared.filter(F.col("resource_type") == rt),
                    rt,
                    has_puts=counts.get((rt, "PUT"), 0) > 0,
                    has_deletes=counts.get((rt, "DELETE"), 0) > 0,
                    batch_id=batch_id,
                )

            workers = min(max(self.cfg.max_concurrent_types, 1), len(types))
            if workers > 1:
                # types maintain disjoint tables; overlapping their job
                # chains back-fills the executor tail (guide §2.6).
                # inheritable_thread_target propagates the JVM-side
                # thread locals (job group/description) into pool
                # threads — the documented PySpark idiom.
                from concurrent.futures import ThreadPoolExecutor

                from pyspark import inheritable_thread_target

                with ThreadPoolExecutor(max_workers=workers) as pool:
                    futures = [
                        pool.submit(inheritable_thread_target(_one), rt)
                        for rt in types
                    ]
                    for fut in futures:
                        fut.result()
            else:
                for rt in types:
                    _one(rt)
            if batch_id % self.cfg.upkeep_interval == 0:
                self.upkeep(types)
        finally:
            parsed.unpersist()
            prepared.unpersist()

    def _process_single_type(
        self,
        df: DataFrame,
        resource_type: str,
        has_puts: bool = True,
        has_deletes: bool = True,
        batch_id: int = -1,
    ) -> None:
        """Dedup -> encode PUTs -> upsert -> delete (order matters:
        upsert FIRST, then deletes, like the reference at
        /root/reference/src/bundle_processor.py:221-234)."""
        # cache the dedup output: the window shuffle would otherwise
        # re-run for every consumer (emptiness probes, upsert, delete)
        deduped = latest_per_key(df).persist()  # W1: partition asc, offset desc
        try:
            if self.cfg.log_topic_counts:
                # reference log_resource_count_by_source_topic
                # (/root/reference/src/bundle_processor.py:131)
                deduped.groupBy("topic").count().show(truncate=False)
            puts, deletes = split_by_method(deduped)

            tbl = self.table(resource_type)
            # deletes can only hit rows that existed BEFORE this batch:
            # W1 dedup leaves one row per key, so a key whose winner is
            # DELETE has no PUT row in this batch's upsert. If the table
            # is only being created now, the delete pass would rewrite
            # it to remove nothing — skip it entirely (matters for
            # first-batch backfills, where it halves the table I/O).
            existed_before = tbl.exists()
            encoded = encode_resources(
                puts,
                resource_type,
                normalize_refs=self.cfg.normalize_references_at_write,
                include_extensions=self.cfg.encode_extensions,
            )
            self._validate_batch(resource_type, encoded)
            # table creation is unconditional once a type appears — the
            # reference creates the (possibly empty) table before merging,
            # so a DELETE-only first batch still materializes the table
            # (/root/reference/src/bundle_processor.py:172-204); the curated
            # schema is static, so no rows are needed to derive it
            tbl.create_if_not_exists(
                encoded.schema,
                cluster_by=self.cfg.clustering_columns.get(resource_type),
            )
            if self.cfg.register_schema:
                with MeasureElapsed(
                    self.op_timer,
                    DELTA_OPERATION_SECONDS,
                    operation="register",
                    resource_type=resource_type,
                ):
                    self._register(resource_type)
            # counts are pre-dedup: when only one method appears for the
            # type they are exact; when both appear, W1 races can empty
            # either side, so one aggregate over the dedup cache counts
            # both winner sides in a single parallel job (the common
            # single-method batch pays zero extra jobs; per-side
            # isEmpty() probes would re-run the executeTake scale-up
            # against the cache once per side)
            n_put_winners = n_del_winners = None
            if has_puts and has_deletes:
                w = deduped.agg(
                    F.count_if(F.col("request_method") == "PUT").alias("p"),
                    F.count_if(F.col("request_method") == "DELETE").alias("d"),
                ).collect()[0]
                n_put_winners, n_del_winners = w["p"], w["d"]

            if has_puts and (n_put_winners is None or n_put_winners > 0):
                # a PUT whose inner resource JSON failed the curated
                # parse encodes to a null id — merging it would plant a
                # null-key row in the table. Dead-letter it with the raw
                # resource instead (the reference's Pathling encoder
                # throws for these; silent nulls are worse than either).
                if tbl.is_delta:
                    # Delta compiles MERGE into its own command, so an
                    # Observation on the source side has no guaranteed
                    # delivery — keep the explicit one-aggregate probe
                    # (still a single job answering both counts).
                    enc = encoded.agg(
                        F.count(F.lit(1)).alias("n"),
                        F.count_if(F.col("id").isNull()).alias("n_invalid"),
                    ).collect()[0]
                    if enc["n_invalid"]:
                        self._dead_letter_resources(
                            encoded.filter(F.col("id").isNull()),
                            resource_type,
                            batch_id,
                        )
                        encoded = encoded.filter(F.col("id").isNotNull())
                    if enc["n"] > enc["n_invalid"]:
                        with MeasureElapsed(
                            self.op_timer,
                            DELTA_OPERATION_SECONDS,
                            operation="merge",
                            resource_type=resource_type,
                        ):
                            tbl.merge_upsert(encoded)
                else:
                    # parquet path: the row/invalid counts ride the
                    # MERGE job itself via the Observation API — one
                    # collect job per type per batch saved (the old
                    # aggregate re-ran the from_json encode over the
                    # dedup cache). CollectMetrics is a pushdown
                    # barrier, so `n_invalid` counts pre-filter rows
                    # even though the merge consumes only valid ones
                    # (pinned in test_bundles).
                    from pyspark.sql import Observation

                    obs = Observation()
                    observed = encoded.observe(
                        obs,
                        F.count(F.lit(1)).alias("n"),
                        F.count_if(F.col("id").isNull()).alias("n_invalid"),
                    )
                    with MeasureElapsed(
                        self.op_timer,
                        DELTA_OPERATION_SECONDS,
                        operation="merge",
                        resource_type=resource_type,
                    ):
                        tbl.merge_upsert(
                            observed.filter(F.col("id").isNotNull())
                        )
                    if obs.get["n_invalid"]:
                        self._dead_letter_resources(
                            encoded.filter(F.col("id").isNull()),
                            resource_type,
                            batch_id,
                        )

            if has_deletes and existed_before:
                delete_ids = deletes.select(
                    F.col("request_resource_id").alias("id")
                )
                if not has_puts or n_del_winners > 0:
                    with MeasureElapsed(
                        self.op_timer,
                        DELTA_OPERATION_SECONDS,
                        operation="delete",
                        resource_type=resource_type,
                    ):
                        tbl.merge_delete(delete_ids)
        finally:
            deduped.unpersist()

    def _dead_letter(self, corrupt: DataFrame, batch_id: int) -> None:
        """Append unparseable records (raw payload + Kafka provenance +
        batch id) to the corrupt-records table."""
        out = corrupt.select(
            F.col("bundle").alias("raw_value"),
            "partition",
            "offset",
            "topic",
            "timestamp",
            F.lit(batch_id).alias("batch_id"),
        )
        path = os.path.join(self.cfg.warehouse_dir, "_corrupt.parquet")
        out.write.mode("append").parquet(path)

    def corrupt_records(self) -> DataFrame:
        path = os.path.join(self.cfg.warehouse_dir, "_corrupt.parquet")
        return self.spark.read.parquet(path)

    def _dead_letter_resources(
        self, invalid: DataFrame, resource_type: str, batch_id: int
    ) -> None:
        """Append entry-level failures (valid envelope, unparseable
        inner resource) to the resource corrupt table."""
        out = invalid.select(
            F.col("resource_json").alias("raw_resource"),
            F.lit(resource_type).alias("resource_type"),
            F.lit(batch_id).alias("batch_id"),
        )
        path = os.path.join(
            self.cfg.warehouse_dir, "_corrupt_resources.parquet"
        )
        with self._shared_sink_lock:
            out.write.mode("append").parquet(path)

    def corrupt_resources(self) -> DataFrame:
        path = os.path.join(
            self.cfg.warehouse_dir, "_corrupt_resources.parquet"
        )
        return self.spark.read.parquet(path)

    def _register(self, resource_type: str) -> None:
        """Catalog registration at table-create time (reference
        _register_table_in_metastore,
        /root/reference/src/bundle_processor.py:330-357)."""
        from fhir_to_lakehouse_spark.session import delta_available

        schema = self.cfg.register_schema
        fmt = "DELTA" if delta_available() else "PARQUET"
        path = self.table(resource_type).path
        with self._shared_sink_lock:
            self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {schema}")
            self.spark.sql(
                f"CREATE TABLE IF NOT EXISTS {schema}.`{resource_type}` "
                f"USING {fmt} LOCATION '{path}'"
            )

    # -- maintenance (reference :236-238 + lakehousekeeper) --------------

    def upkeep(self, resource_types: list[str]) -> None:
        for rt in resource_types:
            tbl = self.table(rt)
            if tbl.exists():
                tbl.optimize()
                tbl.vacuum(self.cfg.vacuum_retention_hours)
        self.refresh_views()

    def refresh_views(self) -> list[dict]:
        """Refresh every configured materialized flat view from its
        table's change feed (incremental after the first build) —
        runs at the upkeep cadence, so analyst-facing flat tables
        track the stream within ``upkeep_interval`` batches."""
        from fhir_to_lakehouse_spark.operators.materialized_view import (
            MaterializedFlatView,
        )

        stats = []
        for view, dest in self.cfg.materialized_views:
            src = self.table(view.get("resource"))
            if src.exists():
                stats.append(MaterializedFlatView(view, src, dest).refresh())
        return stats

    # -- streaming shell -------------------------------------------------

    def start_stream(
        self,
        source_df: DataFrame,
        query_name: str = "bundles",
        available_now: bool = False,
    ):
        """Single streaming query over the whole source (fixes the
        reference's per-type fan-out, /root/reference/src/main.py:157-188
        — one Kafka read, per-type routing inside the batch).

        ``available_now=True`` switches to the bounded-backfill trigger:
        process everything currently in the source (rate limits still
        apply per batch), then stop — the pattern for catch-up runs and
        scheduled incremental jobs.

        The source carries a named ``observe`` set (Spark Observation
        API): per-batch input rows and null/empty-payload counts ride
        the SAME job foreachBatch runs — no extra pass, exactly-once
        per batch — and surface through
        ``StreamingQueryProgress.observedMetrics["bundle_ingest"]``,
        which ThroughputListener exports as gauges next to the
        reference's row-rate metrics."""
        observed = source_df.observe(
            "bundle_ingest",
            F.count(F.lit(1)).alias("input_rows"),
            F.count_if(
                F.col("value").isNull() | (F.length("value") == 0)
            ).alias("empty_payloads"),
        )
        writer = (
            observed.writeStream.outputMode("append")
            .option(
                "checkpointLocation",
                os.path.join(self.cfg.checkpoint_dir, query_name),
            )
            .queryName(query_name)
            .foreachBatch(self.process_batch)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime="0 seconds")  # settings.py:40
        return writer.start()
