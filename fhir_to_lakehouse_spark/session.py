"""SparkSession builder for the engine.

Mirrors the session concerns of the reference entry point
(/root/reference/src/main.py:42-101: master, Delta extension + catalog,
object-store configs, metastore) but Spark-first and environment-gated:
Delta/S3A/Hive wiring is applied only when the corresponding libraries
are importable, so the engine runs standalone on plain parquet.

Scale posture: AQE on (runtime re-plan, skew-join, partition coalescing),
shuffle partitions sized to the local core count rather than the 200
default, Arrow enabled for every Python<->JVM batch exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def delta_available() -> bool:
    """True when the delta-spark bindings (and jars) are importable."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def _cpus() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "fhir_to_lakehouse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = _cpus()
    # local mode runs everything in the driver JVM, so driver memory is
    # the only heap knob that matters (guide: size it to the machine);
    # must be set before the JVM launches — no effect on reused sessions
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # guide §6: zstd is smaller than snappy at similar read speed —
        # measured r13 A/B on the write-inclusive bench entries
        # (curation_pipeline_batch 1.61/1.91 -> 1.54/1.68 s,
        # etl_pipeline_batch 2.60/2.44 -> 2.26/2.21 s, two interleaved
        # rounds; stream_incremental_dedup equal within noise). At
        # 100 TB the better ratio is storage + scan I/O, not just write
        # time. Parameterized so a deployment can pin its own codec.
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "zstd"),
        )
        # testdata events.parquet stores TIMESTAMP(NANOS) which the Spark
        # vectorized reader rejects; read as long and convert at load
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # InferFiltersFromGenerate inserts size(arr)>0 BELOW the
        # projection that computes the array, re-substituting the full
        # expression: explode(shingles(text)) evaluates the tokenizer
        # 3x per row (measured 6.8s -> 1.0s warm on the sf0.1
        # decontamination scan; SPARK-36926 is the upstream report).
        # This library always computes exploded arrays inline from raw
        # text, so the rule's benefit case (pre-filtering stored array
        # columns) never applies. SCALING.md "Round-4 findings".
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")

    if delta_available():
        # Parity with reference session wiring (src/main.py:60-71) —
        # only when the Delta jars are actually present.
        builder = builder.config(
            "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
        ).config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )

    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def s3_conf(
    endpoint: str,
    access_key: str,
    secret_key: str,
    path_style: bool = True,
    connection_ssl: bool = True,
) -> dict[str, str]:
    """S3A object-store wiring (reference S9,
    /root/reference/src/main.py:78-93: endpoint/creds/path-style MinIO,
    connection-SSL toggle, magic committer for consistent multi-part
    commits). Pass the result as ``extra_conf`` to :func:`get_spark`;
    requires the hadoop-aws jar at runtime (not in this container —
    config construction only)."""
    return {
        "spark.hadoop.fs.s3a.endpoint": endpoint,
        "spark.hadoop.fs.s3a.access.key": access_key,
        "spark.hadoop.fs.s3a.secret.key": secret_key,
        "spark.hadoop.fs.s3a.path.style.access": str(path_style).lower(),
        "spark.hadoop.fs.s3a.connection.ssl.enabled": str(connection_ssl).lower(),
        "spark.hadoop.fs.s3a.committer.name": "magic",
        "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
        "spark.sql.sources.commitProtocolClass": (
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        ),
        "spark.sql.parquet.output.committer.class": (
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
        ),
    }
