"""A/B the parquet compression codec for the write-inclusive bench
entries (VERDICT r12 item 9, guide §6): snappy (Spark default) vs
zstd, isolated because the codec changes the bytes written inside the
timed region. Uses bench.py's own entry functions so the timed work
is identical to the official bench. Run on a QUIET machine."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (
    bench_curation_pipeline,
    bench_etl_pipeline,
    bench_stream_incremental_dedup,
)
from fhir_to_lakehouse_spark.session import get_spark

ENTRIES = [
    ("curation_pipeline_batch", bench_curation_pipeline),
    ("etl_pipeline_batch", bench_etl_pipeline),
    ("stream_incremental_dedup", bench_stream_incremental_dedup),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_zstd")
    for codec in ("snappy", "zstd"):
        spark.conf.set("spark.sql.parquet.compression.codec", codec)
        for name, fn in ENTRIES:
            spark.sparkContext.setJobDescription(f"{name} [{codec}]")
            t = fn(spark, sf_dir)
            print(f"{codec:7s} {name:28s} {round(t, 3)}")
    spark.conf.unset("spark.sql.parquet.compression.codec")


if __name__ == "__main__":
    main()
