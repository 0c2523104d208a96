from fhir_to_lakehouse_spark.operators.bundles import (
    encode_resources,
    explode_entries,
    latest_per_key,
    parse_bundles,
    prepare_stream,
    resolve_references,
    split_by_method,
)

__all__ = [
    "encode_resources",
    "explode_entries",
    "latest_per_key",
    "parse_bundles",
    "prepare_stream",
    "resolve_references",
    "split_by_method",
]
