"""fhir_to_lakehouse_spark — a PySpark-native analytics/ETL engine.

Re-expresses the capability surface of the reference FHIR-to-lakehouse
pipeline (Kafka FHIR bundle stream -> typed per-resource keyed tables)
as idiomatic PySpark, and extends it with large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
column plumbing).

Layout:
  session.py     SparkSession builder (AQE, UTC, Arrow, optional Delta)
  schemas.py     explicit StructTypes (bundle envelope, resources, testdata)
  sources/       batch/parquet loaders, Kafka stream builder (gated)
  operators/     stream/batch-agnostic DataFrame transforms (bundle core)
  sinks/         keyed-table sink: Delta MERGE or parquet-based fallback
  functions/     scalar/extension function families (text, dedup, similarity)
  plans/         declared query-operator library + DuckDB oracle SQL
  streaming/     foreachBatch pipeline, event-time windowed ops
  maintenance.py optimize/vacuum/register parity
"""

__version__ = "0.1.0"
