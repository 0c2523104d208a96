from fhir_to_lakehouse_spark.sinks.keyed_table import KeyedTable, retry
