"""Extension function families for large-scale training-data pipelines.

All builders return Column expressions composed of Catalyst built-ins
(JVM-side, codegen) unless a docstring says otherwise; Pandas-UDF paths
are isolated in multimodal.py / similarity.py.
"""

from fhir_to_lakehouse_spark.functions import text, dedup, similarity, multimodal

__all__ = ["text", "dedup", "similarity", "multimodal"]
