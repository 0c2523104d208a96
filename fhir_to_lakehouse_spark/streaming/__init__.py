from fhir_to_lakehouse_spark.streaming.pipeline import (
    BundlePipeline,
    PipelineConfig,
)

__all__ = ["BundlePipeline", "PipelineConfig"]
