from ig_etl_sync_spark.plans.pipeline import (
    FunctionSpec,
    IntegrationSpec,
    PipelineRunner,
    packer_registry_integration,
)

__all__ = [
    "FunctionSpec",
    "IntegrationSpec",
    "PipelineRunner",
    "packer_registry_integration",
]
