from data_integration_and_processing_spark.plans.pipelines import ingest_file, transfer
from data_integration_and_processing_spark.plans.retry import retry

__all__ = ["ingest_file", "transfer", "retry"]
