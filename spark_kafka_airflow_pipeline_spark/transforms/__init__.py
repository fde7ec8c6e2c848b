from spark_kafka_airflow_pipeline_spark.transforms.add_fields import add_fields
from spark_kafka_airflow_pipeline_spark.transforms.validate_fields import (
    ERROR_COLUMN,
    compile_rule,
    validate_fields,
)

__all__ = ["ERROR_COLUMN", "add_fields", "compile_rule", "validate_fields"]
