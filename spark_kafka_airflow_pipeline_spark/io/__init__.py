from spark_kafka_airflow_pipeline_spark.io.sources import read_source, read_sources_union
from spark_kafka_airflow_pipeline_spark.io.sinks import (
    publish_to_kafka,
    serialize_for_kafka,
    write_sink,
)

__all__ = [
    "publish_to_kafka",
    "read_source",
    "read_sources_union",
    "serialize_for_kafka",
    "write_sink",
]
