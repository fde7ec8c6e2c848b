from spark_kafka_airflow_pipeline_spark.functions import text, vectors

__all__ = ["text", "vectors"]
