from spark_kafka_airflow_pipeline_spark.streaming import pipelines

__all__ = ["pipelines"]
