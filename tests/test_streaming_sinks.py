"""Streaming sink coverage: foreachBatch reusing the batch file sink."""

from __future__ import annotations

from spark_kafka_airflow_pipeline_spark.io.sinks import foreach_batch_sink
from spark_kafka_airflow_pipeline_spark.metadata import Sink
from spark_kafka_airflow_pipeline_spark.streaming.pipelines import _events_stream


def test_foreach_batch_file_sink(spark, sf_dir, tmp_path):
    stream = _events_stream(spark, sf_dir).select("event_id", "user_id")
    sink = Sink(input="s", name="events-out", paths=[str(tmp_path)],
                format="parquet", saveMode="append")
    q = (foreach_batch_sink(stream, sink, checkpoint=str(tmp_path / "ckpt")))
    q.processAllAvailable()
    q.stop()
    out = spark.read.parquet(f"{tmp_path}/events-out")
    expected = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert out.count() == expected
    assert set(out.columns) == {"event_id", "user_id"}
