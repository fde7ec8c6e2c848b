"""File + Kafka sinks (batch and streaming).

Reference file sink: ``df.write.mode(saveMode).format(fmt).save(path +
"/" + sink.name)`` per configured path (``PipelineProcessor.scala:
122-128`` ok split, ``:134-140`` ko split). Reference Kafka sink:
serialize the whole row to one JSON string column ``value`` and write to
a topic (``publishToKafka``, ``:148-156``).

Engine extensions for scale:
- optional ``partitionBy`` columns on file sinks (partition pruning on
  read is the single biggest win for 100 TB date-partitioned data);
- parquet as the default format (columnar + stats + pushdown) where the
  reference defaults to the configured string;
- streaming variants via ``writeStream`` / ``foreachBatch`` reusing the
  same batch writers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_kafka_airflow_pipeline_spark.metadata import Sink


def serialize_for_kafka(df: DataFrame, key_column: str | None = None) -> DataFrame:
    """Row -> single JSON ``value`` column, the reference's wire format
    (``to_json(struct("*"))``, ``PipelineProcessor.scala:150``). The
    reference writes no key (SURVEY.md §2.3.6); passing ``key_column``
    adds one for partition-stable publishing (engine extension)."""
    cols = [F.to_json(F.struct("*")).alias("value")]
    if key_column is not None:
        cols.insert(0, F.col(key_column).cast("string").alias("key"))
    return df.select(*cols)


def publish_to_kafka(df: DataFrame, bootstrap_servers: str, topic: str,
                     key_column: str | None = None) -> None:
    """Batch-publish a frame to a topic (``PipelineProcessor.scala:148-156``).

    Executors hold the producer connections; the driver only plans.
    """
    (serialize_for_kafka(df, key_column)
     .write.format("kafka")
     .option("kafka.bootstrap.servers", bootstrap_servers)
     .option("topic", topic)
     .save())


def write_sink(df: DataFrame, sink: Sink) -> None:
    """Write a frame to every configured path of a sink.

    Path layout is ``<path>/<name>`` exactly like the reference
    (``PipelineProcessor.scala:128``, ``:140``). ``format: "kafka"``
    routes to the Kafka batch sink, with ``paths`` read as
    ``bootstrap_servers`` and ``name`` as the topic.
    """
    if sink.format.lower() == "kafka":
        for servers in sink.paths:
            publish_to_kafka(df, servers, sink.name,
                             key_column=sink.options.get("keyColumn"))
        return
    for path in sink.paths:
        writer = (df.write.mode(sink.saveMode.lower())
                  .format(sink.format.lower())
                  .options(**sink.options))
        if sink.partitionBy:
            writer = writer.partitionBy(*sink.partitionBy)
        writer.save(f"{path}/{sink.name}")


def write_stream_to_kafka(df: DataFrame, bootstrap_servers: str, topic: str,
                          checkpoint: str, key_column: str | None = None):
    """Streaming Kafka sink [EXT] — same wire format as the batch path."""
    return (serialize_for_kafka(df, key_column)
            .writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
            .option("checkpointLocation", checkpoint)
            .start())


def foreach_batch_sink(df: DataFrame, sink: Sink, checkpoint: str,
                       available_now: bool = False):
    """Streaming wrapper that reuses the batch ``write_sink`` per
    micro-batch — the idiomatic way to stream into any batch-only
    format. ``available_now=True`` drains everything currently in the
    source and stops (bounded backfill / test runs); the default runs
    continuously.

    Only ``saveMode: append`` is accepted: each micro-batch issues one
    batch write, so an OVERWRITE sink would clobber every previous
    batch's output — silent data loss on any multi-batch stream. A
    non-append mode raises up front rather than at the Nth micro-batch.

    Exactly-once note: the checkpoint records which source files/offsets
    were already processed, so a RERUN against the same checkpoint
    skips everything previously seen (no duplicate appends) — delete
    the checkpoint directory to reprocess from scratch.
    """
    if sink.saveMode.lower() != "append":
        raise ValueError(
            f"streaming sink {sink.name!r} has saveMode "
            f"{sink.saveMode!r}: foreachBatch re-runs the batch writer "
            "per micro-batch, so only 'append' is safe (OVERWRITE would "
            "clobber previous batches). Declare the sink as append, or "
            "run the dataflow as batch.")

    def _write(batch_df: DataFrame, _batch_id: int) -> None:
        write_sink(batch_df, sink)

    writer = (df.writeStream.foreachBatch(_write)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
