"""Streaming coverage: foreachBatch sinks, the Kafka wire-format parse
path (broker-free), and watermark-bounded streaming dedup semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_kafka_airflow_pipeline_spark.io.sinks import (
    foreach_batch_sink,
    serialize_for_kafka,
)
from spark_kafka_airflow_pipeline_spark.io.sources import parse_kafka_records
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


def test_kafka_parse_roundtrip(spark):
    """The ``read_kafka_stream`` parse projection, exercised without a
    broker: serialize rows with the reference wire format
    (``to_json(struct("*"))``, PipelineProcessor.scala:150), shape them
    like a Kafka read (binary key/value + timestamp), parse with
    ``parse_kafka_records`` — values and types must round-trip,
    including a NULL field (to_json omits it; from_json restores it)."""
    df = spark.createDataFrame(
        [(1, "Xabier", 39), (2, "Miguel", None), (3, "Fran", 31)],
        "id long, name string, age long")
    records = serialize_for_kafka(df, key_column="id").select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit("2026-01-05 00:00:00").cast("timestamp").alias("timestamp"),
    )
    parsed = parse_kafka_records(records, "id long, name string, age long")
    assert [(f.name, f.dataType.simpleString()) for f in parsed.schema] == [
        ("key", "string"), ("id", "bigint"), ("name", "string"),
        ("age", "bigint"), ("timestamp", "timestamp")]
    rows = {(r["key"], r["id"], r["name"], r["age"])
            for r in parsed.collect()}
    assert rows == {("1", 1, "Xabier", 39), ("2", 2, "Miguel", None),
                    ("3", 3, "Fran", 31)}


def _drain_watermark_dedup(spark, src_dir: str, ckpt: str) -> list:
    """One availableNow pass of a checkpointed dropDuplicatesWithinWatermark
    query over the json files in src_dir; returns the rows EMITTED by
    this pass (micro-batch boundaries = one call per new file)."""
    stream = (spark.readStream.schema("k string, ts timestamp")
              .json(src_dir)
              .withWatermark("ts", "1 hour")
              .dropDuplicatesWithinWatermark(["k"]))
    emitted: list = []
    q = (stream.writeStream
         .foreachBatch(lambda bdf, _id: emitted.extend(
             (r["k"], str(r["ts"])) for r in bdf.collect()))
         .outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return emitted


def test_dedup_within_watermark_evicts_state_and_drops_late(spark, tmp_path):
    """Pins the two semantics unbounded dropDuplicates cannot give:
    (1) a key re-appearing AFTER the watermark passed its dedup entry is
    re-emitted (state was evicted — bounded state), and (2) a row whose
    event time is older than the watermark is dropped entirely, even
    for a never-seen key (late-data drop). SURVEY.md §2.2 Streaming,
    §7 item 3."""
    import json as _json

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def feed(name: str, rows: list[tuple[str, str]]) -> list:
        with open(src / name, "w") as f:
            for k, ts in rows:
                f.write(_json.dumps({"k": k, "ts": ts}) + "\n")
        return _drain_watermark_dedup(spark, str(src), ckpt)

    # batch 1: K twice within the watermark -> one emission; wm = 09:10
    b1 = feed("b1.json", [("K", "2026-01-05 10:00:00"),
                          ("K", "2026-01-05 10:10:00")])
    assert [k for k, _ in b1] == ["K"]

    # batch 2: unrelated key advances the watermark to 12:00,
    # which expires K's dedup entry (10:10 + 1h < 12:00)
    b2 = feed("b2.json", [("ADV", "2026-01-05 13:00:00")])
    assert [k for k, _ in b2] == ["ADV"]

    # batch 3: K again at 13:30 (fresh, state was evicted -> re-emitted)
    # and LATE at 10:30 (< watermark 12:00 -> dropped, never emitted)
    b3 = feed("b3.json", [("K", "2026-01-05 13:30:00"),
                          ("LATE", "2026-01-05 10:30:00")])
    assert [k for k, _ in sorted(b3)] == ["K"], b3
