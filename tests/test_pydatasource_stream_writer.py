"""End-to-end Python DataSource STREAM WRITER test: seqgen (Python
stream source) -> jsonlpy (Python stream sink) — both ends of a
structured stream running user Python connector code, the final cell of
the V2 matrix (batch read+pushdown / batch write / stream read / stream
write)."""

from __future__ import annotations

import glob
import json
import os

from spark_kafka_airflow_pipeline_spark.io import pydatasource


def _drain(spark, out, ckpt, n=40, batch=10):
    pydatasource.register(spark)
    stream = (spark.readStream.format("seqgen")
              .option("n", str(n)).option("batch", str(batch)).load())
    # availableNow falls back to single-batch for Python stream sources
    # (see streaming_python_source's docstring) — drive the multi-batch
    # path with processAllAvailable instead
    q = (stream.writeStream.format("jsonlpy")
         .option("path", out)
         .option("checkpointLocation", ckpt)
         .start())
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(120)


def _rows(out):
    rows = []
    for path in sorted(glob.glob(os.path.join(out, "batch-*.jsonl"))):
        with open(path, encoding="utf-8") as f:
            rows.extend(json.loads(line) for line in f)
    return rows


def test_stream_writer_matches_batch_scan(spark, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, out, ckpt)
    got = sorted(_rows(out), key=lambda r: r["id"])
    expected = sorted(
        (r.asDict() for r in
         spark.read.format("seqgen").option("n", "40").load().collect()),
        key=lambda r: r["id"])
    assert got == expected
    # one committed file per (micro-batch, partition); no staging litter
    assert glob.glob(os.path.join(out, ".stream-part-*.tmp")) == []
    batches = {os.path.basename(p).split("-")[1]
               for p in glob.glob(os.path.join(out, "batch-*.jsonl"))}
    assert len(batches) >= 2  # 40 rows at batch=10 -> several batches


def test_stream_writer_restart_is_exactly_once(spark, tmp_path):
    """Restarting from the same checkpoint after full consumption must
    not duplicate rows: the committed offsets say there is nothing new,
    and a replayed commit would overwrite the same file names anyway."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, out, ckpt)
    first = sorted(_rows(out), key=lambda r: r["id"])
    _drain(spark, out, ckpt)  # second run, same checkpoint
    second = sorted(_rows(out), key=lambda r: r["id"])
    assert first == second
    assert len(second) == 40
