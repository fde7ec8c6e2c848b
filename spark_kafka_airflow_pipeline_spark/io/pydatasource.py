"""Custom Python DataSource (Spark 4 DataSource V2 Python API) [EXT].

The reference reads files and Kafka (``PipelineProcessor.scala:105-156``);
this module exercises the remaining source surface: a USER-DEFINED
source registered with ``spark.dataSource.register`` and consumed
through the normal ``spark.read.format(...)`` path — the extension
point for feeds Spark has no built-in connector for (internal APIs,
bespoke formats, synthetic loads).

``seqgen`` generates a deterministic sequence: row ``i`` carries an
md5-derived tag and bucket, a pure function of ``i`` — so the scan is
exactly reproducible across engines, runs, and partitionings, and a
query over it can be value-hash oracled in DuckDB (the repo's md5
portability discipline). Partition planning is real: the range splits
into ``partitions`` InputPartitions, each read independently on an
executor — the same contract a production connector implements for
parallel scans (at 100 TB this is where a source declares its split
boundaries so Spark can schedule them wide).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

#: bucket of a hex char = its value; shared contract with the oracle's
#: strpos('0123456789abcdef', c) - 1
_HEX = "0123456789abcdef"


class _SeqPartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class _SeqReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", "1000"))
        self.nparts = int(options.get("partitions", "8"))

    def partitions(self):  # noqa: ANN201 - Spark API signature
        if self.n <= 0:
            # the API requires >= 1 partition: Spark calls read(None)
            # when the list is empty — emit one empty split instead
            return [_SeqPartition(0, 0)]
        step = max(1, -(-self.n // self.nparts))  # ceil div
        return [_SeqPartition(s, min(s + step, self.n))
                for s in range(0, self.n, step)]

    def read(self, partition):  # noqa: ANN001, ANN201 - Spark API
        for i in range(partition.start, partition.end):
            h = hashlib.md5(str(i).encode()).hexdigest()
            yield (i, h[:8], _HEX.index(h[0]))


class _SeqStreamReader(SimpleDataSourceStreamReader):
    """Micro-batched twin of ``_SeqReader``: offsets are plain row
    indices, each ``read`` call emits the next ``batch`` rows until
    ``n`` is exhausted — the offset-tracking contract every streaming
    connector implements (Kafka offsets, file positions). Rows are the
    same pure md5 function of the index, so a drained stream equals the
    batch scan exactly."""

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", "1000"))
        self.batch = int(options.get("batch", "250"))

    def initialOffset(self):  # noqa: ANN201 - Spark API
        return {"i": 0}

    def read(self, start):  # noqa: ANN001, ANN201 - Spark API
        s = start["i"]
        e = min(s + self.batch, self.n)
        rows = [(i, hashlib.md5(str(i).encode()).hexdigest()[:8],
                 _HEX.index(hashlib.md5(str(i).encode()).hexdigest()[0]))
                for i in range(s, e)]
        return iter(rows), {"i": e}

    def readBetweenOffsets(self, start, end):  # noqa: ANN001, ANN201
        return iter([
            (i, hashlib.md5(str(i).encode()).hexdigest()[:8],
             _HEX.index(hashlib.md5(str(i).encode()).hexdigest()[0]))
            for i in range(start["i"], end["i"])])


class SeqDataSource(DataSource):
    """``spark.read.format("seqgen").option("n", ...).load()`` — and the
    same source as a micro-batched STREAM via ``spark.readStream``."""

    @classmethod
    def name(cls) -> str:
        return "seqgen"

    def schema(self) -> str:
        return "id bigint, tag string, bucket int"

    def reader(self, schema):  # noqa: ANN001, ANN201 - Spark API
        return _SeqReader(self.options)

    def simpleStreamReader(self, schema):  # noqa: ANN001, ANN201
        return _SeqStreamReader(self.options)


class _WroteFile(WriterCommitMessage):
    def __init__(self, path: str, rows: int) -> None:
        self.path = path
        self.rows = rows


class _JsonlWriter(DataSourceWriter):
    """One JSONL file per partition; the commit message carries the
    written path + row count back to the driver (the V2 two-phase
    commit contract: only files named in commit messages are final —
    a failed/speculative task's output is simply never committed)."""

    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator):  # noqa: ANN001, ANN201 - Spark API
        import json
        import os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{pid:05d}.jsonl")
        n = 0
        with open(out, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str,
                                   sort_keys=True) + "\n")
                n += 1
        return _WroteFile(out, n)


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonlpy").option("path", dir).mode(...).save()``
    — the WRITER half of the Python DataSource V2 API, symmetric to
    ``seqgen``'s reader half."""

    @classmethod
    def name(cls) -> str:
        return "jsonlpy"

    def writer(self, schema, overwrite):  # noqa: ANN001, ANN201
        # mode("overwrite") must not leave stale part files behind —
        # a previous run with MORE partitions would otherwise leak its
        # tail files into the new result. writer() runs on the driver,
        # so clearing here races with nothing.
        if overwrite:
            import glob
            import os

            for f in glob.glob(os.path.join(self.options["path"],
                                            "part-*.jsonl")):
                os.remove(f)
        return _JsonlWriter(self.options)


def register(spark) -> None:  # noqa: ANN001
    """Idempotent registration (re-registering a name raises)."""
    for src in (SeqDataSource, JsonlSinkDataSource):
        try:
            spark.dataSource.register(src)
        except Exception:  # noqa: BLE001 - already registered
            pass
