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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
        step = max(1, -(-self.n // self.nparts))  # ceil div
        return [_SeqPartition(s, min(s + step, self.n))
                for s in range(0, self.n, step)]

    def read(self, partition):  # noqa: ANN001, ANN201 - Spark API
        for i in range(partition.start, partition.end):
            h = hashlib.md5(str(i).encode()).hexdigest()
            yield (i, h[:8], _HEX.index(h[0]))


class SeqDataSource(DataSource):
    """``spark.read.format("seqgen").option("n", ...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "seqgen"

    def schema(self) -> str:
        return "id bigint, tag string, bucket int"

    def reader(self, schema):  # noqa: ANN001, ANN201 - Spark API
        return _SeqReader(self.options)


def register(spark) -> None:  # noqa: ANN001
    """Idempotent registration (re-registering a name raises)."""
    try:
        spark.dataSource.register(SeqDataSource)
    except Exception:  # noqa: BLE001 - already registered
        pass
