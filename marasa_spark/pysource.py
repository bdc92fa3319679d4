"""Custom Python data source (Spark 4 DataSource API, SURVEY.md §2.A/L
extension): a partition-parallel deterministic row generator registered as
a real ``spark.read.format(...)`` source.

This is the PySpark-native answer to "my data lives behind a Python API"
(an internal service, a bespoke file format, a synthetic generator): the
``partitions()`` split makes the read DISTRIBUTED — each executor's Python
worker materializes only its slice — instead of the driver-side
``createDataFrame`` collect-and-parallelize anti-pattern. At 100 TB scale
the same three methods (name/schema/reader + partitions/read) wrap any
sliceable upstream; Spark handles scheduling, retries, and Arrow transfer.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class SeqPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SeqDataSource(DataSource):
    """``marasa_seq``: rows ``(id, square, parity)`` for id in [0, n)."""

    @classmethod
    def name(cls) -> str:
        return "marasa_seq"

    def schema(self) -> str:
        return "id long, square long, parity string"

    def reader(self, schema) -> "SeqReader":
        return SeqReader(self.options)

    def simpleStreamReader(self, schema) -> "SeqStreamReader":
        return SeqStreamReader(self.options)


class SeqReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 100))
        self.num_parts = int(options.get("partitions", 4))

    def partitions(self):
        per = (self.n + self.num_parts - 1) // self.num_parts
        return [
            SeqPartition(i * per, min((i + 1) * per, self.n))
            for i in range(self.num_parts)
        ]

    def read(self, partition: SeqPartition):
        for i in range(partition.start, partition.end):
            yield (i, i * i, "even" if i % 2 == 0 else "odd")


class SeqStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same generator: offsets advance by
    ``batch_size`` ids per micro-batch up to ``n`` — a deterministic
    unbounded-source shape (think: polling a cursor/queue position), so
    stream results are batch-equivalent and oracle-checkable. The simple
    reader runs on the driver per micro-batch; a partitioned
    ``DataSourceStreamReader`` is the executor-parallel upgrade path."""

    def __init__(self, options):
        self.n = int(options.get("n", 100))
        self.batch_size = int(options.get("batch_size", 25))

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        # one poll advances at most one batch; availableNow drains to n
        return {"pos": self.n}

    def read(self, start):
        pos = start["pos"]
        end = min(pos + self.batch_size, self.n)
        rows = [(i, i * i, "even" if i % 2 == 0 else "odd") for i in range(pos, end)]
        return iter(rows), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return iter(
            (i, i * i, "even" if i % 2 == 0 else "odd")
            for i in range(start["pos"], end["pos"])
        )
