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
    DataSourceStreamReader,
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


class SeqStreamPartition(InputPartition):
    def __init__(self, index: int, start: int, end: int):
        self.index = index
        self.start = start
        self.end = end


class SeqParallelStreamReader(DataSourceStreamReader):
    """The executor-parallel streaming reader (SCALE.md break-first #5's
    fix): unlike the Simple reader above — whose ``read`` materializes
    every micro-batch's rows ON THE DRIVER — this one only PLANS on the
    driver. ``latestOffset`` advances a cursor (the only driver state,
    two integers), ``partitions(start, end)`` splits the batch's offset
    range into ``partitions`` slices, and ``read(partition)`` runs inside
    executor Python workers, each materializing just its slice. The
    emitted ``part_id``/``worker_pid`` columns exist so tests can PROVE
    both claims from the sink alone: every micro-batch fans out to >1
    planned partition, and no row was produced in the driver process."""

    def __init__(self, options):
        self.n = int(options.get("n", 100))
        self.batch_size = int(options.get("batch_size", 25))
        self.num_parts = int(options.get("partitions", 4))
        # paced micro-batches require a DURABLE cursor (see latestOffset)
        self.cursor_dir = options.get("cursor_dir")

    # -- durable pacing cursor -------------------------------------------
    # An offset a stream reader reports must never go BEHIND what Spark
    # has committed: the engine compares offsets only for equality, so a
    # rewound latestOffset constructs a backwards batch, the checkpoint
    # records its end, and the ranges in between are re-emitted — a file
    # sink appends them as DUPLICATE rows (batch ids differ, so sink-side
    # replay dedup does not apply). An in-memory cursor cannot guarantee
    # monotonicity across restarts (initialOffset is NOT re-called from a
    # checkpoint, and the engine may consult latestOffset on an instance
    # that never saw initialOffset), so pacing state lives in a tiny
    # atomically-replaced file, bumped at batch PLAN time (partitions) —
    # before any commit — and again on commit as belt-and-braces.

    def _hw_file(self) -> str:
        import os

        return os.path.join(self.cursor_dir, "hw")

    def _read_hw(self) -> int:
        try:
            with open(self._hw_file()) as f:
                return int(f.read().strip() or 0)
        except (OSError, ValueError):
            return 0

    def _bump_hw(self, v: int) -> None:
        import os

        os.makedirs(self.cursor_dir, exist_ok=True)
        if v > self._read_hw():
            tmp = f"{self._hw_file()}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                f.write(str(v))
            os.replace(tmp, self._hw_file())

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        """Without ``cursor_dir``: the WHOLE remaining range is declared
        available (drain-all — the generator's data all exists already,
        and a single catch-up batch is what any source does with its
        backlog). With ``cursor_dir``: one durable-cursor step of
        ``batch_size`` ids per trigger — paced micro-batches whose
        monotonicity survives restart because the cursor is bumped at
        plan time, never inferred from instance state."""
        if not self.cursor_dir:
            return {"pos": self.n}
        return {"pos": min(self._read_hw() + self.batch_size, self.n)}

    def partitions(self, start, end):
        s, e = int(start["pos"]), int(end["pos"])
        if self.cursor_dir:
            self._bump_hw(max(s, e))
        if e <= s:
            return []
        per = max(1, -(-(e - s) // self.num_parts))
        return [
            SeqStreamPartition(i, s + i * per, min(s + (i + 1) * per, e))
            for i in range(self.num_parts)
            if s + i * per < e
        ]

    def read(self, partition: SeqStreamPartition):
        import os

        pid = os.getpid()
        for i in range(partition.start, partition.end):
            yield (
                i,
                i * i,
                "even" if i % 2 == 0 else "odd",
                partition.index,
                pid,
            )

    def commit(self, end):
        if self.cursor_dir:
            self._bump_hw(int(end["pos"]))


class SeqParallelDataSource(DataSource):
    """``marasa_seq_par``: the same deterministic sequence as
    ``marasa_seq`` but with a PARTITIONED stream reader — the shape a
    real high-volume source (Kafka-like log, sharded changefeed) needs,
    where the driver tracks offsets and executors fetch slices."""

    @classmethod
    def name(cls) -> str:
        return "marasa_seq_par"

    def schema(self) -> str:
        return "id long, square long, parity string, part_id int, worker_pid long"

    def streamReader(self, schema) -> "SeqParallelStreamReader":
        return SeqParallelStreamReader(self.options)
