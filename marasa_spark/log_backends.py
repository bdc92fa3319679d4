"""Alternative physical backends for :class:`marasa_spark.log.MarasaLog` —
the storage-seam rehearsal.

The north star (BASELINE.json) names Delta/Iceberg as the intended
physical layer, and neither is installable in this sandbox (SURVEY.md
§7.1). What IS provable offline is that the seam the swap would go
through actually exists: every physical read/write in MarasaLog funnels
through exactly three methods (``_write_log_batch``, ``_write_snapshot``,
``_read_dir`` — see the "storage seam" comment in log.py), and everything
above them — seqno assignment, claim CAS, commit markers, committed-read
filtering, fold/time-travel/CDC semantics, compaction, vacuum — is
storage-agnostic.

:class:`JsonMarasaLog` swaps the parquet data files for JSON-lines with
NO other override, and the full behavioral surface keeps passing
(tests/test_log_backends.py runs append / latest / asof / history /
compact / crash / recover / append_once / clone_to against it). That is
the same shape a Delta subclass takes::

    class DeltaMarasaLog(MarasaLog):
        def _write_log_batch(self, batch):
            batch.write.format("delta").mode("append")...
        def _write_snapshot(self, state, upto):
            ...  # a MERGE/OVERWRITE transaction
        def _read_dir(self, d, schema=DISK_SCHEMA):
            ...  # spark.read.format("delta"); Delta time travel can
                 # then REPLACE the seqno prefix filter

with the claim/marker machinery collapsing into Delta's own commit
protocol (same conflict surface: LogWriteConflict ≙ its concurrent-
modification error).

JSON is deliberately a WORSE format than parquet (no column pruning, no
row-group stats, bigger files) — the point of the subclass is seam
coverage, not performance. It exists so the "a backend is a 3-method
subclass" claim is a tested fact rather than a comment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from marasa_spark.log import DISK_SCHEMA, MarasaLog


class JsonMarasaLog(MarasaLog):
    """MarasaLog on JSON-lines data files — proof the storage seam holds.

    Only the three seam methods differ; every ACID/semantics code path
    (seqno CAS, commit markers, committed filter, fold, compact, vacuum,
    idempotent producer tags, backups) is inherited untouched."""

    def _write_log_batch(self, batch: DataFrame) -> None:
        batch.write.mode("append").partitionBy("ns", "segment").json(self.log_dir)

    def _write_snapshot(self, state: DataFrame, upto: int) -> None:
        state.write.mode("overwrite").json(f"{self.snap_dir}/upto={upto}")

    def _read_dir(self, d: str, schema: str = DISK_SCHEMA):
        import os

        if not os.path.isdir(d):
            return None
        return self.spark.read.schema(schema).json(d)
