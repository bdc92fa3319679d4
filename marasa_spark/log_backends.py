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

import json
import os

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
        if not os.path.isdir(d):
            return None
        return self.spark.read.schema(schema).json(d)


class ManifestMarasaLog(MarasaLog):
    """MarasaLog on Parquet data + a TRANSACTION MANIFEST — the closest
    offline approximation of the Delta/Iceberg physical layer, still as a
    3-method seam subclass.

    The defining property (Delta's core trick): **readers never list the
    directory**. The set of data files belonging to the table is an
    explicit, append-only journal of manifest entries (one JSON file per
    committed write action, created with tmp-write + atomic ``os.rename``
    — the same crash discipline as ``append_once``'s tags). This is what
    makes object-store tables transactional: a write job that crashes
    mid-flight leaves part-files on disk, but they are UNMANIFESTED and
    therefore invisible to every reader, with no seqno filter needed —
    exactly Delta's add-action semantics, rehearsed on the local FS.

    Mapping to the base class's machinery:

    * ``_write_log_batch`` appends parquet files, then manifests exactly
      the files that job created (before/after diff — sound because the
      claim CAS admits one in-flight writer per store);
    * ``_write_snapshot`` overwrites the ``upto=N`` directory, then
      manifests its contents (overwrite wipes any prior manifest with the
      prior data — consistent, since a re-compact at the same high-water
      rewrites both together);
    * ``_read_dir`` unions the manifested files (``basePath`` recovers the
      ``ns``/``segment`` partition columns). Entries whose file has been
      removed by :meth:`MarasaLog._vacuum_uncommitted` (which physically
      unlinks whole orphan files — Delta's remove-action + vacuum,
      collapsed) are tolerated and skipped, the manifest analogue of a
      logged remove action.

    The seqno claim/commit-marker machinery is inherited unchanged — in a
    real Delta backend it would collapse into the log's own optimistic
    commit protocol; here both layers run, and the manifest adds the
    listing-isolation property on top."""

    _MANIFEST = "_manifest"

    def _manifest_dir(self, d: str) -> str:
        return f"{d}/{self._MANIFEST}"

    def _list_parts(self, d: str) -> set[str]:
        parts: set[str] = set()
        for root, dirs, files in os.walk(d):
            dirs[:] = [x for x in dirs if not x.startswith(("_", "."))]
            for f in files:
                if not f.startswith(("_", ".")):
                    parts.add(os.path.join(root, f))
        return parts

    def _manifest_add(self, d: str, files: list[str]) -> None:
        mdir = self._manifest_dir(d)
        os.makedirs(mdir, exist_ok=True)
        n = len(os.listdir(mdir))
        name = f"{n:010d}-{os.getpid()}-{os.urandom(4).hex()}.json"
        tmp = f"{mdir}/.{name}.tmp"
        with open(tmp, "w") as f:
            json.dump({"add": sorted(files)}, f)
        os.rename(tmp, f"{mdir}/{name}")

    def _manifested_files(self, d: str) -> list[str] | None:
        mdir = self._manifest_dir(d)
        if not os.path.isdir(mdir):
            return None
        files: list[str] = []
        for name in sorted(os.listdir(mdir)):
            if name.startswith(("_", ".")):
                continue
            with open(f"{mdir}/{name}") as f:
                files.extend(json.load(f)["add"])
        # a missing manifested file == a logged remove action (vacuum
        # unlinked a whole orphan file); committed data is never rewritten
        return [f for f in files if os.path.exists(f)]

    # -- the three seam overrides --------------------------------------------

    def _write_log_batch(self, batch: DataFrame) -> None:
        before = self._list_parts(self.log_dir) if os.path.isdir(self.log_dir) else set()
        batch.write.mode("append").partitionBy("ns", "segment").parquet(self.log_dir)
        new = self._list_parts(self.log_dir) - before
        self._manifest_add(self.log_dir, sorted(new))

    def _write_snapshot(self, state: DataFrame, upto: int) -> None:
        """Stage → manifest → atomic rename. The snapshot becomes visible
        under its final ``upto=N`` name only AFTER its manifest entry is on
        disk inside it, closing the crash window where the dir exists by
        name (so ``_latest_snapshot_seq`` selects it) but reads as empty —
        which would make ``_union_snapshot_tail`` silently drop rows ≤ N.
        (The base class ALSO hardens that read path by falling back to the
        full log; this keeps the invariant from being violated at all.)
        A crash before the rename leaves only a hidden ``.tmp`` dir, swept
        by :meth:`_sweep_unmanifested` on the next recovery."""
        final = f"{self.snap_dir}/upto={upto}"
        tmp = f"{self.snap_dir}/.tmp_upto={upto}.{os.getpid()}.{os.urandom(4).hex()}"
        state.write.mode("overwrite").parquet(tmp)
        parts = sorted(self._list_parts(tmp))
        # manifest entries must name the files' POST-rename paths
        self._manifest_add(tmp, [p.replace(tmp, final, 1) for p in parts])
        if os.path.isdir(final):  # re-compact at the same high-water
            import shutil

            shutil.rmtree(final)
        os.rename(tmp, final)

    def _read_dir(self, d: str, schema: str = DISK_SCHEMA):
        files = self._manifested_files(d)
        if not files:
            return None
        return (
            self.spark.read.option("basePath", d).schema(schema).parquet(*files)
        )

    # -- recovery: physical sweep of unmanifested leftovers -------------------

    def _sweep_unmanifested(self) -> int:
        """Remove files no manifest entry points at — the leftovers of a
        writer that crashed between its parquet job and ``_manifest_add``
        (log side), or between staging and rename (snapshot side). They are
        invisible to every reader by construction, so the sweep is pure
        disk-leak hygiene restoring the base class's 'orphans do not stay
        on disk' contract. Same operator contract as
        :meth:`MarasaLog.recover_claims`: never run while a writer is in
        flight (an in-flight append's files are unmanifested mid-job).
        Returns the number of files/dirs removed."""
        import shutil

        n = 0
        if os.path.isdir(self.log_dir):
            manifested = set(self._manifested_files(self.log_dir) or [])
            for p in sorted(self._list_parts(self.log_dir) - manifested):
                os.unlink(p)
                n += 1
        if os.path.isdir(self.snap_dir):
            for name in os.listdir(self.snap_dir):
                if name.startswith(".tmp_upto="):
                    shutil.rmtree(f"{self.snap_dir}/{name}", ignore_errors=True)
                    n += 1
        return n

    def _vacuum_uncommitted(self, hw: int) -> int:
        # manifested-but-uncommitted rows first (the base contract) …
        removed = super()._vacuum_uncommitted(hw)
        # … then unmanifested physical leftovers the manifest-scoped
        # _read_dir can never surface (counted as files, not rows — their
        # rows were never visible)
        self._sweep_unmanifested()
        return removed

    # -- optimistic multi-writer commit (the Delta-OCC seam) ------------------

    def append(self, records: DataFrame, max_attempts: int = 10) -> int:
        """Multi-writer optimistic append — Delta's commit protocol shape,
        rehearsed on the claim CAS. The base class surfaces a raced base
        seqno as :class:`~marasa_spark.log.LogWriteConflict` (single-writer
        contract, SURVEY §7.4#2); a transactional-manifest table instead
        makes concurrency a COMMIT-LOOP: on conflict, re-read the journal
        head (``max_seqno`` — the winner's marker has landed or will),
        re-CAS the new base, and re-stamp seqnos by re-running the append
        (seqnos live IN the data files, so a rebase rewrites the batch —
        the analogue of Delta regenerating its commit actions at version
        N+1). N racing appenders therefore ALL succeed with serialized,
        contiguous seqno ranges (property-tested in
        tests/test_log_properties.py); the other backends keep the raise.
        Bounded like :meth:`~marasa_spark.log.MarasaLog.append_retrying`:
        a dead claimant holds its base until ``recover_claims``, so after
        ``max_attempts`` losses the conflict surfaces with its recovery
        hint intact. (Explicit loop, not ``append_retrying`` — that helper
        dispatches back to ``self.append``, i.e. this method.)"""
        import time

        from marasa_spark.log import LogWriteConflict

        for attempt in range(max_attempts):
            try:
                return super().append(records)
            except LogWriteConflict:
                if attempt == max_attempts - 1:
                    raise
                time.sleep(0.05 * (attempt + 1))
        raise AssertionError("unreachable")  # pragma: no cover
