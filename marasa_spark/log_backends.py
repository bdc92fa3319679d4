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


class DeltaMarasaLog(MarasaLog):
    """MarasaLog whose tables speak the OPEN Delta Lake transaction-log
    protocol on disk (the public spec: delta-io PROTOCOL.md, format
    version 1 tables) — the north star's physical layer implemented
    directly, since the `delta-spark` package is not installable here.

    Each table directory carries::

        <table>/_delta_log/00000000000000000000.json   # numbered commits
        <table>/_delta_log/0000000000000000000N.checkpoint.parquet
        <table>/_delta_log/_last_checkpoint            # {"version": N, ...}
        <table>/ns=a/segment=0/part-*.parquet          # data files

    Commits are newline-delimited JSON action lists: the first commit
    writes ``protocol`` (minReaderVersion 1 / minWriterVersion 2) and
    ``metaData`` (table id, parquet format, Spark schemaString, partition
    columns); every data write commits ``add`` actions (relative path,
    partitionValues, size, modificationTime, dataChange) and logical
    deletes commit ``remove`` actions. Commit atomicity and conflict
    detection use put-if-absent via ``os.link`` (EEXIST = a concurrent
    writer won that version — the same primitive Delta requires of its
    LogStore); a checkpoint parquet (one row per live action) plus
    ``_last_checkpoint`` is written every ``CHECKPOINT_INTERVAL`` commits,
    and readers reconstruct state as latest-checkpoint + tail-JSON replay
    — never by listing the data directory.

    Mapping onto the 3-method seam:

    * the log dir is ONE Delta table; ``_write_log_batch`` = parquet
      append job + one add-actions commit (Delta blind append — version
      conflicts rebase by just taking the next number);
    * each ``upto=N`` snapshot dir is its own Delta table; a re-compact
      at the same high-water is a real OVERWRITE transaction (remove all
      live files + add the new ones in one commit), with the replaced
      files retained on disk for time travel per the protocol;
    * ``_read_dir`` resolves the active file set from the log (checkpoint
      + tail) and reads exactly those parquet files.

    Crash windows (property-tested beside the manifest backend): data
    files written but not committed are invisible (no add action) and are
    swept by recovery; a torn commit attempt is a hidden ``.tmp`` file
    the reader never parses; vacuum journals ``remove`` actions BEFORE
    unlinking orphan files, so no reader window ever sees an add pointing
    at a vanished file. Tombstone bookkeeping: checkpoints materialize
    live adds only (equivalent state; our retention for replaced snapshot
    files is infinite, so expired-tombstone GC never applies).
    """

    CHECKPOINT_INTERVAL = 10
    _PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}

    # ---------------- Delta log primitives ----------------

    @staticmethod
    def _dlog(table: str) -> str:
        return f"{table}/_delta_log"

    @staticmethod
    def _commit_name(version: int) -> str:
        return f"{version:020d}.json"

    def _versions(self, table: str) -> list[int]:
        d = self._dlog(table)
        if not os.path.isdir(d):
            return []
        out = []
        for name in os.listdir(d):
            if name.endswith(".json") and not name.startswith(("_", ".")):
                stem = name[: -len(".json")]
                if stem.isdigit():
                    out.append(int(stem))
        return sorted(out)

    def _commit(self, table: str, actions: list[dict]) -> int:
        """Write one commit via tmp-file + hard-link put-if-absent; on
        EEXIST (a concurrent writer claimed the version) retry at the next
        number — sound here because every commit this backend produces is
        a blind append / self-contained overwrite (Delta's append-only
        conflict rule). Returns the committed version."""
        d = self._dlog(table)
        os.makedirs(d, exist_ok=True)
        payload = "".join(json.dumps(a, sort_keys=True) + "\n" for a in actions)
        while True:
            version = (self._versions(table) or [-1])[-1] + 1
            final = f"{d}/{self._commit_name(version)}"
            tmp = f"{d}/.{self._commit_name(version)}.{os.getpid()}.{os.urandom(4).hex()}.tmp"
            with open(tmp, "w") as f:
                f.write(payload)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, final)  # put-if-absent: fails if version taken
                os.unlink(tmp)
            except FileExistsError:
                os.unlink(tmp)
                continue
            self._maybe_checkpoint(table, version)
            return version

    def _table_state(self, table: str) -> dict[str, dict] | None:
        """path → add action for the LIVE files, from latest checkpoint +
        tail replay. None when the table has no transaction log at all."""
        d = self._dlog(table)
        if not os.path.isdir(d):
            return None
        active: dict[str, dict] = {}
        start = 0
        cp = self._read_last_checkpoint(table)
        if cp is not None:
            cp_version, rows = cp
            for a in rows:
                if a.get("add"):
                    active[a["add"]["path"]] = a["add"]
            start = cp_version + 1
        for v in self._versions(table):
            if v < start:
                continue
            with open(f"{d}/{self._commit_name(v)}") as f:
                for line in f:
                    if not line.strip():
                        continue
                    a = json.loads(line)
                    if "add" in a:
                        active[a["add"]["path"]] = a["add"]
                    elif "remove" in a:
                        active.pop(a["remove"]["path"], None)
        return active

    def _maybe_checkpoint(self, table: str, version: int) -> None:
        if version == 0 or version % self.CHECKPOINT_INTERVAL != 0:
            return
        self._write_checkpoint(table, version)

    def _write_checkpoint(self, table: str, version: int) -> None:
        """Materialize the state at ``version`` as the spec's checkpoint
        parquet (one row per action: protocol, metaData, live adds) +
        ``_last_checkpoint``. Metadata-scale, written driver-side with
        pyarrow — exactly what a Delta writer does."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        state = self._table_state(table) or {}
        meta = self._read_meta(table)
        rows: list[dict] = [
            {"protocol": self._PROTOCOL, "metaData": meta, "add": None},
        ]
        for add in state.values():
            rows.append({"protocol": None, "metaData": None, "add": add})
        schema = pa.schema(
            [
                pa.field(
                    "protocol",
                    pa.struct(
                        [
                            pa.field("minReaderVersion", pa.int32()),
                            pa.field("minWriterVersion", pa.int32()),
                        ]
                    ),
                ),
                pa.field(
                    "metaData",
                    pa.struct(
                        [
                            pa.field("id", pa.string()),
                            pa.field("schemaString", pa.string()),
                            pa.field("partitionColumns", pa.list_(pa.string())),
                        ]
                    ),
                ),
                pa.field(
                    "add",
                    pa.struct(
                        [
                            pa.field("path", pa.string()),
                            pa.field(
                                "partitionValues",
                                pa.map_(pa.string(), pa.string()),
                            ),
                            pa.field("size", pa.int64()),
                            pa.field("modificationTime", pa.int64()),
                            pa.field("dataChange", pa.bool_()),
                        ]
                    ),
                ),
            ]
        )

        def _conv(r):
            out = dict(r)
            if out["add"] is not None:
                a = dict(out["add"])
                a["partitionValues"] = sorted(a["partitionValues"].items())
                out["add"] = a
            if out["metaData"] is not None:
                out["metaData"] = {
                    k: out["metaData"].get(k)
                    for k in ("id", "schemaString", "partitionColumns")
                }
            return out

        tbl = pa.Table.from_pylist([_conv(r) for r in rows], schema=schema)
        d = self._dlog(table)
        pq.write_table(tbl, f"{d}/{version:020d}.checkpoint.parquet")
        tmp = f"{d}/._last_checkpoint.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "size": len(rows)}, f)
        os.rename(tmp, f"{d}/_last_checkpoint")

    def _read_last_checkpoint(self, table: str):
        d = self._dlog(table)
        lc = f"{d}/_last_checkpoint"
        if not os.path.exists(lc):
            return None
        with open(lc) as f:
            version = json.load(f)["version"]
        import pyarrow.parquet as pq

        path = f"{d}/{version:020d}.checkpoint.parquet"
        rows = pq.read_table(path).to_pylist()
        for r in rows:
            if r.get("add") and isinstance(r["add"].get("partitionValues"), list):
                r["add"]["partitionValues"] = dict(r["add"]["partitionValues"])
        return version, rows

    def _read_meta(self, table: str) -> dict:
        """metaData action of the table (checkpoint or commit 0)."""
        cp = self._read_last_checkpoint(table)
        if cp is not None:
            for a in cp[1]:
                if a.get("metaData"):
                    return a["metaData"]
        d = self._dlog(table)
        for v in self._versions(table):
            with open(f"{d}/{self._commit_name(v)}") as f:
                for line in f:
                    if not line.strip():
                        continue
                    a = json.loads(line)
                    if "metaData" in a:
                        return a["metaData"]
        raise RuntimeError(f"Delta table {table} has no metaData action")

    # ---------------- add-action construction ----------------

    @staticmethod
    def _partition_values(rel: str) -> dict[str, str]:
        vals = {}
        for seg in rel.split("/")[:-1]:
            if "=" in seg:
                k, _, v = seg.partition("=")
                vals[k] = v
        return vals

    def _add_actions(self, table: str, files: list[str]) -> list[dict]:
        out = []
        for p in sorted(files):
            rel = os.path.relpath(p, table)
            st = os.stat(p)
            out.append(
                {
                    "add": {
                        "path": rel,
                        "partitionValues": self._partition_values(rel),
                        "size": st.st_size,
                        "modificationTime": int(st.st_mtime * 1000),
                        "dataChange": True,
                    }
                }
            )
        return out

    def _meta_actions(self, schema_json: str, partition_cols: list[str]) -> list[dict]:
        import uuid

        return [
            {"protocol": dict(self._PROTOCOL)},
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_json,
                    "partitionColumns": partition_cols,
                    "configuration": {},
                }
            },
        ]

    def _list_parts(self, d: str) -> set[str]:
        parts: set[str] = set()
        for root, dirs, files in os.walk(d):
            dirs[:] = [x for x in dirs if not x.startswith(("_", "."))]
            for f in files:
                if not f.startswith(("_", ".")):
                    parts.add(os.path.join(root, f))
        return parts

    # ---------------- the three seam overrides ----------------

    def _write_log_batch(self, batch: DataFrame) -> None:
        first = not os.path.isdir(self._dlog(self.log_dir))
        before = (
            self._list_parts(self.log_dir) if os.path.isdir(self.log_dir) else set()
        )
        batch.write.mode("append").partitionBy("ns", "segment").parquet(self.log_dir)
        new = self._list_parts(self.log_dir) - before
        actions: list[dict] = []
        if first:
            actions += self._meta_actions(batch.schema.json(), ["ns", "segment"])
        actions += self._add_actions(self.log_dir, sorted(new))
        self._commit(self.log_dir, actions)

    def _write_snapshot(self, state: DataFrame, upto: int) -> None:
        table = f"{self.snap_dir}/upto={upto}"
        existing = self._table_state(table)
        before = self._list_parts(table) if os.path.isdir(table) else set()
        state.write.mode("append").parquet(table)
        new = self._list_parts(table) - before
        actions: list[dict] = []
        if existing is None:
            actions += self._meta_actions(state.schema.json(), [])
        else:
            # re-compact at the same high-water: a real OVERWRITE commit —
            # logical remove of every live file + add of the new ones,
            # atomically in one version; replaced files stay on disk
            # (time-travel retention)
            for rel in sorted(existing):
                actions.append(
                    {"remove": {"path": rel, "dataChange": True}}
                )
        actions += self._add_actions(table, sorted(new))
        self._commit(table, actions)

    def _read_dir(self, d: str, schema: str = DISK_SCHEMA):
        state = self._table_state(d)
        if not state:
            return None  # no table, or no live files — an empty store
        files = [f"{d}/{rel}" for rel in sorted(state)]
        return (
            self.spark.read.option("basePath", d).schema(schema).parquet(*files)
        )

    # ---------------- vacuum & recovery (remove-journaled) ----------------

    def _vacuum_uncommitted(self, hw: int) -> int:
        """Orphan rows above the committed high-water: journal ``remove``
        actions FIRST, then unlink — after the commit no reader resolves
        the files, so the unlink can never strand an add pointing at a
        missing file (the protocol invariant the manifest backend only
        approximates by tolerating ghosts)."""
        stats = self._orphan_file_stats(hw)
        n_removed = 0
        if stats:
            self._commit(
                self.log_dir,
                [
                    {
                        "remove": {
                            "path": os.path.relpath(p, self.log_dir),
                            "dataChange": True,
                        }
                    }
                    for p, _n in sorted(stats)
                ],
            )
            for p, n in stats:
                try:
                    os.unlink(p)
                    n_removed += n
                except FileNotFoundError:
                    pass
        self._sweep_untracked()
        return n_removed

    def _sweep_untracked(self) -> int:
        """Physical files no action ever tracked — the leftovers of a
        writer that crashed between its parquet job and its commit (plus
        torn hidden .tmp commit attempts). Invisible to every reader by
        construction; removing them is disk hygiene, same contract as the
        manifest backend's sweep (never run while a writer is in
        flight). Files referenced by REMOVE actions are retained (time
        travel)."""
        n = 0
        for table in self._tables():
            state = self._table_state(table)
            if state is None:
                continue
            tracked = {f"{table}/{rel}" for rel in self._all_tracked(table)}
            for p in sorted(self._list_parts(table) - tracked):
                os.unlink(p)
                n += 1
            d = self._dlog(table)
            for name in os.listdir(d):
                if name.startswith(".") and name.endswith(".tmp"):
                    os.unlink(f"{d}/{name}")
                    n += 1
        return n

    def _all_tracked(self, table: str) -> set[str]:
        """Every path any add OR remove action ever referenced (removes
        are retained files, not sweepable leftovers)."""
        tracked: set[str] = set()
        cp = self._read_last_checkpoint(table)
        if cp is not None:
            for a in cp[1]:
                if a.get("add"):
                    tracked.add(a["add"]["path"])
        d = self._dlog(table)
        for v in self._versions(table):
            with open(f"{d}/{self._commit_name(v)}") as f:
                for line in f:
                    if not line.strip():
                        continue
                    a = json.loads(line)
                    if "add" in a:
                        tracked.add(a["add"]["path"])
                    elif "remove" in a:
                        tracked.add(a["remove"]["path"])
        return tracked

    def _tables(self) -> list[str]:
        out = []
        if os.path.isdir(self._dlog(self.log_dir)):
            out.append(self.log_dir)
        if os.path.isdir(self.snap_dir):
            for name in sorted(os.listdir(self.snap_dir)):
                t = f"{self.snap_dir}/{name}"
                if name.startswith("upto=") and os.path.isdir(self._dlog(t)):
                    out.append(t)
        return out
