"""MarasaLog — the append-only, namespaced, seqno-versioned log store.

This is the Spark-native re-expression of the reference's core idea (*the
log is the database*; SURVEY.md §0.4/§1.1 — ``/root/reference`` is empty, so
the API shape follows SURVEY's reconstruction of pjz/marasa: ``put``/
``get``/``history``/namespaces/segments/snapshots):

* every write is an **append** of change records to a Parquet log
  partitioned by namespace (``log/ns=<ns>/``) — Spark's append mode writes
  new files only, never rewrites (the Delta/Iceberg slot-in point per
  BASELINE.json's north star; neither is installed here, so the layout is
  plain Parquet + a seqno convention that Delta could replace);
* current state is a fold over the log: last record per (ns, key) by seqno
  — expressed as a window function, never a driver-side replay;
* any historical state is a prefix fold: ``filter(seqno <= s)`` + the same
  window (time travel);
* **compaction** (= marasa's segment snapshot) materializes the fold into
  ``snapshot/upto=<S>/`` so reads become snapshot ∪ log-tail — replay cost
  is bounded by the tail length, not log length;
* **deletes are tombstones** (NULL-value records, the Kafka-compaction
  convention): ``latest``/``lookup``/``get``/``asof`` treat
  tombstone-as-last-change as key-gone, ``changes`` surfaces the
  tombstone to CDC consumers, and compaction physically drops the key
  from the snapshot.

Record schema (marasa stores JSON payloads keyed by string keys):
``ns string, key string, seqno long, ts timestamp, value string``.

Scale posture (100 TB):
* namespace partitioning → partition pruning on every ns-scoped read;
* ``latest``/``asof`` are one shuffle on (ns, key) — linear scale-out; at
  real scale the snapshot write would bucket by key so the tail-merge
  window co-locates without a shuffle;
* seqno assignment reads ``max(seqno)`` (a Parquet footer-stats scan, not
  a data scan) and numbers only the incoming batch — via the f3 two-phase
  range-partition + broadcast-offset shape, so even a bulk-load-sized
  batch never funnels through a single-partition window. Like the
  reference, the store assumes a **single writer** (SURVEY §7.4#2);
* no driver-side ``collect()`` anywhere in the data path.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from marasa_spark.session import ensure_session_configs

class LogWriteConflict(RuntimeError):
    """Two writers raced ``append()`` from the same high-water seqno.

    The store is single-writer (SURVEY §7.4#2): each append CASes a claim
    on its base seqno before writing, so the loser gets THIS error instead
    of silently writing colliding seqnos. A Delta/Iceberg backend replaces
    the claim file with its native commit-conflict protocol — same
    contract, same exception surface."""


class ProducerBatchInFlight(RuntimeError):
    """``append_once`` found the batch_id claimed but its high-water not
    yet recorded: the owning producer is still appending, or crashed
    between claim and record. Retry later, or clear with
    :meth:`MarasaLog.recover_claims` once the owner is known dead."""


LOG_SCHEMA = "ns string, key string, seqno long, ts timestamp, value string"
# on disk, records carry a segment partition column: segment = the starting
# seqno of the fixed-width seqno range the record falls in (marasa's "log
# files split every N writes, named by starting seqno"). Partition pruning
# on it turns time travel into a bounded read.
DISK_SCHEMA = LOG_SCHEMA + ", segment long"


class MarasaLog:
    def __init__(self, spark: SparkSession, path: str, segment_size: int = 100_000):
        self.spark = ensure_session_configs(spark)
        self.path = path.rstrip("/")
        self.log_dir = f"{self.path}/log"
        self.snap_dir = f"{self.path}/snapshot"
        self.segment_size = segment_size

    # -- write path ---------------------------------------------------------

    def append(self, records: DataFrame) -> int:
        """Append change records (``ns,key,ts?,value`` columns); assigns the
        next contiguous seqnos in the deterministic order (ns, key, ts,
        value) — the value tiebreaker makes same-(key, ts) batches
        order-deterministic too (identical full rows are interchangeable).
        Returns the new high-water seqno (base + batch size — no re-scan).
        Single-writer, like the reference.

        Seqno assignment is the f3_global_index two-phase shape, NOT a
        global ``row_number() OVER (ORDER BY ...)``: a bare global window
        funnels the whole batch through one task, which serializes a bulk
        load. Instead (1) range-repartition the batch on the sort key —
        balanced, sampled bounds; (2) per-partition counts → exclusive
        running offsets (one tiny N-row window, broadcast back); (3)
        seqno = base + offset + local row_number within the partition.
        Every phase is parallel; the only global object is the N-row
        offset table. Produces the identical contiguous numbering.
        """
        base = self.max_seqno()
        self._claim_base(base)
        batch = self._number_batch(records, base).withColumn(
            "segment",
            (F.floor(F.col("seqno") / self.segment_size) * self.segment_size).cast("long"),
        )
        from pyspark.sql import Observation

        # single-pass batch count: observed during the write job itself (a
        # separate count() would re-evaluate the input lineage)
        obs = Observation()
        batch = batch.observe(obs, F.count(F.lit(1)).alias("n"))
        self._write_log_batch(batch)
        n = int(obs.get["n"])
        self._commit_base(base, n)
        return base + n

    def append_retrying(
        self, records: DataFrame, max_attempts: int = 10, backoff_s: float = 0.2
    ) -> int:
        """Optimistic-concurrency append: :meth:`append`, but a
        :class:`LogWriteConflict` (another writer claimed our base seqno)
        is retried after a linear backoff instead of surfacing — the
        Delta/Iceberg commit-loop protocol on top of the same claim CAS.
        Each retry re-reads the high-water, so once the winning writer's
        commit marker lands, the loser rebases onto the new tail and its
        claim succeeds; concurrent writers therefore SERIALIZE rather than
        fail. Bounded: after ``max_attempts`` losses (a writer that claimed
        and died holds the base forever until :meth:`recover_claims`) the
        last conflict is re-raised with its recovery hint intact. The
        records lineage is re-evaluated per attempt — pass a deterministic
        input, as with any retried write job."""
        for attempt in range(max_attempts):
            try:
                return self.append(records)
            except LogWriteConflict:
                if attempt == max_attempts - 1:
                    raise
                time.sleep(backoff_s * (attempt + 1))
        raise AssertionError("unreachable")  # pragma: no cover

    def _number_batch(self, records: DataFrame, base: int) -> DataFrame:
        """Stamp ``seqno = base + rank in (ns, key, ts, value) order`` onto
        one batch — the parallel numbering plan described in :meth:`append`.
        Audited by tests/test_plan_audit.py (no single-partition window)."""
        if "ts" not in records.columns:
            records = records.withColumn("ts", F.current_timestamp())
        sort_cols = [F.col("ns"), F.col("key"), F.col("ts"), F.col("value")]
        nparts = max(1, min(32, records.rdd.getNumPartitions()))
        ranged = (
            records.select(
                F.col("ns").cast("string"),
                F.col("key").cast("string"),
                F.col("ts").cast("timestamp"),
                F.col("value").cast("string"),
            )
            .repartitionByRange(nparts, *sort_cols)
            .withColumn("_pid", F.spark_partition_id())
        )
        counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
        wcum = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
        offsets = counts.withColumn(
            "_offset", F.coalesce(F.sum("_n").over(wcum), F.lit(0))
        ).select("_pid", "_offset")
        wlocal = Window.partitionBy("_pid").orderBy(*sort_cols)
        return ranged.join(F.broadcast(offsets), "_pid").select(
            "ns",
            "key",
            (F.col("_offset") + F.row_number().over(wlocal) + F.lit(base))
            .cast("long")
            .alias("seqno"),
            "ts",
            "value",
        )

    # -- writer-conflict seam ------------------------------------------------

    @property
    def _txn_dir(self) -> str:
        return f"{self.path}/_txn"

    def _claim_base(self, base: int) -> None:
        """CAS the high-water: atomically create ``_txn/base=<base>``
        (O_CREAT|O_EXCL — the filesystem's compare-and-set). Exactly one
        writer can advance the log from a given base; the loser raises
        :class:`LogWriteConflict` BEFORE any data file is written. Claim
        files are one per committed batch (~bytes) and double as a commit
        journal; a crashed writer's claim is cleared with
        :meth:`recover_claims`."""
        os.makedirs(self._txn_dir, exist_ok=True)
        path = f"{self._txn_dir}/base={base}"
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise LogWriteConflict(
                f"another writer already claimed base seqno {base} "
                f"({path} exists); re-read the high-water and retry, or run "
                "recover_claims() if that writer is known dead"
            ) from None
        os.write(fd, f"pid={os.getpid()}\n".encode())
        os.close(fd)

    def _commit_base(self, base: int, n: int) -> None:
        """Write the commit marker for a landed batch. Readers trust ONLY
        the marker journal (see :meth:`_committed_high_water`): data files
        whose batch has no marker are invisible, which is what makes a
        concurrent ``latest()`` during an in-flight append read-atomic —
        it can list the writer's half-landed files but the seqno filter
        excludes every row of them. The marker is written AFTER the data
        job commits, so a crash leaves invisible orphans (cleaned by
        :meth:`recover_claims`), never a half-visible batch."""
        with open(f"{self._txn_dir}/commit_base={base}_n={n}", "w") as f:
            f.write(f"pid={os.getpid()}\n")

    def _committed_high_water(self) -> int | None:
        """Max committed seqno per the marker journal; None for a legacy
        store that has data but predates markers (reads fall back to
        trusting the data files, the pre-journal behavior)."""
        if not os.path.isdir(self._txn_dir):
            return None
        highs = []
        for name in os.listdir(self._txn_dir):
            if name.startswith("commit_base="):
                b, n = name.removeprefix("commit_base=").split("_n=")
                highs.append(int(b) + int(n))
        return max(highs, default=None)

    def _committed(self, log: DataFrame | None) -> DataFrame | None:
        """Apply the committed-read filter (snapshot isolation against an
        in-flight or crashed writer). A parquet row-group whose seqno
        stats sit above the high-water is skipped at scan time."""
        if log is None:
            return None
        hw = self._committed_high_water()
        if hw is None:
            return log
        return log.filter(F.col("seqno") <= hw)

    def recover_claims(self) -> int:
        """Clear claims that no committed data backs: a writer that claimed
        ``base == max_seqno()`` and died before its write landed leaves a
        claim that blocks every retry from that base. Single-operator
        recovery step (never run while a writer is in flight); returns the
        number of claims removed. Claims below the high-water belong to
        committed batches and are kept as the commit journal. Content-less
        producer tags (an ``append_once`` owner that died between claim
        and record — see :class:`ProducerBatchInFlight`) are cleared too,
        so the batch_id becomes resubmittable."""
        if not os.path.isdir(self._txn_dir):
            return 0
        high = self.max_seqno()
        removed = 0
        for name in os.listdir(self._txn_dir):
            full = f"{self._txn_dir}/{name}"
            if name.startswith("producer_batch="):
                # stale temp from a crash between tmp-write and rename
                if ".tmp." in name:
                    os.unlink(full)
                    removed += 1
                    continue
                with open(full) as f:
                    if not f.read().startswith("hw="):
                        os.unlink(full)
                        removed += 1
                continue
            if not name.startswith("base="):
                continue
            if int(name.split("=", 1)[1]) >= high:
                os.unlink(full)
                removed += 1
        self._vacuum_uncommitted(high)
        return removed

    def _vacuum_uncommitted(self, hw: int) -> int:
        """Physically remove data rows above the committed high-water — the
        orphans a writer that crashed between its data job and its commit
        marker leaves behind. They are already INVISIBLE (the committed
        filter), but they must not stay on disk: the next append re-issues
        the same seqnos from the committed base, and once its marker lands
        the orphans would surface as duplicates.

        Reader-safety guarantee (the read half of the ACID contract —
        property-tested in tests/test_log_properties.py): every data file
        is written by exactly ONE batch (:meth:`_write_log_batch` appends
        new files only), so a file holding any orphan row holds ONLY
        orphan rows — vacuum therefore just UNLINKS whole orphan files
        and never rewrites a file containing committed data. A concurrent
        reader pinned at S ≤ hw either never lists those files, or — if
        one vanishes between its plan's file listing and execution —
        fails cleanly with a missing-file error; it can never observe a
        half-vacuumed hybrid, because no byte of committed data moves.
        (The old implementation rewrote whole (ns, segment) partitions
        through an rmtree→rename window, during which a racing committed
        reader could silently lose that partition's rows.)

        A mixed file (committed + orphan rows in one file) is impossible
        under this writer; if one is ever found — foreign data laid out
        by another tool — vacuum refuses and raises rather than guessing.
        Bounded work: one metadata-scale aggregate (one row per file that
        contains orphans). Returns the number of rows removed."""
        n_removed = 0
        for path, n in self._orphan_file_stats(hw):
            try:
                os.unlink(path)
                n_removed += n
            except FileNotFoundError:
                pass  # another recovery already removed it
        return n_removed

    def _orphan_file_stats(self, hw: int) -> list[tuple[str, int]]:
        """(local path, row count) per whole-orphan data file above the
        committed high-water — the unit vacuum may unlink. Raises on a
        mixed file (committed + orphan rows in one file: impossible under
        this writer, so foreign data — refuse rather than rewrite
        committed bytes). Shared by the base vacuum and backends that
        must journal a remove action before unlinking (the Delta
        backend's protocol requirement)."""
        raw = self._read_dir(self.log_dir)
        if raw is None:
            return []
        stats = (
            raw.withColumn("_f", F.input_file_name())
            .groupBy("_f")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("seqno") > hw).cast("long")).alias("n_orphan"),
            )
            .filter(F.col("n_orphan") > 0)
            .collect()
        )  # metadata-scale: one row per file containing orphans
        mixed = [r for r in stats if r["n_orphan"] < r["n"]]
        if mixed:
            raise RuntimeError(
                "vacuum found file(s) mixing committed and uncommitted rows "
                f"(foreign layout?): {[r['_f'] for r in mixed][:3]} — refusing "
                "to rewrite committed data; clean up manually"
            )
        from urllib.parse import unquote, urlparse

        return [(unquote(urlparse(r["_f"]).path), int(r["n"])) for r in stats]

    # -- storage seam --------------------------------------------------------
    # Every physical read/write goes through these three methods and nothing
    # else. A Delta/Iceberg backend (BASELINE.json's north star — neither is
    # installed in this sandbox) is a subclass overriding exactly these:
    # _write_log_batch -> df.write.format("delta").mode("append"),
    # _write_snapshot  -> a MERGE/OVERWRITE transaction,
    # _read_dir        -> spark.read.format("delta") (+ time travel replaces
    # the seqno prefix filter). The fold/seqno/namespace logic above the seam
    # is storage-agnostic by construction.

    def _write_log_batch(self, batch: DataFrame) -> None:
        """Physical append of one seqno-stamped batch: new files only."""
        batch.write.mode("append").partitionBy("ns", "segment").parquet(self.log_dir)

    def _write_snapshot(self, state: DataFrame, upto: int) -> None:
        """Physical snapshot materialization at high-water ``upto``."""
        state.write.mode("overwrite").parquet(f"{self.snap_dir}/upto={upto}")

    def append_once(self, records: DataFrame, batch_id: str) -> int:
        """Idempotent producer append: a batch tagged with a producer-chosen
        ``batch_id`` lands at most once — re-submitting (the retry path of
        any at-least-once upstream) returns the recorded high-water instead
        of duplicating rows.

        Concurrency/crash protocol (both halves atomic, so no torn state
        is ever observable):

        1. the tag is CLAIMED with O_CREAT|O_EXCL (same CAS as
           :meth:`_claim_base`) BEFORE the append — two producers racing
           the SAME batch_id can never both append; exactly one wins the
           claim and the other reads the outcome;
        2. after the batch commits, the recorded high-water is written to
           a temp file and ``os.rename``\\ d onto the tag — a resubmit
           either sees the full ``hw=N`` content or the empty claim,
           never a truncated file.

        A resubmit that finds an EMPTY claim (the owner is still in
        flight, or crashed between claim and content-rename) raises
        :class:`ProducerBatchInFlight` instead of guessing — the caller
        retries later, or an operator who knows the owner is dead runs
        :meth:`recover_claims` (which clears content-less tags; check the
        commit journal for whether the dead attempt's batch landed before
        resubmitting — the same check Kafka's transactional producer does
        via its txn log, and the Delta slot-in does via txn appIds).
        Concurrent DISTINCT batch ids serialize via append_retrying."""
        if "/" in batch_id or batch_id.startswith("."):
            raise ValueError(f"invalid batch_id: {batch_id!r}")
        os.makedirs(self._txn_dir, exist_ok=True)
        tag = f"{self._txn_dir}/producer_batch={batch_id}"
        try:
            fd = os.open(tag, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            with open(tag) as f:
                content = f.read()
            if content.startswith("hw="):
                return int(content.split("=", 1)[1])
            raise ProducerBatchInFlight(
                f"batch_id {batch_id!r} is claimed but unrecorded: its "
                "producer is in flight or crashed; retry later or run "
                "recover_claims() if it is known dead"
            ) from None
        hw = self.append_retrying(records)
        tmp = f"{tag}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(f"hw={hw}")
        os.rename(tmp, tag)
        return hw

    def clone_to(self, dest_path: str) -> "MarasaLog":
        """Consistent backup: copy the COMMITTED change history into a new
        store at ``dest_path``, seqnos preserved verbatim, covered by one
        commit marker at the source's committed high-water. Because the
        copy reads through :meth:`changes` (the committed filter), an
        in-flight or crashed writer's half-landed rows are invisible to
        the backup by construction — a backup taken mid-append is exactly
        the last committed state, never a torn one. The high-water is
        captured ONCE, before the copy job runs, and both the row filter
        (``changes(0, until=hw)``) and the destination commit marker use
        that same value — so a concurrent ``append_retrying`` that commits
        mid-copy can neither leak rows into the backup nor leave the
        marker covering seqnos that were never copied. Snapshots are not
        copied (they are derived data; the restored store re-compacts on
        its own schedule). One distributed read + one partitioned write;
        no driver-side data path."""
        hw = self._committed_high_water()
        if hw is None:
            hw = self.max_seqno()
        rows = self.changes(0, until=hw)
        dest = MarasaLog(self.spark, dest_path, segment_size=self.segment_size)
        batch = rows.withColumn(
            "segment",
            (F.floor(F.col("seqno") / dest.segment_size) * dest.segment_size).cast(
                "long"
            ),
        )
        dest._write_log_batch(batch)
        os.makedirs(dest._txn_dir, exist_ok=True)
        dest._commit_base(0, hw)
        return dest

    def put(self, ns: str, **changes: str) -> int:
        """marasa ``put(ns, key=value, ...)`` — tiny-batch convenience over
        :meth:`append`."""
        rows = [(ns, k, v) for k, v in changes.items()]
        df = self.spark.createDataFrame(rows, "ns string, key string, value string")
        return self.append(df)

    def write(self, ns: str, **changes: str) -> int:
        """marasa ``write(ns, **changes)`` — alias of :meth:`put` (SURVEY
        §0.4 lists both call shapes)."""
        return self.put(ns, **changes)

    def delete(self, ns: str, keys: list[str]) -> int:
        """Delete keys via TOMBSTONES (the Kafka-compaction convention:
        a NULL-value change record). Deletion is an APPEND like any other
        write — history and time travel stay exact (``asof`` before the
        tombstone still shows the key; ``changes`` shows the tombstone
        itself, so CDC consumers SEE deletes) — while ``latest``/
        ``lookup``/``get`` treat a tombstone-as-last-change as key-gone,
        and :meth:`compact` therefore physically drops tombstoned keys
        from the snapshot (the retention half of a forget request; the
        raw log files age out via j9 retention). A later ``put`` of the
        same key simply supersedes the tombstone. The key list is
        driver-side by design — forget lists are human-scale, not
        corpus-scale."""
        if not keys:
            # A no-op delete must not claim a seqno / write empty log files.
            return self.max_seqno()
        rows = [(ns, k, None) for k in keys]
        df = self.spark.createDataFrame(rows, "ns string, key string, value string")
        return self.append(df)

    # -- metadata -----------------------------------------------------------

    def _read_dir(self, d: str, schema: str = DISK_SCHEMA) -> DataFrame | None:
        """None only when the directory doesn't exist (an empty store).
        A directory that exists but can't be read RAISES — a corrupt log
        must never be indistinguishable from an empty one."""
        if not os.path.isdir(d):
            return None
        return self.spark.read.schema(schema).parquet(d)

    def max_seqno(self) -> int:
        whole = self._full_log()
        if whole is None:
            return 0
        row = whole.agg(F.max("seqno").alias("m")).first()
        return int(row["m"] or 0)

    def _full_log(self) -> DataFrame | None:
        """The complete retained history. Compaction adds a snapshot but —
        like marasa's segments — does not delete log files, so history and
        time travel stay exact."""
        log = self._committed(self._read_dir(self.log_dir))
        return log if log is not None else self._union_snapshot_tail()

    def _latest_snapshot_seq(self) -> int:
        if not os.path.isdir(self.snap_dir):
            return 0
        seqs = [
            int(name.split("=", 1)[1])
            for name in os.listdir(self.snap_dir)
            if name.startswith("upto=")
        ]
        return max(seqs, default=0)

    def _union_snapshot_tail(self) -> DataFrame | None:
        """snapshot(≤S) ∪ log-tail(>S) — the bounded-replay read set.

        Crash-hardening: ``_latest_snapshot_seq`` selects by directory NAME,
        so an ``upto=S`` dir a writer left half-materialized (exists but
        ``_read_dir`` sees no committed content — e.g. unmanifested in the
        manifest backend) must NOT silently hide rows ≤ S. When the selected
        snapshot reads as None the fold falls back to replaying the full
        log — correct (the log retains everything), just unaccelerated
        until the next compact() succeeds."""
        s = self._latest_snapshot_seq()
        tail = self._committed(self._read_dir(self.log_dir))
        if s == 0:
            return tail
        snap = self._read_dir(f"{self.snap_dir}/upto={s}")
        if snap is None:
            return tail
        if tail is not None:
            return snap.unionByName(tail.filter(F.col("seqno") > s))
        return snap

    # -- read path ----------------------------------------------------------

    @staticmethod
    def _fold_latest(log: DataFrame) -> DataFrame:
        """The log fold: last change per (ns, key) — marasa ``get`` for every
        key at once, as one window (shuffles once on the state key)."""
        w = Window.partitionBy("ns", "key").orderBy(F.col("seqno").desc())
        return (
            log.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def latest(self, ns: str | None = None) -> DataFrame:
        """Current state (marasa ``get(ns, key)`` for all keys)."""
        log = self._union_snapshot_tail()
        if log is None:
            return self.spark.createDataFrame([], LOG_SCHEMA)
        if ns is not None:
            log = log.filter(F.col("ns") == ns)  # partition-pruned
        return (
            self._fold_latest(log)
            .filter(F.col("value").isNotNull())  # tombstone-as-last = gone
            .drop("segment")
        )

    def lookup(self, ns: str, keys: list[str]) -> DataFrame:
        """Batch point lookup: latest value for the given keys of ONE
        namespace. The predicates apply BEFORE the fold, so they reach the
        scan — ``ns`` prunes whole directories on the partitioned layout
        and ``key IN`` is a parquet row-group predicate; a point read
        touches a handful of row groups instead of folding the namespace.
        (``get`` is the single-key scalar convenience on top of this.)"""
        log = self._union_snapshot_tail()
        if log is None:
            return self.spark.createDataFrame([], LOG_SCHEMA)
        pruned = log.filter((F.col("ns") == ns) & F.col("key").isin(list(keys)))
        return (
            self._fold_latest(pruned)
            .filter(F.col("value").isNotNull())
            .drop("segment")
        )

    def get(self, ns: str, key: str, seqno: int | None = None) -> str | None:
        """Point lookup (latest or as-of). The only collect in the class —
        it returns a scalar to Python by definition."""
        df = self.asof(seqno, ns=ns) if seqno is not None else self.latest(ns=ns)
        row = df.filter(F.col("key") == key).select("value").first()
        return None if row is None else row["value"]

    def asof(self, seqno: int, ns: str | None = None) -> DataFrame:
        """Time travel: state as of ``seqno`` (prefix fold over the FULL log
        — the snapshot can't serve prefixes earlier than its high-water)."""
        log = self._full_log()
        if log is None:
            return self.spark.createDataFrame([], LOG_SCHEMA)
        if ns is not None:
            log = log.filter(F.col("ns") == ns)
        # segment pruning: the prefix can only live in segments whose start
        # is <= seqno (null segment = pre-segmentation snapshot rows)
        log = log.filter(F.col("segment").isNull() | (F.col("segment") <= seqno))
        return (
            self._fold_latest(log.filter(F.col("seqno") <= seqno))
            .filter(F.col("value").isNotNull())  # tombstones hide the key as-of too
            .drop("segment")
        )

    def read(self, ns: str, seqno: int) -> DataFrame:
        """marasa ``read(ns, seqno)`` — namespace state as of a seqno
        (alias of :meth:`asof` with the reference's argument shape)."""
        return self.asof(seqno, ns=ns)

    def changes(self, since: int, until: int | None = None, ns: str | None = None) -> DataFrame:
        """CDC consumer read: the raw change feed with ``since < seqno <=
        until`` — the incremental-consumer offset pattern (a reader that
        remembers its last seqno reads exactly the delta, never replays).
        Served from the FULL log (snapshots only accelerate ``latest``);
        segment pruning drops every file whose range ends before ``since``."""
        log = self._full_log()
        if log is None:
            return self.spark.createDataFrame([], LOG_SCHEMA)
        if ns is not None:
            log = log.filter(F.col("ns") == ns)
        log = log.filter(
            F.col("segment").isNull()
            | (F.col("segment") + F.lit(self.segment_size) > F.lit(since))
        )
        out = log.filter(F.col("seqno") > since)
        if until is not None:
            out = out.filter(F.col("seqno") <= until)
        return out.drop("segment")

    def history(self, ns: str, key: str) -> DataFrame:
        """Ordered change history for one key (marasa ``history``), from the
        full retained log."""
        log = self._full_log()
        if log is None:
            return self.spark.createDataFrame([], LOG_SCHEMA)
        return (
            log.filter((F.col("ns") == ns) & (F.col("key") == key))
            .orderBy("seqno")
            .drop("segment")
        )

    def namespaces(self) -> DataFrame:
        log = self._union_snapshot_tail()
        if log is None:
            return self.spark.createDataFrame([], "ns string")
        return log.select("ns").distinct()

    # -- maintenance --------------------------------------------------------

    def compact(self) -> int:
        """Materialize the current fold as a snapshot (marasa's segment
        checkpoint). Reads after this touch snapshot ∪ tail(>S) only.
        Returns the snapshot's high-water seqno."""
        s = self.max_seqno()
        if s == 0:
            return 0
        self._write_snapshot(self.latest(), s)
        return s
