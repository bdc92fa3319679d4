"""The storage seam is real: JsonMarasaLog overrides ONLY the three
physical methods and the full behavioral surface still holds — the
offline rehearsal of the Delta/Iceberg slot-in (log_backends.py)."""

from __future__ import annotations

import datetime

import pytest

# round 12: heavy property/soak tier — deselected from the default
# driver-stampable run (see conftest); MARASA_FULL_SUITE=1 restores it
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from marasa_spark.log import LogWriteConflict
from marasa_spark.log_backends import JsonMarasaLog


def _ts(i: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=i)


def _batch(spark, rows, t0):
    return spark.createDataFrame(
        [(ns, k, _ts(t0 + i), v) for i, (ns, k, v) in enumerate(rows)],
        "ns string, key string, ts timestamp, value string",
    )


def test_json_backend_full_surface(spark, tmp_path):
    store = JsonMarasaLog(spark, str(tmp_path / "jstore"), segment_size=3)

    # append + numbering semantics are inherited
    assert store.append(_batch(spark, [("a", "k1", "v1"), ("a", "k2", "v2")], 0)) == 2
    assert store.append(_batch(spark, [("a", "k1", "v3"), ("b", "k9", "v4")], 10)) == 4

    latest = {(r["ns"], r["key"]): r["value"] for r in store.latest().collect()}
    assert latest == {("a", "k1"): "v3", ("a", "k2"): "v2", ("b", "k9"): "v4"}

    # time travel + history + point get
    asof2 = {(r["ns"], r["key"]): r["value"] for r in store.asof(2).collect()}
    assert asof2 == {("a", "k1"): "v1", ("a", "k2"): "v2"}
    assert [r["value"] for r in store.history("a", "k1").collect()] == ["v1", "v3"]
    assert store.get("a", "k1") == "v3"

    # compaction: snapshot ∪ tail keeps serving the same state
    assert store.compact() == 4
    assert store.append(_batch(spark, [("a", "k2", "v5")], 20)) == 5
    latest2 = {(r["ns"], r["key"]): r["value"] for r in store.latest().collect()}
    assert latest2[("a", "k2")] == "v5" and latest2[("a", "k1")] == "v3"

    # crash recovery: claim + data without marker stays invisible, vacuums
    base = store.max_seqno()
    store._claim_base(base)
    orphan = store._number_batch(
        _batch(spark, [("a", "k1", "TORN")], 30), base
    ).withColumn("segment", F.lit(0).cast("long"))
    store._write_log_batch(orphan)
    assert store.get("a", "k1") == "v3", "uncommitted row leaked"
    with pytest.raises(LogWriteConflict):
        store.append(_batch(spark, [("a", "k1", "x")], 40))
    store.recover_claims()
    assert store.max_seqno() == 5

    # idempotent producer + consistent backup are inherited too
    assert store.append_once(_batch(spark, [("c", "kz", "z1")], 50), "b-1") == 6
    assert store.append_once(_batch(spark, [("c", "kz", "z1")], 50), "b-1") == 6
    # clone_to constructs a base-class (parquet) destination — the backup
    # lands in the DESTINATION's format, which is itself a seam property:
    # cross-backend migration is just clone_to.
    dest = store.clone_to(str(tmp_path / "jclone"))
    assert dest.max_seqno() == 6
    assert {
        (r["ns"], r["key"]): r["value"] for r in dest.latest().collect()
    } == {
        ("a", "k1"): "v3",
        ("a", "k2"): "v5",
        ("b", "k9"): "v4",
        ("c", "kz"): "z1",
    }


def test_manifest_backend_full_surface(spark, tmp_path):
    from marasa_spark.log_backends import ManifestMarasaLog

    store = ManifestMarasaLog(spark, str(tmp_path / "mstore"), segment_size=3)

    assert store.append(_batch(spark, [("a", "k1", "v1"), ("a", "k2", "v2")], 0)) == 2
    assert store.append(_batch(spark, [("a", "k1", "v3"), ("b", "k9", "v4")], 10)) == 4
    latest = {(r["ns"], r["key"]): r["value"] for r in store.latest().collect()}
    assert latest == {("a", "k1"): "v3", ("a", "k2"): "v2", ("b", "k9"): "v4"}
    asof2 = {(r["ns"], r["key"]): r["value"] for r in store.asof(2).collect()}
    assert asof2 == {("a", "k1"): "v1", ("a", "k2"): "v2"}
    assert [r["value"] for r in store.history("a", "k1").collect()] == ["v1", "v3"]
    assert store.compact() == 4
    assert store.append(_batch(spark, [("a", "k2", "v5")], 20)) == 5
    latest2 = {(r["ns"], r["key"]): r["value"] for r in store.latest().collect()}
    assert latest2[("a", "k2")] == "v5" and latest2[("a", "k1")] == "v3"


def test_manifest_backend_listing_isolation(spark, tmp_path):
    """The property the manifest ADDS beyond the base class: readers list
    files from the transaction journal, never the directory. A parquet
    file that lands in the log directory without a manifest entry (a
    foreign job, or a writer that crashed between its data job and its
    manifest append) is invisible — even when its seqnos sit INSIDE the
    committed range, where the base class's seqno filter would happily
    admit it. This is Delta's add-action semantics, tested directly."""
    import datetime

    from marasa_spark.log_backends import ManifestMarasaLog

    store = ManifestMarasaLog(spark, str(tmp_path / "iso_store"))
    store.append(_batch(spark, [("a", "k1", "v1"), ("a", "k2", "v2")], 0))

    # rogue file: committed-range seqno (2 == high-water), never manifested
    rogue = spark.createDataFrame(
        [("a", "k1", 2, datetime.datetime(2030, 1, 1), "ALIEN", 0)],
        "ns string, key string, seqno long, ts timestamp, value string, segment long",
    )
    rogue.write.mode("append").partitionBy("ns", "segment").parquet(store.log_dir)

    vals = {r["key"]: r["value"] for r in store.latest("a").collect()}
    assert vals == {"k1": "v1", "k2": "v2"}, (
        "an unmanifested file leaked into a read — directory listing is "
        "not isolation"
    )
    assert store.max_seqno() == 2
    # and the next append is numbered from the COMMITTED high-water,
    # oblivious to the rogue file
    assert store.append(_batch(spark, [("a", "k1", "v3")], 10)) == 3
    assert store.get("a", "k1") == "v3"


def test_manifest_snapshot_crash_window_closed(spark, tmp_path):
    """ADVICE r7 (medium): a writer dying between snapshot materialization
    and its manifest entry must not make reads silently drop rows <= N.
    Two layers close it: (1) _write_snapshot stages in a hidden .tmp dir
    and atomically renames AFTER manifesting, so a half-materialized
    snapshot is never visible under its upto=N name; (2) the base class's
    _union_snapshot_tail falls back to full-log replay when the selected
    snapshot reads as None (simulated here by planting an unmanifested
    upto=N dir directly)."""
    import os

    from marasa_spark.log_backends import ManifestMarasaLog

    store = ManifestMarasaLog(spark, str(tmp_path / "snapcrash"))
    store.append(_batch(spark, [("a", "k1", "v1"), ("a", "k2", "v2")], 0))

    # (1) a real compact is atomic: final dir carries its manifest, no tmp
    store.compact()
    snap_names = os.listdir(store.snap_dir)
    assert snap_names == ["upto=2"]
    assert os.path.isdir(f"{store.snap_dir}/upto=2/_manifest")

    # (2) plant a NEWER half-materialized snapshot: dir exists by name,
    # holds data files, but no manifest entry -> _read_dir sees None
    torn = f"{store.snap_dir}/upto=99"
    store.latest().write.mode("overwrite").parquet(torn)
    assert store._read_dir(torn) is None
    vals = {r["key"]: r["value"] for r in store.latest("a").collect()}
    assert vals == {"k1": "v1", "k2": "v2"}, (
        "half-materialized snapshot hid committed rows from latest()"
    )
    asof1 = {r["key"]: r["value"] for r in store.asof(1).collect()}
    assert asof1 == {"k1": "v1"}


def test_manifest_recover_sweeps_unmanifested(spark, tmp_path):
    """ADVICE r7 (low): unmanifested data files (crash between parquet job
    and _manifest_add) are invisible but used to accumulate forever; the
    manifest backend's recovery now physically sweeps them, plus stale
    .tmp snapshot staging dirs — restoring the base class's 'orphans do
    not stay on disk' contract."""
    import datetime
    import os

    from marasa_spark.log_backends import ManifestMarasaLog

    store = ManifestMarasaLog(spark, str(tmp_path / "sweepstore"))
    store.append(_batch(spark, [("a", "k1", "v1"), ("a", "k2", "v2")], 0))

    # unmanifested log file + stale snapshot staging dir, as a crash leaves
    rogue = spark.createDataFrame(
        [("a", "kX", 9, datetime.datetime(2030, 1, 1), "TORN", 0)],
        "ns string, key string, seqno long, ts timestamp, value string, segment long",
    )
    rogue.write.mode("append").partitionBy("ns", "segment").parquet(store.log_dir)
    stale_tmp = f"{store.snap_dir}/.tmp_upto=2.dead.cafe"
    store.latest().write.mode("overwrite").parquet(stale_tmp)

    manifested = set(store._manifested_files(store.log_dir))
    assert store._list_parts(store.log_dir) - manifested, "rogue not planted"

    store.recover_claims()

    assert store._list_parts(store.log_dir) == set(
        store._manifested_files(store.log_dir)
    ), "unmanifested files survived recovery"
    assert not os.path.isdir(stale_tmp), "stale snapshot staging dir survived"
    # committed data untouched
    vals = {r["key"]: r["value"] for r in store.latest("a").collect()}
    assert vals == {"k1": "v1", "k2": "v2"}
    assert store.max_seqno() == 2


def test_delta_backend_full_surface(spark, tmp_path):
    from marasa_spark.log_backends import DeltaMarasaLog

    store = DeltaMarasaLog(spark, str(tmp_path / "dstore"), segment_size=3)

    assert store.append(_batch(spark, [("a", "k1", "v1"), ("a", "k2", "v2")], 0)) == 2
    assert store.append(_batch(spark, [("a", "k1", "v3"), ("b", "k9", "v4")], 10)) == 4
    latest = {(r["ns"], r["key"]): r["value"] for r in store.latest().collect()}
    assert latest == {("a", "k1"): "v3", ("a", "k2"): "v2", ("b", "k9"): "v4"}
    asof2 = {(r["ns"], r["key"]): r["value"] for r in store.asof(2).collect()}
    assert asof2 == {("a", "k1"): "v1", ("a", "k2"): "v2"}
    assert [r["value"] for r in store.history("a", "k1").collect()] == ["v1", "v3"]
    assert store.compact() == 4
    assert store.append(_batch(spark, [("a", "k2", "v5")], 20)) == 5
    latest2 = {(r["ns"], r["key"]): r["value"] for r in store.latest().collect()}
    assert latest2[("a", "k2")] == "v5" and latest2[("a", "k1")] == "v3"
    # re-compact at the same high-water = a real OVERWRITE transaction
    assert store.compact() == 5
    assert {
        (r["ns"], r["key"]): r["value"] for r in store.latest().collect()
    } == latest2


def test_delta_protocol_layout_is_independently_parseable(spark, tmp_path):
    """The on-disk layout must be the OPEN protocol, checkable without any
    of the backend's own reader code: numbered ndjson commits under
    _delta_log/, version 0 carrying protocol (reader 1 / writer 2) and
    metaData (id, parquet format, Spark schemaString, partitionColumns),
    every add a relative path that exists with correct partitionValues,
    and an overwrite commit containing remove actions for the replaced
    files."""
    import json
    import os

    from marasa_spark.log_backends import DeltaMarasaLog

    store = DeltaMarasaLog(spark, str(tmp_path / "proto"), segment_size=3)
    store.append(_batch(spark, [("a", "k1", "v1"), ("b", "k2", "v2")], 0))
    store.compact()
    store.append(_batch(spark, [("a", "k1", "v3")], 10))
    store.compact()  # same-high-water? no — high-water moved; new upto dir
    store.compact()  # SAME high-water: the overwrite commit

    dlog = f"{store.log_dir}/_delta_log"
    names = sorted(
        n for n in os.listdir(dlog) if n.endswith(".json") and n[0].isdigit()
    )
    assert names[0] == "00000000000000000000.json"
    actions0 = [
        json.loads(line) for line in open(f"{dlog}/{names[0]}") if line.strip()
    ]
    protocols = [a["protocol"] for a in actions0 if "protocol" in a]
    metas = [a["metaData"] for a in actions0 if "metaData" in a]
    assert protocols == [{"minReaderVersion": 1, "minWriterVersion": 2}]
    assert len(metas) == 1
    meta = metas[0]
    assert meta["format"] == {"provider": "parquet", "options": {}}
    assert meta["partitionColumns"] == ["ns", "segment"]
    assert "seqno" in meta["schemaString"] and meta["id"]
    # every add in every commit: relative existing path + partitionValues
    for name in names:
        for a in (json.loads(l) for l in open(f"{dlog}/{name}") if l.strip()):
            if "add" not in a:
                continue
            add = a["add"]
            assert not add["path"].startswith("/")
            assert os.path.exists(f"{store.log_dir}/{add['path']}")
            assert add["partitionValues"].get("ns") in {"a", "b"}
            assert add["dataChange"] is True and add["size"] > 0
    # the re-compacted snapshot table holds an overwrite commit (removes)
    snaps = sorted(os.listdir(store.snap_dir))
    last_snap = f"{store.snap_dir}/{snaps[-1]}"
    sdlog = f"{last_snap}/_delta_log"
    sn = sorted(n for n in os.listdir(sdlog) if n.endswith(".json"))
    assert len(sn) == 2, "re-compact must be a second VERSION, not a wipe"
    v1 = [json.loads(l) for l in open(f"{sdlog}/{sn[1]}") if l.strip()]
    assert any("remove" in a for a in v1) and any("add" in a for a in v1)
    # replaced files are retained on disk (time-travel retention)
    for a in v1:
        if "remove" in a:
            assert os.path.exists(f"{last_snap}/{a['remove']['path']}")


def test_delta_checkpoint_replaces_commit_prefix(spark, tmp_path):
    """After a checkpoint lands, the JSON commits at or below its version
    are REDUNDANT: delete them (Delta's log-retention cleanup) and a fresh
    reader must still reconstruct the exact state from checkpoint + tail —
    the property that bounds metadata replay on a long-lived table."""
    import os

    from marasa_spark.log_backends import DeltaMarasaLog

    store = DeltaMarasaLog(spark, str(tmp_path / "cp"), segment_size=100)
    want = {}
    for i in range(12):  # crosses CHECKPOINT_INTERVAL=10
        store.append(_batch(spark, [("n", f"k{i}", f"v{i}")], i * 5))
        want[("n", f"k{i}")] = f"v{i}"
    dlog = f"{store.log_dir}/_delta_log"
    assert os.path.exists(f"{dlog}/_last_checkpoint")
    import json

    cp_v = json.load(open(f"{dlog}/_last_checkpoint"))["version"]
    removed = 0
    for name in list(os.listdir(dlog)):
        if name.endswith(".json") and name[0].isdigit() and int(name[:-5]) <= cp_v:
            os.unlink(f"{dlog}/{name}")
            removed += 1
    assert removed > 0
    reader = DeltaMarasaLog(spark, str(tmp_path / "cp"))
    got = {(r["ns"], r["key"]): r["value"] for r in reader.latest().collect()}
    assert got == want
    assert reader.max_seqno() == 12


def test_delta_vacuum_journals_removes_before_unlink(spark, tmp_path):
    """A crashed writer's orphan files must leave the table with NO add
    action pointing at a missing file after recovery: vacuum commits
    remove actions, then unlinks — verified by replaying the log
    independently and checking every live add's file exists."""
    import json
    import os

    from marasa_spark.log import MarasaLog
    from marasa_spark.log_backends import DeltaMarasaLog

    store = DeltaMarasaLog(spark, str(tmp_path / "vac"), segment_size=3)
    store.append(_batch(spark, [("a", "k1", "v1")], 0))
    # crash injection: claim + data + DELTA COMMIT, but no MarasaLog
    # commit marker (the window between _write_log_batch and _commit_base)
    base = store.max_seqno()
    store._claim_base(base)
    orphan = store._number_batch(_batch(spark, [("a", "k1", "TORN")], 30), base)
    orphan = orphan.withColumn("segment", F.lit(0).cast("long"))
    store._write_log_batch(orphan)
    assert store.get("a", "k1") == "v1", "uncommitted row leaked"
    assert store.recover_claims() == 1
    assert store.get("a", "k1") == "v1"
    # independent replay: live adds must all exist on disk
    dlog = f"{store.log_dir}/_delta_log"
    active = {}
    for name in sorted(os.listdir(dlog)):
        if not (name.endswith(".json") and name[0].isdigit()):
            continue
        for a in (json.loads(l) for l in open(f"{dlog}/{name}") if l.strip()):
            if "add" in a:
                active[a["add"]["path"]] = True
            elif "remove" in a:
                active.pop(a["remove"]["path"], None)
    assert active, "no live files left?"
    for rel in active:
        assert os.path.exists(f"{store.log_dir}/{rel}"), (
            f"live add points at vacuumed file {rel}"
        )
    # and the store still appends cleanly from the recovered base
    assert store.append(_batch(spark, [("a", "k2", "v2")], 40)) == 2
