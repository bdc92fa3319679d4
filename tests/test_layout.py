"""Z-order layout (ops/layout.py) behavior tests: the Spark expression
matches a bit-twiddling Python reference, and the bucket-locality claim
(m27's docstring) actually holds — every z-bucket spans a bounded
rectangle on BOTH dimensions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marasa_spark.ops.layout import z_interleave


def _z_ref(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_interleave_matches_bit_reference(spark):
    pts = [(x, y) for x in (0, 1, 5, 127, 128, 200, 255) for y in (0, 3, 64, 255)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", z_interleave(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == _z_ref(x, y), (x, y)


def test_z_buckets_bound_both_dimensions(spark, sf_dir):
    from marasa_spark.registry import REGISTRY
    import marasa_spark.queries  # noqa: F401

    rows = REGISTRY["m27_zorder_layout"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 16 buckets tile the 256x256 space into 64x64 rectangles
        assert r["max_p"] - r["min_p"] <= 63, r
        assert r["max_s"] - r["min_s"] <= 63, r


def test_file_skipping_index_actually_skips(spark, sf_dir):
    """m30's manifest must prune most of the 8 range files for the 6-month
    window (6.5-year span -> ~1-2 overlapping files), the pruned scan
    must agree with the unpruned filter, and — the round-5 verdict's
    plan-shape requirement — the prune must be a JVM-side filter over the
    persisted manifest (stat predicate pushed into the manifest's parquet
    scan), with the driver collecting ONLY the final surviving path list."""
    import datetime

    from pyspark.sql import functions as F

    from marasa_spark.catalog import load_table
    from marasa_spark.ops.manifest import (
        overlaps,
        pruned_manifest,
        pruned_paths,
        write_manifest,
    )
    from marasa_spark.queries._util import fresh_scratch

    d = fresh_scratch("m30test", sf_dir)
    load_table(spark, sf_dir, "orders").repartitionByRange(
        8, "o_orderdate"
    ).write.mode("overwrite").parquet(d)
    write_manifest(spark, d, ["o_orderdate"])
    back = spark.read.parquet(d)

    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1996, 7, 1)
    pred = overlaps("o_orderdate", lo, hi)
    assert spark.read.parquet(d + "_manifest").count() == 8

    # plan shape: the prune filter reaches the manifest scan as a
    # pushed-down parquet predicate — the prune never leaves the JVM
    surviving = pruned_manifest(spark, d, pred).select("file")
    plan = surviving._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "min_o_orderdate" in plan.split(
        "PushedFilters"
    )[1][:300], "stat predicate not pushed into the manifest scan:\n" + plan[:1200]

    files = pruned_paths(spark, d, pred)
    assert 0 < len(files) <= 2, f"expected <=2 overlapping files, got {len(files)}"

    # the m30 operator body itself must contain no collect() — the only
    # driver crossing lives in ops/manifest.pruned_paths
    import inspect

    from marasa_spark.registry import REGISTRY
    import marasa_spark.queries  # noqa: F401

    src = inspect.getsource(REGISTRY["m30_file_skipping_index"].fn)
    assert ".collect()" not in src, "m30 regained a driver-side stats collect"

    row_pred = (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")) & (
        F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp")
    )
    assert (
        spark.read.parquet(*files).filter(row_pred).count()
        == back.filter(row_pred).count()
    )


def test_manifest_prune_sound_for_arbitrary_windows(spark, sf_dir):
    """ops/manifest soundness property: for ANY probe window [lo, hi) —
    empty, partial, full-table, out-of-domain — the manifest-pruned scan
    plus row filter must equal the full-table filter exactly. Windows are
    swept over month boundaries across (and beyond) the table's domain;
    the min/max overlap bound can only over-approximate, never drop a
    qualifying file, and read_pruned's empty-prune path must return a
    readable empty frame."""
    import datetime

    from pyspark.sql import functions as F

    from marasa_spark.catalog import load_table
    from marasa_spark.ops.manifest import overlaps, read_pruned, write_manifest
    from marasa_spark.queries._util import fresh_scratch

    d = fresh_scratch("manifest_prop", sf_dir)
    load_table(spark, sf_dir, "orders").repartitionByRange(
        8, "o_orderdate"
    ).write.mode("overwrite").parquet(d)
    write_manifest(spark, d, ["o_orderdate"])
    back = spark.read.parquet(d)

    def month(y, m):
        return datetime.datetime(y, m, 1)

    windows = [
        (month(1994, 1), month(1994, 6)),   # fully before the 1995+ domain
        (month(1995, 1), month(1995, 2)),   # first month
        (month(1996, 3), month(1996, 3)),   # empty window (lo == hi)
        (month(1997, 6), month(1998, 9)),   # interior span
        (month(1990, 1), month(2010, 1)),   # superset of the whole domain
        (month(2001, 8), month(2002, 1)),   # tail boundary
        (month(2005, 1), month(2006, 1)),   # fully after
    ]
    for lo, hi in windows:
        row_pred = (F.col("o_orderdate") >= F.lit(lo)) & (F.col("o_orderdate") < F.lit(hi))
        pruned_n = read_pruned(spark, d, overlaps("o_orderdate", lo, hi)).filter(row_pred).count()
        full_n = back.filter(row_pred).count()
        assert pruned_n == full_n, (lo, hi, pruned_n, full_n)


def test_manifest_staleness_guard(spark, sf_dir):
    """assert_fresh must catch the stale-manifest trap: data appended
    after write_manifest is invisible to the prune, so the guard raises
    instead of letting a scan silently skip live files."""
    from pyspark.sql import functions as F

    from marasa_spark.catalog import load_table
    from marasa_spark.ops.manifest import (
        StaleManifestError,
        assert_fresh,
        write_manifest,
    )
    from marasa_spark.queries._util import fresh_scratch

    d = fresh_scratch("manifest_stale", sf_dir)
    o = load_table(spark, sf_dir, "orders")
    o.filter(F.col("o_orderkey") % 2 == 0).write.mode("overwrite").parquet(d)
    write_manifest(spark, d, ["o_orderdate"])
    assert_fresh(spark, d)  # fresh: no raise

    o.filter(F.col("o_orderkey") % 2 == 1).write.mode("append").parquet(d)
    with pytest.raises(StaleManifestError):
        assert_fresh(spark, d)

    write_manifest(spark, d, ["o_orderdate"])  # refresh heals it
    assert_fresh(spark, d)


def test_zorder_skipping_prunes_directories(spark, sf_dir):
    """m31: the bucket predicate must reach the scan as a PartitionFilter
    (directory pruning, 4 of 16 dirs for the 64x64 probe), and the pruned
    result must equal the unpruned full filter."""
    from pyspark.sql import functions as F

    from marasa_spark.registry import REGISTRY
    import marasa_spark.queries  # noqa: F401

    df = REGISTRY["m31_zorder_skipping"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "zb" in plan.split("PartitionFilters")[1][:120], (
        "bucket predicate did not become a partition filter:\n" + plan[:1200]
    )
    got = df.collect()[0]
    from marasa_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    want = (
        li.filter(
            ((F.col("l_partkey") % 256).between(32, 95))
            & ((F.col("l_suppkey") % 256).between(100, 163))
        ).count()
    )
    assert got["n"] == want


def _xy2d_ref(n: int, x: int, y: int) -> int:
    """Hilbert xy2d with full-square (n-1) reflection — the arithmetic-safe
    orientation with_hilbert implements (coordinates never go negative)."""
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_engine_matches_reference_bijective_adjacent(spark):
    """The Spark column chain must equal the python reference on EVERY cell
    of the 64×64 grid, be a bijection onto [0, 4096), and take unit
    Manhattan steps between consecutive curve positions — the property
    that makes Hilbert files connected blobs."""
    from marasa_spark.ops.layout import with_hilbert

    grid = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    rows = with_hilbert(grid, F.col("x"), F.col("y"), bits=6).collect()
    got = {(r["x"], r["y"]): r["hval"] for r in rows}
    assert len(got) == 4096
    for (x, y), h in got.items():
        assert h == _xy2d_ref(64, x, y), (x, y)
    inv = {h: xy for xy, h in got.items()}
    assert sorted(inv) == list(range(4096))
    for d in range(4095):
        (x0, y0), (x1, y1) = inv[d], inv[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, d


def test_hilbert_locality_not_worse_than_morton(spark):
    """File-skipping quality on the uniform grid: bucketing 256 consecutive
    curve positions per file, the mean bounding-box area of Hilbert
    buckets must not exceed Morton's (Hilbert has no quadrant-seam jumps;
    on the uniform 64×64 grid both tile perfectly, and on any grid a
    regression that broke the rotation would blow the boxes up)."""
    from marasa_spark.ops.layout import with_hilbert

    grid = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )

    def mean_box_area(df, val):
        rows = (
            df.select(F.floor(F.col(val) / F.lit(256.0)).alias("b"), "x", "y")
            .groupBy("b")
            .agg(
                (F.max("x") - F.min("x") + 1).alias("w"),
                (F.max("y") - F.min("y") + 1).alias("h"),
            )
            .collect()
        )
        return sum(r["w"] * r["h"] for r in rows) / len(rows)

    h = with_hilbert(grid, F.col("x"), F.col("y"), bits=6)
    z = grid.withColumn("zval", z_interleave(F.col("x"), F.col("y"), bits=6))
    assert mean_box_area(h, "hval") <= mean_box_area(z, "zval")


def test_z_interleave_nd_matches_bit_reference_3d(spark):
    """3-D Morton: engine value equals the python bit-interleave reference
    on every cell of an 8×8×8 grid, and the mapping is a bijection onto
    [0, 512) — the N-dimensional generalization is exact, not just the
    2-D case the m27 tests cover."""
    from marasa_spark.ops.layout import z_interleave_nd

    def ref(x: int, y: int, z: int, bits: int = 3) -> int:
        v = 0
        for i in range(bits):
            v |= ((x >> i) & 1) << (3 * i)
            v |= ((y >> i) & 1) << (3 * i + 1)
            v |= ((z >> i) & 1) << (3 * i + 2)
        return v

    grid = spark.range(512).select(
        (F.col("id") % 8).alias("x"),
        ((F.col("id") / 8).cast("long") % 8).alias("y"),
        (F.col("id") / 64).cast("long").alias("z"),
    )
    rows = grid.withColumn(
        "zv", z_interleave_nd([F.col("x"), F.col("y"), F.col("z")], bits=3)
    ).collect()
    got = {(r["x"], r["y"], r["z"]): r["zv"] for r in rows}
    assert len(got) == 512
    for (x, y, z), v in got.items():
        assert v == ref(x, y, z), (x, y, z)
    assert sorted(got.values()) == list(range(512))
