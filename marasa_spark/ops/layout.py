"""Multi-dimensional data layout (Z-order / Morton interleaving).

At 100 TB the dominant cost of a selective two-dimensional predicate
(``part BETWEEN .. AND supplier BETWEEN ..``) is how many files the scan
must open. Sorting by ONE key clusters that key perfectly and the other
not at all; interleaving the bits of both keys (Morton / Z-order) gives
every file a small *rectangle* of the key space, so min/max file stats
prune on BOTH dimensions. This is the layout trick behind Delta/Iceberg
``OPTIMIZE ZORDER BY`` — re-expressed here as plain deterministic column
arithmetic so it works on any engine and is oracle-checkable.

The bit interleave is emitted as pure IEEE arithmetic (``floor(x / 2^i) %
2``) rather than shift/and builtins so the Spark Column expression and the
DuckDB SQL twin are the same op sequence on the same double-exact integer
range (both engines agree bit-for-bit; see queries/_util.py for the
convention).

Scale posture: assigning the file bucket from the HIGH BITS of the z-value
(``z >> shift``) is a stateless per-row expression — no global sort, no
single-partition window, no sampled range boundaries. A writer would
``repartitionByRange`` (or ``partitionBy``) on that bucket; every task
then writes one z-range tile independently.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def z_interleave(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton z-value of two non-negative ints already reduced to ``bits``
    bits each: x occupies even bit positions, y odd. Pure arithmetic
    (exact in double for this range), no UDF, codegen-friendly."""
    terms = []
    for i in range(bits):
        xbit = F.floor(x / F.lit(float(2**i))).cast("long") % 2
        ybit = F.floor(y / F.lit(float(2**i))).cast("long") % 2
        terms.append(xbit * F.lit(2 ** (2 * i)))
        terms.append(ybit * F.lit(2 ** (2 * i + 1)))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def z_interleave_sql(x: str, y: str, bits: int = 8) -> str:
    """The DuckDB SQL twin of :func:`z_interleave` — identical op sequence
    (floor of a double division, cast, mod, integer multiply, sum)."""
    terms = []
    for i in range(bits):
        xbit = f"(CAST(floor(({x}) / CAST({2**i} AS DOUBLE)) AS BIGINT) % 2)"
        ybit = f"(CAST(floor(({y}) / CAST({2**i} AS DOUBLE)) AS BIGINT) % 2)"
        terms.append(f"{xbit} * {2 ** (2 * i)}")
        terms.append(f"{ybit} * {2 ** (2 * i + 1)}")
    return " + ".join(terms)


def with_hilbert(
    df,
    x: Column,
    y: Column,
    out: str = "hval",
    bits: int = 6,
):
    """Hilbert-curve index of two non-negative ints already reduced to
    ``bits`` bits each — the locality-superior alternative to
    :func:`z_interleave`: consecutive curve positions are ALWAYS grid
    neighbors (unit Manhattan step), so a file holding a curve range covers
    one connected blob, never Morton's quadrant-boundary jumps.

    The classic xy2d loop is STATEFUL (each level conditionally reflects
    and swaps x/y), so unlike the Morton index it cannot be one flat
    expression: each level is materialized as named columns (withColumn)
    and the level count is kept at 6 (a 64×64 grid) because Catalyst's
    project-collapse would otherwise inline the per-level CASEs into an
    exponentially growing single expression. Bit tests use the same
    floor-divide arithmetic convention as z_interleave; quadrant =
    (3·rx) XOR ry is emitted as the polynomial 3rx + ry − 2·rx·ry (exact
    on {0,1}², avoids dialect-split bitwise operators). Returns ``df``
    with ``out`` plus the rewritten coordinates dropped."""
    df = df.withColumn("_hx", x.cast("long")).withColumn("_hy", y.cast("long"))
    df = df.withColumn(out, F.lit(0).cast("long"))
    for i in range(bits - 1, -1, -1):
        s = 2**i
        df = df.withColumn(
            "_rx", F.floor(F.col("_hx") / F.lit(float(s))).cast("long") % 2
        ).withColumn(
            "_ry", F.floor(F.col("_hy") / F.lit(float(s))).cast("long") % 2
        )
        quad = (
            3 * F.col("_rx") + F.col("_ry") - 2 * F.col("_rx") * F.col("_ry")
        )
        df = df.withColumn(out, F.col(out) + F.lit(s * s) * quad)
        n1 = 2**bits - 1  # reflect about the FULL square: coordinates
        # stay in [0, 2^bits) at every level, so the floor-divide bit test
        # (valid only for non-negatives) never sees a negative — the s-1
        # textbook variant goes negative and silently relies on two's-
        # complement & semantics arithmetic SQL does not have
        nx = (
            F.when(
                F.col("_ry") == 0,
                F.when(F.col("_rx") == 1, F.lit(n1) - F.col("_hy")).otherwise(
                    F.col("_hy")
                ),
            )
            .otherwise(F.col("_hx"))
        )
        ny = (
            F.when(
                F.col("_ry") == 0,
                F.when(F.col("_rx") == 1, F.lit(n1) - F.col("_hx")).otherwise(
                    F.col("_hx")
                ),
            )
            .otherwise(F.col("_hy"))
        )
        df = (
            df.withColumn("_nhx", nx)
            .withColumn("_nhy", ny)
            .drop("_hx", "_hy")
            .withColumnRenamed("_nhx", "_hx")
            .withColumnRenamed("_nhy", "_hy")
        )
    return df.drop("_hx", "_hy", "_rx", "_ry")


def hilbert_sql(base: str, carries: list[str], x: str = "x", y: str = "y", bits: int = 6) -> str:
    """DuckDB twin of :func:`with_hilbert`: the same per-level rewrites as
    ``bits`` nested subqueries over ``base`` (a relation exposing integer
    columns ``x``, ``y`` plus ``carries``), yielding column ``hval``."""
    carry = ", ".join(carries)
    q = f"SELECT {carry}, CAST({x} AS BIGINT) AS _hx, CAST({y} AS BIGINT) AS _hy, CAST(0 AS BIGINT) AS hval FROM {base}"
    for i in range(bits - 1, -1, -1):
        s = 2**i
        rx = f"(CAST(floor(_hx / CAST({s} AS DOUBLE)) AS BIGINT) % 2)"
        ry = f"(CAST(floor(_hy / CAST({s} AS DOUBLE)) AS BIGINT) % 2)"
        n1 = 2**bits - 1
        q = f"""SELECT {carry},
  CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {n1} - _hy ELSE _hy END) ELSE _hx END AS _hx,
  CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {n1} - _hx ELSE _hx END) ELSE _hy END AS _hy,
  hval + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry}) AS hval
FROM ({q})"""
    return f"SELECT {carry}, hval FROM ({q})"


def z_interleave_nd(cols: list[Column], bits: int = 6) -> Column:
    """N-dimensional Morton value: dimension j contributes its bit i at
    output position ``i*N + j``. Generalizes :func:`z_interleave` (N=2);
    same pure floor/mod arithmetic, same scale posture — the bucket is
    still a stateless per-row expression at any N."""
    n = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            bit = F.floor(c / F.lit(float(2**i))).cast("long") % 2
            terms.append(bit * F.lit(2 ** (i * n + j)))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def z_interleave_nd_sql(cols: list[str], bits: int = 6) -> str:
    """DuckDB twin of :func:`z_interleave_nd`."""
    n = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            bit = f"(CAST(floor(({c}) / CAST({2**i} AS DOUBLE)) AS BIGINT) % 2)"
            terms.append(f"{bit} * {2 ** (i * n + j)}")
    return " + ".join(terms)
