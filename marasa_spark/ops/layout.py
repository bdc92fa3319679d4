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
