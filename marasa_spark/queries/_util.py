"""Cross-engine determinism helpers.

Rounding: Spark's ``round()`` rounds the *shortest decimal representation*
of a double HALF_UP (Java ``BigDecimal.valueOf``), DuckDB rounds the binary
double value — for values landing exactly on ``.xx5`` in decimal (common
for price/quantity divisions) the two differ by one ulp of the target scale
(measured: round(5198.985, 2) → 5198.99 Spark vs 5198.98 DuckDB).

Fix: round with pure IEEE arithmetic — ``floor(x * 10^n + 0.5) / 10^n`` —
emitted identically on both engines. Same input bits + same IEEE op
sequence → bit-identical results, no decimal-string semantics involved.
(Convention: halves round toward +inf, including for negatives — applied
consistently on both sides.)
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column
from pyspark.sql import functions as F

SCRATCH = "/root/repo/_scratch"


def fresh_scratch(kind: str, sf_dir: str, create: bool = False) -> str:
    """A clean per-(operator, scale-factor) scratch directory for the
    file-writing operators (log sinks, csv/json round-trips, stream
    staging). Removes any previous contents so re-runs are idempotent.

    The path carries the process id so a concurrent test run and a
    driver/bench run executing the same operator never clobber each other's
    half-written files. Same-kind directories from DEAD processes are swept
    so repeated driver/test rounds don't accrete abandoned scratch.
    Staleness keys on the NEWEST mtime found inside the dir (walk), not the
    dir's own creation mtime — a long-lived session that made its scratch
    >2h ago but is still writing/reading files in it is live, and sweeping
    it would race a concurrent process into its open files."""
    import time

    tag = sf_dir.rstrip("/").split("/")[-1]
    d = f"{SCRATCH}/{kind}_{tag}_p{os.getpid()}"
    shutil.rmtree(d, ignore_errors=True)
    prefix = f"{kind}_{tag}_p"
    cutoff = time.time() - 2 * 3600

    def newest_mtime(root: str) -> float:
        newest = os.path.getmtime(root)
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                try:
                    newest = max(newest, os.path.getmtime(os.path.join(dirpath, fn)))
                except OSError:
                    pass
        return newest

    try:
        for name in os.listdir(SCRATCH):
            stale = f"{SCRATCH}/{name}"
            if (
                name.startswith(prefix)
                and stale != d
                and newest_mtime(stale) < cutoff
            ):
                shutil.rmtree(stale, ignore_errors=True)
    except OSError:
        pass
    if create:
        os.makedirs(d)
    return d


def r2(col: Column, n: int = 2) -> Column:
    """IEEE-deterministic round-half-up of a double column to n decimals."""
    m = F.lit(float(10**n))
    return F.floor(col * m + F.lit(0.5)) / m


def r2sql(expr: str, n: int = 2) -> str:
    """The DuckDB/ANSI-SQL twin of :func:`r2` (identical op sequence).

    The scale factor is CAST to DOUBLE explicitly: a bare ``100.0`` literal
    parses as DECIMAL in both engines — DuckDB still computes the division
    in double, but Spark's SQL front-end would switch to decimal division
    and change the result type (breaking DataFrame↔SQL parity)."""
    m = f"CAST({10**n} AS DOUBLE)"
    return f"floor(({expr}) * {m} + CAST(0.5 AS DOUBLE)) / {m}"
