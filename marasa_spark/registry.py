"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers here as a :class:`QuerySpec`:
a name (the §2 ID), a ``(spark, sf_dir) -> DataFrame`` builder, and — for
hash-checkable operators — the equivalent DuckDB SQL oracle. The driver's
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin projections of
this registry, and the internal pytest mirror parametrizes over it.

Discipline enforced here (SURVEY.md §2 notes):
* every floating aggregate is wrapped in ``round(x, 2)`` on BOTH sides;
* every window / top-k ``ORDER BY`` carries a unique tiebreaker;
* computed columns are aliased identically in Spark and oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver's rows-only check
    group: str
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, *, oracle: str | None = None, group: str, doc: str = ""
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query id: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, group=group, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all() -> None:
    # Import for side effects: each module populates REGISTRY on import.
    from marasa_spark import queries  # noqa: F401


def queries_map() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in sorted(REGISTRY.items())}


def oracle_sql_map() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle
        for name, spec in sorted(REGISTRY.items())
        if spec.oracle is not None
    }
