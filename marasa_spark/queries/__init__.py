"""Operator inventory (SURVEY.md §2). Importing this package registers every
query into :mod:`marasa_spark.registry`. One module per §2 group family."""

from marasa_spark.queries import (  # noqa: F401
    aggregates,
    functions,
    joins,
    llm,
    logstore,
    pipeline,
    relational,
    scans,
    sinks,
    streaming,
    temporal,
    udx,
    windows,
)
