"""marasa_spark — a PySpark-native analytics engine with the capabilities of
``pjz/marasa`` (a log-oriented key-value store), re-expressed Spark-first and
extended with relational analytics, streaming, and LLM-data-pipeline
operators.

Provenance note (see SURVEY.md §0): ``/root/reference`` is empty, so no
``file:line`` citations into the reference are possible. The operator
inventory this package implements is SURVEY.md §2, which reconstructs the
reference's log-store surface (group J) and adds the driver-mandated
relational / streaming / LLM-data surface.

Architecture: everything is declared through the DataFrame / Spark SQL API so
Catalyst + Tungsten pick physical strategies (predicate pushdown, broadcast
joins, partial aggregation, AQE). Python UDFs appear only in the L-group
(whose very purpose is the UDF surface) and multimodal stubs; every other
operator is pure built-in expressions, JVM-side and whole-stage-codegen'd.
"""

from marasa_spark.registry import REGISTRY, oracle_sql_map, queries_map
from marasa_spark.session import ensure_session_configs, get_spark

__all__ = [
    "REGISTRY",
    "queries_map",
    "oracle_sql_map",
    "get_spark",
    "ensure_session_configs",
]
