"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (Q-CONG daily congestion averages — an
event-time day-window aggregation) at sf0.001; ``queries``/``oracle_sql``
expose every implemented operator from SURVEY.md §2 with its DuckDB oracle.
The implementations live in ``cloudcomputing_flink_application_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cloudcomputing_flink_application_spark.registry import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q_cong"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each query that is SQL-expressible."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
