"""Plan inspection helpers for tests: assert the physical plan we designed
for is the plan Catalyst actually produces (pushdown reached the scan, the
small side broadcast, no expensive expression leaked into a scan filter)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def scan_filters_containing(df: DataFrame, needle: str) -> int:
    """Count optimized-plan Filter lines containing ``needle`` — used to
    assert expensive expressions (md5, array_intersect) never run inside
    scan-side filters."""
    return sum(
        1
        for line in optimized_plan(df).split("\n")
        if "Filter" in line and needle in line
    )


def count_in_plan(df: DataFrame, needle: str, physical: bool = False) -> int:
    plan = physical_plan(df) if physical else optimized_plan(df)
    return plan.count(needle)
