"""Pushdown barrier: evaluate an expensive projection exactly once.

Catalyst's PushDownPredicates inlines deterministic projected expressions
into filters (and join conditions) that reference them.  Usually a win —
but when the projected expression is the dominant cost (a per-pair set
intersect, a 64-dim dot product) and the filter keeps most rows, inlining
makes the expression evaluate 2-4x per row: once in the pushed filter /
join condition and again in the surviving projection.

``filter_after_barrier`` computes the projection, then interposes a Window
node (count over a partition key already present in the data) before the
filter.  Filters on non-partition columns cannot cross a Window, so the
projection below it evaluates once; the tautological ``_barrier >= 1``
conjunct keeps column pruning from eliding the Window.  The added cost is
one hash shuffle of the already-projected (narrow) rows — orders of
magnitude cheaper than re-running the heavy expression when that
expression dominates.

Use ONLY when profiling shows expression re-evaluation dominating; for
cheap expressions the default pushdown is strictly better.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def filter_after_barrier(
    df: DataFrame, partition_col: str, predicate: Column
) -> DataFrame:
    """Apply ``predicate`` to ``df`` without letting it push below ``df``'s
    projection.  ``partition_col`` should be a low-skew existing column (the
    left key of a pair output works well)."""
    w = Window.partitionBy(partition_col)
    guarded = df.withColumn("_barrier", F.count(F.lit(1)).over(w))
    return guarded.filter((F.col("_barrier") >= 1) & predicate).drop("_barrier")
