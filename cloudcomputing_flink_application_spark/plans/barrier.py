"""Pushdown barrier: evaluate an expensive projection exactly once.

Catalyst's PushDownPredicates inlines deterministic projected expressions
into filters (and join conditions) that reference them.  Usually a win —
but when the projected expression is the dominant cost (a per-pair set
intersect, a 64-dim dot product) and the filter keeps most rows, inlining
makes the expression evaluate 2-4x per row: once in the pushed filter /
join condition and again in the surviving projection.

``filter_after_barrier`` applies the predicate wrapped in a
NONDETERMINISTIC no-op guard (``when(monotonically_increasing_id() >= 0,
pred)`` — the guard condition is true for every row, so the filter's
row-level semantics are exactly ``pred``, NULL-drops included).
PushPredicateThroughNonJoin/PushPredicateThroughJoin only move
deterministic conditions, and the ``when`` keeps the guard and the
predicate one non-splittable conjunct, so the filter stays ABOVE the
projection: the heavy expression evaluates once in the Project and the
filter consumes the projected attribute.

r14 optimization round (guide §2.4 "remove shuffles outright"): this
replaces the previous Window-count barrier, which bought the same
single evaluation at the price of one hash Exchange + Sort + WindowExec
over every candidate row.  The guard costs one integer comparison per
row, no exchange, no sort — plan diffs for the five dedup call sites are
in plans/r14/.  Behavior is identical run-to-run: the guard's
nondeterminism is metadata for the optimizer; its VALUE is constant
(ids are nonnegative by construction), so retried tasks produce the
same rows.

Use ONLY when profiling shows expression re-evaluation dominating; for
cheap expressions the default pushdown is strictly better.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_after_barrier(
    df: DataFrame, partition_col: str, predicate: Column
) -> DataFrame:
    """Apply ``predicate`` to ``df`` without letting it push below ``df``'s
    projection.  ``partition_col`` is unused since the guard replaced the
    Window barrier (r14); kept so call sites document their natural key."""
    del partition_col
    guarded = F.when(
        F.monotonically_increasing_id() >= 0, predicate
    ).otherwise(F.lit(False))
    return df.filter(guarded)
