"""The engine's one genuinely custom component: keyed sliding COUNT windows
for Structured Streaming.

Flink has ``countWindow(n, 1)`` natively (the reference leans on it:
VehicleTelematics.java:151-152, :171-172, and hand-builds one with
GlobalWindows+trigger+evictor in SaturatedVendor.java:56-71 — proven
equivalent to countWindow(2,1) in SURVEY.md §2.6 N4).  Structured Streaming
has no count-window primitive, so this module implements one on
``applyInPandasWithState``: per key, a GroupState buffer holds the last
``n-1`` rows; each arriving row forms a window with the buffer and an
emit function decides the output rows.

Ordering contract: ascending event time per key, matching the reference's
``AscendingTimestampExtractor`` (zero allowed lateness — SURVEY.md §2.3).
Rows are sorted by the order column within each micro-batch; cross-batch
order is the arrival order, exactly like Flink's in-order file source.

Scale: state per key is O(n) rows (n = 2 or 4 here) — bounded regardless of
key skew; the shuffle is the groupBy's hash exchange, identical to Flink's
keyBy.  Arrow batching keeps the Python hop vectorized.
"""

from __future__ import annotations

from typing import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def sliding_count_window(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str | Sequence[str],
    buffer_cols: Sequence[str],
    n: int,
    emit: Callable[[list[tuple], tuple], list[tuple]],
    output_schema: T.StructType,
) -> DataFrame:
    """Keyed sliding count window of size ``n``, slide 1, over a streaming df.

    ``emit(window, row)`` is called once per arriving row with ``window`` =
    the up-to-``n`` most recent rows (oldest first, new row included, each a
    tuple of ``buffer_cols`` values) and must return output tuples matching
    ``output_schema``.  ``order_col`` may be a list of columns — pass the
    batch window's full ORDER BY key (including tiebreaks) so rows with
    equal primary order pair identically on both surfaces.

    Streaming-only (applyInPandasWithState requires a streaming frame); the
    batch equivalents are the window-frame/lag formulations in
    ``operators.telematics`` / ``operators.taxi``, proven equal to these in
    tests/test_streaming.py.
    """
    state_schema = T.StructType(
        [
            T.StructField(
                f"b_{c}",
                T.ArrayType(df.schema[c].dataType),
                True,
            )
            for c in buffer_cols
        ]
    )

    cols = list(buffer_cols)
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)

    def process(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            packed = state.get
            buffer = [tuple(vals) for vals in zip(*packed)] if packed[0] is not None else []
        else:
            buffer = []
        out: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(order_cols, kind="mergesort")
            for row in pdf[cols].itertuples(index=False, name=None):
                buffer.append(row)
                if len(buffer) > n:
                    buffer.pop(0)
                out.extend(emit(list(buffer), row))
        state.update(tuple([list(col) for col in zip(*buffer)]) if buffer else tuple([[] for _ in cols]))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in output_schema.fields])

    return (
        df.groupBy(*keys)
        .applyInPandasWithState(
            process,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
