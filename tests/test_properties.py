"""Property-based tests (hypothesis) for the exact-arithmetic kernels.

Each property batches all generated cases into ONE DataFrame so a hypothesis
example costs one Spark job, keeping the suite fast.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from cloudcomputing_flink_application_spark import schemas
from cloudcomputing_flink_application_spark.functions.scalar import (
    avg_half_up_cents,
    mph_from_speed_mps,
)
from cloudcomputing_flink_application_spark.operators.telematics import accident_reports


def java_mph(dpos: int, dt: int) -> int:
    """Pure-Python model of VehicleTelematics.java:283 (Java int semantics).

    Operands here are positive (as in every reachable reference path), so
    Java's truncating division equals floor division.
    """
    v1 = dpos // dt
    v2 = v1 * 3600 // 1000
    return int(v2 * 0.621371)  # int() truncates toward zero, same as Java (int)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 500_000), st.integers(1, 3600)),
        min_size=1,
        max_size=50,
    )
)
def test_mph_formula_matches_java_semantics(spark, cases):
    df = spark.createDataFrame(cases, ["dpos", "dt"])
    got = df.select(
        "dpos", "dt", mph_from_speed_mps(F.col("dpos"), F.col("dt")).alias("mph")
    ).collect()
    for r in got:
        assert r.mph == java_mph(r.dpos, r.dt), (r.dpos, r.dt)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**9), st.integers(1, 10**5)),
        min_size=1,
        max_size=50,
    )
)
def test_avg_half_up_matches_decimal(spark, cases):
    df = spark.createDataFrame(cases, ["sum_cents", "cnt"])
    got = df.select(
        "sum_cents",
        "cnt",
        avg_half_up_cents(F.col("sum_cents"), F.col("cnt")).alias("avg"),
    ).collect()
    for r in got:
        expect = float(
            (Decimal(r.sum_cents) / Decimal(100) / Decimal(r.cnt)).quantize(
                Decimal("0.01"), rounding=ROUND_HALF_UP
            )
        )
        assert r.avg == expect, (r.sum_cents, r.cnt)


@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(
        st.integers(0, 20),  # vid
        st.integers(1, 12),  # number of consecutive stopped reports
        min_size=1,
        max_size=8,
    )
)
def test_accidents_n_minus_3_rule(spark, stopped):
    # a car stopped for N consecutive reports yields max(0, N-3) rows
    rows = []
    for vid, n in stopped.items():
        for i in range(n):
            rows.append((i * 30, vid, 0, 0, 1, 0, 10, 5000 + vid))
    df = spark.createDataFrame(rows, schema=schemas.CAR_REPORTS)
    out = accident_reports(df).groupBy("vid").count().collect()
    got = {r.vid: r["count"] for r in out}
    for vid, n in stopped.items():
        assert got.get(vid, 0) == max(0, n - 3), (vid, n)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 400_000)),  # (user, ts offset s)
        min_size=1,
        max_size=60,
        unique=True,
    )
)
def test_sessionize_matches_python_model(spark, events):
    # property: per-user session count == python model with the same gap rule
    from datetime import datetime, timedelta

    from cloudcomputing_flink_application_spark.operators.timeseries import (
        SESSION_GAP_MIN,
        sessionize,
    )

    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(seconds=off), uid, "click", 1.0, None)
        for i, (uid, off) in enumerate(sorted(events, key=lambda e: (e[0], e[1])))
    ]
    import os
    import tempfile

    import pandas as pd

    # sessionize reads events parquet via read_events (nanos normalization),
    # so materialize the generated rows the same way the driver data is laid out
    d = tempfile.mkdtemp()
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf.to_parquet(os.path.join(d, "events.parquet"))
    out = sessionize(spark, d)
    got = {(r.user_id, r.session_seq): r.n_events for r in out.collect()}

    # python model
    gap = SESSION_GAP_MIN * 60
    model: dict[tuple[int, int], int] = {}
    by_user: dict[int, list[int]] = {}
    for uid, off in sorted(events, key=lambda e: (e[0], e[1])):
        by_user.setdefault(uid, []).append(off)
    for uid, offs in by_user.items():
        seq, prev = 0, None
        for off in offs:
            if prev is not None and off - prev > gap:
                seq += 1
            model[(uid, seq)] = model.get((uid, seq), 0) + 1
            prev = off
    assert got == model
