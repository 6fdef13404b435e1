"""Exact-arithmetic scalar helpers.

These pin the arithmetic quirks the reference bakes into query results so a
DuckDB oracle reproduces them bit-for-bit:

- Java integer division truncates toward zero (VehicleTelematics.java:283).
- ``BigDecimal.setScale(2, HALF_UP)`` rounding of a per-window average
  (CongestionArea.java:84-90).  Averaging IEEE doubles is summation-order
  dependent — wrong for a distributed engine that must hash-match a
  sequential oracle — so the oracle-facing path aggregates integer cents and
  rounds with pure integer arithmetic (order-independent at any parallelism).

Everything here returns Column expressions (whole-stage codegen'd); there are
no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def int_div(a: Column, b: Column) -> Column:
    """Java ``int/int`` division: truncate toward zero, as a Column.

    Built from sign/floor/abs so it is exact for negative operands too
    (``floor(a/b)`` alone would round toward -inf).
    """
    q = a.cast("double") / b.cast("double")
    return (F.signum(q) * F.floor(F.abs(q))).cast("long")


def trunc_to_int(x: Column) -> Column:
    """Java ``(int)`` cast of a double: truncate toward zero."""
    return (F.signum(x) * F.floor(F.abs(x))).cast("int")


def mph_from_speed_mps(dpos: Column, dt: Column) -> Column:
    """The reference's mph formula with Java int semantics.

    ``v1 = dpos intdiv dt`` (m/s, truncated); ``v2 = v1*3600 intdiv 1000``;
    ``mph = (int)(v2 * 0.621371)`` (truncate toward zero) —
    VehicleTelematics.java:283.  Operands are non-negative in every reachable
    path (dir=0 traversals), so intdiv == floor-div here.
    """
    v1 = int_div(dpos, dt)
    v2 = int_div(v1 * F.lit(3600), F.lit(1000))
    return trunc_to_int(v2.cast("double") * F.lit(0.621371))


def avg_half_up_cents(sum_cents: Column, cnt: Column) -> Column:
    """HALF_UP average of integer cents, returned as dollars (double, 2dp).

    Equivalent to ``round(avg(x), 2)`` with HALF_UP (CongestionArea.java:84-90)
    but computed on exact integers: ``sign * ((2*|sum| + cnt) intdiv (2*cnt))``
    cents.  The sign branch matters: Java's HALF_UP rounds half AWAY FROM
    ZERO, and the unsigned formula would round a negative half toward +inf
    (refund-heavy windows can sum negative).  Order-independent — safe under
    any shuffle/partial-agg schedule, and reproducible verbatim in ANSI SQL
    for the oracle.
    """
    mag = F.floor((F.lit(2) * F.abs(sum_cents) + cnt) / (F.lit(2) * cnt))
    avg_cents = F.when(sum_cents < 0, -mag).otherwise(mag)
    return (avg_cents.cast("double") / F.lit(100.0)).cast("double")


def ts_fmt(ts: Column, twelve_hour: bool = False) -> Column:
    """Canonical 24-hour timestamp string, ``yyyy-MM-dd HH:mm:ss`` (UTC).

    The default deliberately normalizes the reference's ``hh``
    12-hour-without-AM/PM format bug (SaturatedVendor.java:82; SURVEY.md
    §2.9 X6).  ``twelve_hour=True`` replicates the reference byte-for-byte:
    ``hh`` is clock-hour-of-AM/PM in both Java's SimpleDateFormat and
    Spark's formatter, so hours 00 and 12 render as ``12`` and 13-23 as
    ``01``-``11``, with no AM/PM marker to disambiguate — a round-trip-
    breaking output, offered only for bit-parity with the reference binary.
    """
    return F.date_format(ts, "yyyy-MM-dd hh:mm:ss" if twelve_hour else "yyyy-MM-dd HH:mm:ss")
