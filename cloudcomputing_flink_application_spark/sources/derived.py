"""Reference-shaped views derived deterministically from the driver's
``events`` table.

The driver verifies correctness on its own testdata (TESTDATA.md), which has
no highway-telemetry or taxi table.  These builders derive ``car_reports``
and ``taxi_trips`` views from ``events`` with **pure integer arithmetic**
(plus exact 2-decimal cent conversion), written twice: once as DataFrame
expressions (Spark) and once as a DuckDB CTE (oracle).  Both must produce
bit-identical rows — that property is what lets the five reference queries
run under the driver's hash-matching oracle gate.

Derivation design (mirrors FIXTURES.md coverage requirements):
- ``rn`` = per-user report index (row_number over event_id) gives each
  vehicle an ascending 30 s report cadence — the ascending-time assumption
  the reference bakes into its watermarks (VehicleTelematics.java:72-78).
- vehicles fall into cohorts by ``user_id % 3``:
  cohort 0 "traverser": walks segments 50..57 once (4 reports per segment),
  exercising Q-AVGSPD — fast cars (``user_id % 4 == 0``) clear the 60 mph
  fine threshold, slow ones don't;
  cohort 1 "stopper": position frozen for 6 consecutive reports at a time,
  exercising Q-ACC (each 6-run yields 3 rows, the leading 5-run yields 2);
  cohort 2 "cruiser": steadily moving background traffic.
- ``spd = (event_id * 7919) % 100`` puts ~10% of rows over the 90 mph
  Q-SPEED threshold.
- taxi trips: pickup = event ts, dropoff = pickup + (event_id % 20) minutes,
  vendor = user_id % 5, 2-decimal dollars from ``value`` as exact cents,
  surcharge 2.5 on every third event — exercising Q-CONG day windows and
  Q-SAT's strict <10 min back-to-back predicate.

Scale note: the derivation is one window function (row_number per user) —
a single hash shuffle by user_id; everything else is per-row projection that
fuses into the downstream query's scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# --- Spark side --------------------------------------------------------------


def _numbered(events: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("event_id")
    return events.select(
        "event_id", "user_id", "ts", "value", F.row_number().over(w).alias("rn")
    )


def car_reports_from_events(events: DataFrame) -> DataFrame:
    """Derive a CAR_REPORTS-shaped frame from ``events`` (see module doc)."""
    n = _numbered(events)
    cohort = F.col("user_id") % 3
    rn = F.col("rn").cast("long")
    eid = F.col("event_id")
    seg = F.when(
        cohort == 0, F.lit(50) + F.least(F.expr("rn div 4"), F.lit(7))
    ).otherwise((eid * 13) % 100)
    pos = (
        F.when(cohort == 1, F.expr("rn div 6") * 100 + F.col("user_id"))
        .when(
            cohort == 0,
            rn * F.when(F.col("user_id") % 4 == 0, F.lit(30000)).otherwise(F.lit(90)),
        )
        .otherwise(rn * 120 + eid % 7)
    )
    return n.select(
        (rn * 30).cast("int").alias("time"),
        F.col("user_id").cast("int").alias("vid"),
        ((eid * 7919) % 100).cast("int").alias("spd"),
        (F.col("user_id") % 4).cast("int").alias("xway"),
        (eid % 5).cast("int").alias("lane"),
        (F.col("user_id") % 2).cast("int").alias("dir"),
        seg.cast("int").alias("seg"),
        pos.cast("int").alias("pos"),
    )


def taxi_trips_from_events(events: DataFrame) -> DataFrame:
    """Derive a minimal taxi-trip frame from ``events`` (see module doc).

    Columns: vendor_id, tpep_pickup_datetime, tpep_dropoff_datetime,
    total_amount, congestion_surcharge — the starred subset every taxi query
    reads (FIXTURES.md §2).
    """
    eid = F.col("event_id")
    return events.select(
        (F.col("user_id") % 5).cast("int").alias("vendor_id"),
        F.col("ts").alias("tpep_pickup_datetime"),
        (F.col("ts") + F.make_interval(mins=(eid % 20).cast("int"))).alias(
            "tpep_dropoff_datetime"
        ),
        F.col("value").alias("total_amount"),
        F.when((eid % 3) == 0, F.lit(2.5)).otherwise(F.lit(0.0)).alias(
            "congestion_surcharge"
        ),
    )


# --- DuckDB oracle side ------------------------------------------------------

#: DuckDB CTE defining the identical car_reports view.  `//` is DuckDB's
#: integer division (Spark: `div`); both truncate toward zero for the
#: non-negative operands used here.
CAR_REPORTS_CTE = """
numbered AS (
  SELECT event_id, user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events
),
car_reports AS (
  SELECT
    CAST(rn * 30 AS INT)                 AS time,
    CAST(user_id AS INT)                 AS vid,
    CAST((event_id * 7919) % 100 AS INT) AS spd,
    CAST(user_id % 4 AS INT)             AS xway,
    CAST(event_id % 5 AS INT)            AS lane,
    CAST(user_id % 2 AS INT)             AS dir,
    CAST(CASE WHEN user_id % 3 = 0
              THEN 50 + least(rn // 4, 7)
              ELSE (event_id * 13) % 100 END AS INT) AS seg,
    CAST(CASE WHEN user_id % 3 = 1 THEN (rn // 6) * 100 + user_id
              WHEN user_id % 3 = 0 THEN rn * (CASE WHEN user_id % 4 = 0 THEN 30000 ELSE 90 END)
              ELSE rn * 120 + event_id % 7 END AS INT) AS pos
  FROM numbered
)
"""

#: DuckDB CTE defining the identical taxi_trips view.
TAXI_TRIPS_CTE = """
taxi_trips AS (
  SELECT
    CAST(user_id % 5 AS INT)                        AS vendor_id,
    ts                                              AS tpep_pickup_datetime,
    ts + to_minutes(event_id % 20)                  AS tpep_dropoff_datetime,
    value                                           AS total_amount,
    CASE WHEN event_id % 3 = 0 THEN 2.5 ELSE 0.0 END AS congestion_surcharge
  FROM events
)
"""
