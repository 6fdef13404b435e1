"""Highway-telematics queries: Q-SPEED, Q-AVGSPD, Q-ACC.

Capability reference: VehicleTelematics.java (semantics pinned in SURVEY.md
§2.11).  Each operator takes a ``car_reports`` DataFrame (schema
``schemas.CAR_REPORTS``) and returns the query's output DataFrame.  All three
are single-pass, shuffle-minimal batch plans; streaming variants live in
``streaming.jobs``.

Scale notes (100 TB stance):
- Q-SPEED is a pure scan-side filter+project — Catalyst pushes both into the
  parquet scan, zero shuffle.
- Q-AVGSPD is one hash aggregation keyed by (vid, xway): a single shuffle
  with map-side partial aggregation.  Key cardinality = number of vehicles,
  so state is O(cars), never O(reports).
- Q-ACC is one window shuffle keyed by vid with a bounded 4-row frame —
  state per key is constant; skewed vids cannot blow memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cloudcomputing_flink_application_spark.functions.scalar import mph_from_speed_mps

#: Speeding threshold, mph — SPEED_LIMIT (VehicleTelematics.java:35).
SPEED_LIMIT = 90
#: Average-speed measurement segments — VehicleTelematics.java:93-94.
SEG_START, SEG_END = 52, 56
#: Average-speed fine threshold, mph — VehicleTelematics.java:284.
AVG_SPEED_LIMIT = 60
#: Consecutive equal-position reports that constitute an accident —
#: window size of countWindow(4,1) (VehicleTelematics.java:171).
ACCIDENT_RUN = 4


def speed_radar(car_reports: DataFrame, speed_limit: int = SPEED_LIMIT) -> DataFrame:
    """Q-SPEED: every report at or above the speed limit.

    Reference: filter ``spd >= 90`` + projection to
    ``(time, vid, xway, seg, dir, spd)`` — VehicleTelematics.java:59-83
    (SpeedRadarData, :205-213).  Stateless; filter and column pruning reach
    the scan (verified in tests/test_plans.py).
    """
    return car_reports.filter(F.col("spd") >= speed_limit).select(
        "time", "vid", "xway", "seg", "dir", "spd"
    )


def average_speed_fines(
    car_reports: DataFrame,
    seg_start: int = SEG_START,
    seg_end: int = SEG_END,
    limit_mph: int = AVG_SPEED_LIMIT,
) -> DataFrame:
    """Q-AVGSPD: average-speed fines over the seg 52→56 measured stretch.

    Reference dataflow (VehicleTelematics.java:93-152,255-288): keep reports
    with ``seg ∈ {52,56}``; per (vid,dir,seg) a running reduce keeps max-pos
    (dir=0) / min-pos (dir=1); consecutive update pairs per (vid,dir) fire
    when ``first.seg==52 && last.seg==56``.  Batch-equivalent semantics
    (SURVEY.md §2.11):

    - only dir=0 can emit (a dir=1 traversal meets seg 56 first — pinned
      reference behavior, not "fixed");
    - the firing pair is (last report in seg 52, first report in seg 56):
      with ascending time and pos increasing for dir=0 these are the max-pos
      row of seg 52 and the min-pos row of seg 56;
    - speed formula with Java int division at each step
      (VehicleTelematics.java:283), emitted iff ``avgspd > 60``.

    Spark-first plan: conditional ``max_by``/``min_by`` in ONE hash aggregate
    keyed by (vid, xway) — single shuffle, partial agg map-side, state O(cars).
    """
    measured = car_reports.filter(
        (F.col("dir") == 0) & F.col("seg").isin(seg_start, seg_end)
    )
    pair = measured.groupBy("vid", "xway").agg(
        F.max_by(
            F.struct("time", "pos"), F.when(F.col("seg") == seg_start, F.col("pos"))
        ).alias("s52"),
        F.min_by(
            F.struct("time", "pos"), F.when(F.col("seg") == seg_end, F.col("pos"))
        ).alias("s56"),
    )
    fines = (
        pair.filter(
            F.col("s52").isNotNull()
            & F.col("s56").isNotNull()
            & (F.col("s52.time") < F.col("s56.time"))
        )
        .select(
            F.col("s52.time").alias("time1"),
            F.col("s56.time").alias("time2"),
            "vid",
            "xway",
            F.lit(0).alias("dir"),
            mph_from_speed_mps(
                F.col("s56.pos") - F.col("s52.pos"),
                F.col("s56.time") - F.col("s52.time"),
            ).alias("avgspd"),
        )
        .filter(F.col("avgspd") > limit_mph)
    )
    return fines


def accident_reports(car_reports: DataFrame, run: int = ACCIDENT_RUN) -> DataFrame:
    """Q-ACC: vehicles stopped for >= 4 consecutive reports at the same pos.

    Reference: per vid, sliding count window of 4 (countWindow(4,1),
    VehicleTelematics.java:171); emit when all 4 share ``pos``
    (only pos is compared — :315); output ``(time1 = first report of the run
    in-window, time2 = current, vid, xway, seg, dir, pos)``; a car stopped
    N>=4 reports yields N-3 rows (SURVEY.md §2.11).

    Spark-first plan: bounded window frame ``rowsBetween(-3, 0)`` partitioned
    by vid ordered by time — fires where the 4-row frame is full and
    min(pos)==max(pos) over it.  xway/seg/dir are taken from the run's first
    record (lag 3), matching the reference's copy-from-first behavior.
    """
    w = Window.partitionBy("vid").orderBy("time")
    frame = w.rowsBetween(-(run - 1), 0)
    return (
        car_reports.select(
            "time",
            "vid",
            "xway",
            "seg",
            "dir",
            "pos",
            F.count("*").over(frame).alias("_n"),
            F.min("pos").over(frame).alias("_minpos"),
            F.max("pos").over(frame).alias("_maxpos"),
            F.lag("time", run - 1).over(w).alias("_t1"),
            F.lag("xway", run - 1).over(w).alias("_xway1"),
            F.lag("seg", run - 1).over(w).alias("_seg1"),
            F.lag("dir", run - 1).over(w).alias("_dir1"),
        )
        .filter((F.col("_n") == run) & (F.col("_minpos") == F.col("_maxpos")))
        .select(
            F.col("_t1").alias("time1"),
            F.col("time").alias("time2"),
            "vid",
            F.col("_xway1").alias("xway"),
            F.col("_seg1").alias("seg"),
            F.col("_dir1").alias("dir"),
            "pos",
        )
    )
