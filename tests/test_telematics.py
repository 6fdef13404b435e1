"""Golden tests for Q-SPEED / Q-AVGSPD / Q-ACC against hand-derived rows from
the reference fixtures (FIXTURES.md §4, SURVEY.md §2.11)."""

from __future__ import annotations

import pytest

from cloudcomputing_flink_application_spark import schemas
from cloudcomputing_flink_application_spark.operators.telematics import (
    accident_reports,
    average_speed_fines,
    speed_radar,
)
from tests.conftest import rows_set

# data_small.csv-equivalent rows: (time, vid, spd, xway, lane, dir, seg, pos).
# Car 72 walks segs 37,52..57 eastbound; speeds all <= 42.
DATA_SMALL = [
    (0, 0, 10, 0, 0, 1, 61, 99804),
    (0, 1, 10, 0, 0, 0, 1, 1609),
    (0, 5, 10, 0, 0, 0, 53, 85317),
    (0, 8, 10, 0, 0, 0, 78, 125560),
    (1, 58, 10, 0, 0, 0, 50, 80487),
    (1, 61, 10, 0, 0, 1, 97, 157755),
    (1, 72, 10, 0, 0, 0, 37, 59560),
    (30, 0, 40, 0, 0, 1, 61, 99334),
    (30, 1, 42, 0, 0, 0, 1, 2100),
    (30, 5, 40, 0, 0, 0, 53, 85790),
    (30, 8, 42, 0, 0, 0, 78, 126051),
    (31, 58, 40, 0, 0, 0, 50, 80950),
    (31, 61, 40, 0, 0, 1, 97, 157268),
    (32, 72, 40, 0, 0, 0, 52, 60036),
    (33, 72, 40, 0, 0, 0, 53, 60137),
    (34, 72, 40, 0, 0, 0, 54, 60238),
    (35, 72, 40, 0, 0, 0, 55, 60339),
    (36, 72, 40, 0, 0, 0, 56, 60440),
    (37, 72, 40, 0, 0, 0, 57, 60541),
]

# accident_test_data.csv-equivalent: vid 3 stopped at pos 139158 for 8 reports.
ACCIDENT_8 = [(t, 3, 0, 0, 1, 0, 26, 139158) for t in range(870, 1081, 30)]


@pytest.fixture(scope="module")
def data_small(spark):
    return spark.createDataFrame(DATA_SMALL, schema=schemas.CAR_REPORTS)


def test_speed_radar_empty_on_data_small(data_small):
    # All speeds <= 42 -> empty output (FIXTURES.md §4).
    assert speed_radar(data_small).count() == 0


def test_speed_radar_threshold(spark):
    rows = [
        (10, 1, 89, 0, 0, 0, 5, 100),
        (20, 2, 90, 1, 2, 0, 6, 200),  # >= 90 fires (boundary inclusive)
        (30, 3, 99, 0, 1, 1, 7, 300),
    ]
    df = spark.createDataFrame(rows, schema=schemas.CAR_REPORTS)
    out = speed_radar(df)
    assert out.columns == ["time", "vid", "xway", "seg", "dir", "spd"]
    assert rows_set(out) == {(20, 2, 1, 6, 0, 90), (30, 3, 0, 7, 1, 99)}


def test_avgspd_golden_car72(data_small):
    # SURVEY.md §7 Milestone 4: car 72 -> (32, 36, 72, 0, 0, 225).
    out = average_speed_fines(data_small)
    assert out.columns == ["time1", "time2", "vid", "xway", "dir", "avgspd"]
    assert rows_set(out) == {(32, 36, 72, 0, 0, 225)}


def test_avgspd_dir1_never_emits(spark):
    # A dir=1 car traversing 56 -> 52 produces NO output (SURVEY.md §2.11).
    rows = [
        (0, 9, 40, 0, 0, 1, 56, 90000),
        (10, 9, 40, 0, 0, 1, 55, 60000),
        (20, 9, 40, 0, 0, 1, 52, 30000),
    ]
    df = spark.createDataFrame(rows, schema=schemas.CAR_REPORTS)
    assert average_speed_fines(df).count() == 0


def test_avgspd_below_threshold_filtered(spark):
    # Slow traversal: 404 m over 404 s -> 1 m/s -> 3 kmh-ish -> 2 mph < 60.
    rows = [
        (0, 4, 30, 0, 0, 0, 52, 60036),
        (404, 4, 30, 0, 0, 0, 56, 60440),
    ]
    df = spark.createDataFrame(rows, schema=schemas.CAR_REPORTS)
    assert average_speed_fines(df).count() == 0


def test_avgspd_pairs_last52_first56(spark):
    # Multiple seg-52 and seg-56 reports: the pair is (LAST seg-52 report,
    # FIRST seg-56 report) — max-pos / min-pos for an eastbound car.
    rows = [
        (0, 7, 90, 0, 0, 0, 52, 1000),
        (10, 7, 90, 0, 0, 0, 52, 5000),  # last 52
        (20, 7, 90, 0, 0, 0, 56, 9000),  # first 56
        (30, 7, 90, 0, 0, 0, 56, 13000),
    ]
    df = spark.createDataFrame(rows, schema=schemas.CAR_REPORTS)
    [r] = average_speed_fines(df).collect()
    # dpos=4000, dt=10 -> v1=400; v2=400*3600//1000=1440; int(1440*.621371)=894
    assert (r.time1, r.time2, r.vid, r.avgspd) == (10, 20, 7, 894)


def test_accidents_golden_5_rows(spark):
    df = spark.createDataFrame(ACCIDENT_8, schema=schemas.CAR_REPORTS)
    out = accident_reports(df)
    assert out.columns == ["time1", "time2", "vid", "xway", "seg", "dir", "pos"]
    expected = {
        (t1, t1 + 90, 3, 0, 26, 0, 139158) for t1 in (870, 900, 930, 960, 990)
    }
    assert rows_set(out) == expected


def test_accidents_three_reports_no_output(spark):
    rows = [(t, 5, 0, 0, 1, 0, 30, 7777) for t in (0, 30, 60)]
    df = spark.createDataFrame(rows, schema=schemas.CAR_REPORTS)
    assert accident_reports(df).count() == 0


def test_accidents_run_broken_by_move(spark):
    # 4 reports but position changes on the 3rd -> no accident.
    rows = [
        (0, 6, 0, 0, 1, 0, 30, 100),
        (30, 6, 0, 0, 1, 0, 30, 100),
        (60, 6, 0, 0, 1, 0, 30, 200),
        (90, 6, 0, 0, 1, 0, 30, 200),
    ]
    df = spark.createDataFrame(rows, schema=schemas.CAR_REPORTS)
    assert accident_reports(df).count() == 0


def test_avgspd_fires_per_transition(spark):
    # ADVICE r1: the reference dataflow fires once per 52->56 update
    # transition, each fire reading the RUNNING reduce state — not once per
    # (vid, xway).  Car 11 traverses twice; the second fire sees the updated
    # running max-pos-52 / min-pos-56 records.
    rows = [
        (0, 11, 90, 0, 0, 0, 52, 1000),
        (10, 11, 90, 0, 0, 0, 52, 5000),   # b52 = (10, 5000)
        (20, 11, 90, 0, 0, 0, 56, 9000),   # fire 1: dpos=4000 dt=10 -> 894
        (30, 11, 90, 0, 0, 0, 52, 6000),   # b52 -> (30, 6000)
        (40, 11, 90, 0, 0, 0, 56, 8000),   # b56 -> (40, 8000); fire 2:
                                           # dpos=2000 dt=10 -> 447
    ]
    df = spark.createDataFrame(rows, schema=schemas.CAR_REPORTS)
    out = average_speed_fines(df)
    assert rows_set(out) == {
        (10, 20, 11, 0, 0, 894),
        (30, 40, 11, 0, 0, 447),
    }


def test_avgspd_pos_tie_keeps_first_report(spark):
    # The reference reduce replaces state only on STRICT pos inequality, so
    # the first report wins a pos tie — time1 is the earlier timestamp.
    rows = [
        (0, 12, 90, 0, 0, 0, 52, 5000),
        (5, 12, 90, 0, 0, 0, 52, 5000),   # tie: state keeps (0, 5000)
        (10, 12, 90, 0, 0, 0, 56, 9000),  # dpos=4000 dt=10 -> 894
    ]
    df = spark.createDataFrame(rows, schema=schemas.CAR_REPORTS)
    assert rows_set(average_speed_fines(df)) == {(0, 10, 12, 0, 0, 894)}


def test_avgspd_no_fire_without_transition(spark):
    # 56-only history (or 56 before any 52) never fires.
    rows = [
        (0, 13, 90, 0, 0, 0, 56, 9000),
        (10, 13, 90, 0, 0, 0, 56, 9100),
    ]
    df = spark.createDataFrame(rows, schema=schemas.CAR_REPORTS)
    assert average_speed_fines(df).count() == 0
