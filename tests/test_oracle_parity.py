"""Spark-vs-DuckDB oracle parity for every registered query (the driver's t2
gate, replicated locally at sf0.001 for speed; the driver runs sf0.01)."""

from __future__ import annotations

import os

import pytest

from cloudcomputing_flink_application_spark.registry import REGISTRY
from tests.conftest import TESTDATA
from tests.oracle_harness import compare_query, duck_connection

SF_DIR = f"{TESTDATA}/sf0.001"
SF_DIR_MID = f"{TESTDATA}/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity_sf0001(spark, con, name):
    q = REGISTRY[name]
    if q.oracle is None:
        df = q.fn(spark, SF_DIR)
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    res = compare_query(spark, con, name, q.fn, q.oracle, SF_DIR)
    assert res.ok, f"{name}: {res.spark_rows} vs {res.oracle_rows} | {res.detail}"
    assert res.spark_rows > 0, f"{name}: degenerate (empty) result proves nothing"


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SKIP_SF001") == "1", reason="sf0.01 disabled"
)
@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity_sf001(spark, name):
    q = REGISTRY[name]
    if q.oracle is None:
        pytest.skip("rows-only query")
    con = duck_connection(SF_DIR_MID)
    try:
        res = compare_query(spark, con, name, q.fn, q.oracle, SF_DIR_MID)
        assert res.ok, f"{name}: {res.spark_rows} vs {res.oracle_rows} | {res.detail}"
    finally:
        con.close()
