"""Empty-input robustness: every registry query must execute (0 rows, no
exception) against structurally-identical but empty tables.  Catches
empty-array literals, windows over empty partitions, and aggregate
edge cases that only surface on degenerate inputs."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cloudcomputing_flink_application_spark.registry import REGISTRY
from cloudcomputing_flink_application_spark.schemas import DRIVER_TABLES
from tests.conftest import TESTDATA


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf_empty")
    for name in DRIVER_TABLES:
        schema = pq.read_schema(f"{TESTDATA}/sf0.001/{name}.parquet")
        pq.write_table(schema.empty_table(), f"{d}/{name}.parquet")
    return str(d)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_survives_empty_input(spark, empty_sf_dir, name):
    out = REGISTRY[name].fn(spark, empty_sf_dir)
    assert out.count() == 0, name
