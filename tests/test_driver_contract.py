"""Driver-contract guard: entry()/queries() must work on a VANILLA
SparkSession (the driver builds its own, without this engine's configs).
Runs in a subprocess because getOrCreate() in-process would reuse the
configured test session."""

from __future__ import annotations

import subprocess
import sys

import pytest

SCRIPT = """
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[4]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
assert e.entry(spark).count() > 0
qs, oq = e.queries(), e.oracle_sql()
assert set(oq) <= set(qs), "oracle keys must be a subset of query keys"
# touch a representative query per input table family
for name in ("q_cong", "dedup_exact", "ann_topk", "ts_rollup"):
    assert qs[name](spark, "/root/testdata/sf0.001").count() >= 0, name
print("CONTRACT_OK", len(qs), len(oq))
"""


@pytest.mark.slow
def test_contract_on_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "CONTRACT_OK" in proc.stdout
