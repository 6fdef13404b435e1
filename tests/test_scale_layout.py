"""Storage-layout scale proofs: the two layout levers SCALING.md leans on —
bucketed co-located joins and partition pruning — demonstrated on real
testdata with the resulting physical plans pinned."""

from __future__ import annotations

import pytest

from cloudcomputing_flink_application_spark.plans.inspect import physical_plan
from cloudcomputing_flink_application_spark.sources.sinks import (
    write_bucketed,
    write_parquet,
)
from tests.conftest import TESTDATA

SF = f"{TESTDATA}/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_zero_exchange(spark, tmp_path, no_broadcast):
    # Both sides hash-bucketed by the join key with equal bucket counts:
    # the join must be exchange-free — the shuffle was paid at write time.
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_path}/bktdb'")
    try:
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
        write_bucketed(orders, "bktdb.orders_b", ["o_orderkey"], 4,
                       sort_cols=["o_orderkey"])
        write_bucketed(lineitem, "bktdb.lineitem_b", ["l_orderkey"], 4,
                       sort_cols=["l_orderkey"])
        joined = spark.table("bktdb.lineitem_b").join(
            spark.table("bktdb.orders_b"),
            spark.table("bktdb.lineitem_b").l_orderkey
            == spark.table("bktdb.orders_b").o_orderkey,
        )
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        # and it still computes the same join as the unbucketed plan
        expected = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS bktdb.orders_b")
        spark.sql("DROP TABLE IF EXISTS bktdb.lineitem_b")
        spark.sql("DROP DATABASE IF EXISTS bktdb")


def test_partitioned_write_prunes_at_scan(spark, tmp_path):
    # Directory-partitioned parquet + a partition-column predicate must
    # prune at planning time (PartitionFilters), not filter after the scan.
    events = spark.read.parquet(f"{SF}/events.parquet")
    out = str(tmp_path / "events_by_type")
    write_parquet(events, out, partition_by=["event_type"])
    got = spark.read.parquet(out).filter("event_type = 'click'")
    plan = physical_plan(got)
    [scan_line] = [
        l for l in plan.split("\n") if "FileScan" in l and "PartitionFilters" in l
    ]
    assert "event_type" in scan_line.split("PartitionFilters:")[1].split("]")[0]
    # Pruning is observable in the executed scan's driver-side metrics: the
    # FileSourceScanExec's "numPartitions" is the number of partition
    # directories that survived planning.  (DataFrame.inputFiles() is NOT
    # pruning-aware — it lists the unfiltered base relation — so it must not
    # be used here.)
    n_dirs = len(
        [p for p in (tmp_path / "events_by_type").iterdir()
         if p.name.startswith("event_type=")]
    )
    assert n_dirs > 1, "fixture must write multiple partition directories"
    got.collect()
    leaves = got._jdf.queryExecution().executedPlan().collectLeaves()
    scans = [
        leaves.apply(i)
        for i in range(leaves.size())
        if leaves.apply(i).getClass().getSimpleName() == "FileSourceScanExec"
    ]
    assert scans, "expected a FileSourceScanExec leaf in the executed plan"
    assert scans[0].metrics().apply("numPartitions").value() == 1
    assert got.count() == events.filter("event_type = 'click'").count()


def test_training_shards_deterministic_and_complete(spark, tmp_path):
    # Shard membership is a pure function of the key: identical across
    # writes and input layouts; every row lands in exactly one shard;
    # hash uniformity keeps shards balanced.
    from cloudcomputing_flink_application_spark.sources.sinks import (
        write_training_shards,
    )
    from tests.conftest import TESTDATA

    docs = spark.read.parquet(f"{TESTDATA}/sf0.001/documents.parquet")
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_training_shards(docs, p1, 8)
    write_training_shards(docs.repartition(7), p2, 8)  # different layout
    a = {(r.doc_id, r.shard) for r in
         spark.read.parquet(p1).select("doc_id", "shard").collect()}
    b = {(r.doc_id, r.shard) for r in
         spark.read.parquet(p2).select("doc_id", "shard").collect()}
    assert a == b                                  # layout-independent
    assert len(a) == docs.count()                  # complete, no dupes
    sizes = [c for _, c in
             spark.read.parquet(p1).groupBy("shard").count().collect()]
    assert len(sizes) == 8
    assert max(sizes) < 3 * min(sizes)             # hash balance at n=500
    import pytest

    with pytest.raises(ValueError, match="n_shards"):
        write_training_shards(docs, str(tmp_path / "bad"), 0)


def test_training_shards_rejects_null_keys_and_collision(spark, tmp_path):
    from cloudcomputing_flink_application_spark.sources.sinks import (
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(1, "a"), (None, "b")], "doc_id LONG, text STRING"
    )
    with pytest.raises(Exception, match="NULL doc_id"):
        write_training_shards(docs, str(tmp_path / "s"), 4)
    with pytest.raises(ValueError, match="shard"):
        write_training_shards(
            docs.withColumn("shard", docs.doc_id), str(tmp_path / "s2"), 4
        )
