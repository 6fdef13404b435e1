"""ANN index lifecycle (r7): persisted IVF artifact, streaming assignment
twin, drift staleness metric, and compliance deletion from the index.

The scale story under test: a 100 TB similarity deployment appends vectors
continuously — the codebook is a versioned build artifact, arriving vectors
are assigned incrementally (never a rebuild per arrival), the drift metric
prices WHEN to rebuild, and per-vector index rows are deletable under the
same lock/swap contract as the dedup stores.
"""

from __future__ import annotations

import os

import pytest

from cloudcomputing_flink_application_spark import schemas
from cloudcomputing_flink_application_spark.operators import similarity
from cloudcomputing_flink_application_spark.streaming import jobs
from tests.conftest import TESTDATA, rows_set

SF_DIR = f"{TESTDATA}/sf0.001"
EMB_SCHEMA = schemas.EMBEDDINGS


def _write_emb_batch(spark, d_in, idx, df, base=1_700_000_000):
    p = f"{d_in}/f{idx}"
    df.coalesce(1).write.parquet(p)
    for root, _, files in os.walk(p):
        for f in files:
            os.utime(f"{root}/{f}", (base + idx, base + idx))


def _start_assign_stream(spark, d_in, index_root, chk):
    stream = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d_in}/*")
    )
    return jobs.run_ivf_assign_stream(spark, stream, chk, index_root)


@pytest.fixture()
def built_index(spark, tmp_path):
    """Index built on the first 2/3 of the embeddings; the last third is
    the arriving stream."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    cut = (n * 2) // 3
    build = emb.filter(f"vec_id <= {cut}")
    arrive = emb.filter(f"vec_id > {cut}")
    root = str(tmp_path / "ivf")
    similarity.build_ivf_index(build, root)
    return root, build, arrive, cut


def test_stream_assignments_equal_batch_over_union(spark, tmp_path, built_index):
    # Accumulated store (build batch 0 + stream batches) == the batch
    # assignment over the full corpus under the same codebook — including
    # a replay-safe two-file split of the arriving vectors.
    root, build, arrive, cut = built_index
    d_in = str(tmp_path / "in")
    half = arrive.count() // 2
    ids = sorted(r.vec_id for r in arrive.select("vec_id").collect())
    split = ids[half]
    _write_emb_batch(spark, d_in, 0, arrive.filter(f"vec_id < {split}"))
    _write_emb_batch(spark, d_in, 1, arrive.filter(f"vec_id >= {split}"))
    q = _start_assign_stream(spark, d_in, root, str(tmp_path / "chk"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    cb = similarity.read_codebook(spark, root)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    expected = rows_set(
        similarity.assignment_rows(emb, cb).select("vec_id", "cluster", "ccos_q")
    )
    got = rows_set(
        spark.read.parquet(f"{root}/assignments").select(
            "vec_id", "cluster", "ccos_q"
        )
    )
    assert got == expected
    # the store carries build partition 0 plus one partition per batch
    parts = {
        r.batch_id
        for r in spark.read.parquet(f"{root}/assignments")
        .select("batch_id").distinct().collect()
    }
    assert parts == {0, 1, 2}


def test_drift_reads_one_for_in_distribution_batches(spark, tmp_path):
    # Batches drawn from the BUILD corpus itself must read drift == 1.0
    # exactly (same vectors, same exact-integer statistics), regardless of
    # how the arrivals are split into batches — the order/composition
    # invariance that makes the metric a distribution instrument, not a
    # batching artifact.
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    root = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, root)
    d_in = str(tmp_path / "in")
    _write_emb_batch(spark, d_in, 0, emb.filter("vec_id % 3 = 0"))
    _write_emb_batch(spark, d_in, 1, emb.filter("vec_id % 3 != 0"))
    q = _start_assign_stream(spark, d_in, root, str(tmp_path / "chk"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rep = {r.batch_id: r for r in similarity.drift_report(spark, root).collect()}
    # whole-corpus replay == reference -> the combined mean is exactly the
    # reference mean; per-batch means bracket it tightly
    n = sum(r.n_vecs for r in rep.values())
    mean = sum(r.mean_ccos * r.n_vecs for r in rep.values()) / n
    ref_mean = [
        (r.sum_ccos_q / r.n_vecs) / similarity.DRIFT_SCALE
        for r in spark.read.parquet(f"{root}/ref_stats").collect()
    ][0]
    assert abs(mean - ref_mean) < 1e-12
    for r in rep.values():
        assert 0.5 < r.drift < 2.0  # same distribution: no collapse


def test_drift_drops_for_out_of_distribution_batch(spark, tmp_path):
    # Drift is a FIT instrument, so the probe needs a codebook that
    # genuinely fits its build corpus: on the clustered mixture fixture
    # (intra-cluster cosine ~0.86 — the production regime) the build
    # reference reads high; a batch of near-uniform random vectors (the
    # driver embeddings — a different distribution) then reads drift
    # well below 1, the rebuild signal.  On the near-uniform corpus no
    # codebook fits anything, and drift correctly stays ~1 for any
    # arrivals — that non-signal is the documented flip side.
    from cloudcomputing_flink_application_spark.fixtures import (
        write_clustered_embeddings,
    )

    cpath = str(tmp_path / "clustered.parquet")
    write_clustered_embeddings(cpath, n=2000)
    emb = spark.read.parquet(cpath)
    root = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, root)
    shifted = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .limit(200)
        .selectExpr("vec_id + 1000000 AS vec_id", "label", "embedding")
    )
    d_in = str(tmp_path / "in")
    _write_emb_batch(spark, d_in, 0, shifted)
    q = _start_assign_stream(spark, d_in, root, str(tmp_path / "chk"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rep = similarity.drift_report(spark, root).collect()
    assert len(rep) == 1
    assert rep[0].drift < 0.7, rep[0]


def test_search_plan_identical_from_persisted_codebook(spark, tmp_path):
    # The persisted codebook must serve searches bit-identically to the
    # in-memory artifact: same top-k rows, so the recall report is
    # unchanged by the round-trip through storage.
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    root = str(tmp_path / "ivf")
    try:
        similarity.build_ivf_index(emb, root)
        cb_mem = similarity.ivf_codebook(emb)
        cb_disk = similarity.read_codebook(spark, root)
        got_mem = rows_set(similarity.cosine_topk_ivf(emb, codebook=cb_mem))
        got_disk = rows_set(similarity.cosine_topk_ivf(emb, codebook=cb_disk))
        assert got_mem == got_disk and len(got_disk) > 0
    finally:
        similarity.release_cached()


def test_forget_vecs_removes_rows_and_fences_stream(spark, tmp_path, built_index):
    root, build, arrive, cut = built_index
    d_in = str(tmp_path / "in")
    _write_emb_batch(spark, d_in, 0, arrive)
    chk = str(tmp_path / "chk")
    q = _start_assign_stream(spark, d_in, root, chk)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    victims = [r.vec_id for r in
               spark.read.parquet(f"{root}/assignments")
               .select("vec_id").limit(3).collect()]
    jobs.forget_vecs(spark, root, victims, chk)
    asg = spark.read.parquet(f"{root}/assignments")
    assert asg.filter(asg.vec_id.isin(victims)).count() == 0
    assert asg.count() > 0
    assert not os.path.exists(f"{root}/assignments.forget_lock")
    # a lock fences the stream exactly like the dedup stores
    with open(f"{root}/assignments.forget_lock", "w"):
        pass
    _write_emb_batch(spark, d_in, 1, build.limit(5))
    q = _start_assign_stream(spark, d_in, root, chk)
    with pytest.raises(Exception, match="forget-lock"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()


def test_forget_vecs_refuses_uncommitted_checkpoint(spark, tmp_path, built_index):
    root, build, arrive, cut = built_index
    d_in = str(tmp_path / "in")
    _write_emb_batch(spark, d_in, 0, arrive)
    chk = str(tmp_path / "chk")
    q = _start_assign_stream(spark, d_in, root, chk)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    os.rename(f"{chk}/commits/0", str(tmp_path / "c0"))
    with pytest.raises(RuntimeError, match="uncommitted micro-batch"):
        jobs.forget_vecs(spark, root, [1], chk)
    assert not os.path.exists(f"{root}/assignments.forget_lock")
    os.rename(str(tmp_path / "c0"), f"{chk}/commits/0")


def test_rebuild_drops_stale_stream_state_and_rebaselines(spark, tmp_path, built_index):
    # r7 review catch (reproduced): rebuilding over an existing root used
    # dynamic partition overwrite, so stream partitions assigned under the
    # OLD codebook survived and ref_stats aggregated them — every later
    # drift reading divided against a contaminated baseline.  A rebuild
    # must leave exactly the build corpus's batch-0 rows, a clean drift
    # store, and ref_stats == the build corpus statistics.
    root, build, arrive, cut = built_index
    d_in = str(tmp_path / "in")
    _write_emb_batch(spark, d_in, 0, arrive)
    chk = str(tmp_path / "chk")
    q = _start_assign_stream(spark, d_in, root, chk)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(f"{root}/drift").count() == 1

    # rebuild over the full corpus (the drift-triggered flow)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    similarity.build_ivf_index(emb, root, checkpoint_dir=chk)
    asg = spark.read.parquet(f"{root}/assignments")
    parts = {r.batch_id for r in asg.select("batch_id").distinct().collect()}
    assert parts == {0}
    n = emb.count()
    ref = spark.read.parquet(f"{root}/ref_stats").collect()[0]
    assert ref.n_vecs == n
    import glob

    assert not glob.glob(f"{root}/drift/batch_id=*/part-*")
    assert not os.path.exists(f"{root}/assignments.forget_lock")

    # rebuild refuses while the stream checkpoint holds an uncommitted
    # batch (the same replay hazard forget_docs refuses under)
    os.rename(f"{chk}/commits/0", str(tmp_path / "c0"))
    with pytest.raises(RuntimeError, match="uncommitted micro-batch"):
        similarity.build_ivf_index(emb, root, checkpoint_dir=chk)
    assert not os.path.exists(f"{root}/assignments.forget_lock")
    os.rename(str(tmp_path / "c0"), f"{chk}/commits/0")


def test_drift_report_empty_on_fresh_index(spark, tmp_path):
    # A just-built index has no drift store; --report must read as an
    # empty frame, not a path error.
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(100)
    root = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, root)
    rep = similarity.drift_report(spark, root)
    assert rep.count() == 0
    assert [f.name for f in rep.schema.fields] == [
        "batch_id", "n_vecs", "mean_ccos", "drift",
    ]


def test_build_failure_before_mutation_releases_lock(spark, tmp_path):
    # ADVICE r7 low: a build that fails BEFORE touching the artifact must
    # not leave the forget-lock (nothing to heal; the assign stream may
    # keep running against the old index).
    root = str(tmp_path / "ivf")
    bad = spark.range(5).toDF("not_embeddings")  # analysis fails pre-write
    with pytest.raises(Exception):
        similarity.build_ivf_index(bad, root)
    assert not os.path.exists(f"{root}/assignments.forget_lock")


def test_build_failure_keeps_preexisting_lock(spark, tmp_path):
    # A lock left by a CRASHED prior build/forget must survive an early
    # build failure — releasing someone else's lock would unfence the
    # stream against a half-rewritten store.
    root = str(tmp_path / "ivf")
    os.makedirs(root, exist_ok=True)
    with open(f"{root}/assignments.forget_lock", "w"):
        pass
    bad = spark.range(5).toDF("not_embeddings")
    with pytest.raises(Exception):
        similarity.build_ivf_index(bad, root)
    assert os.path.exists(f"{root}/assignments.forget_lock")


def test_drift_horizon_bounds_the_drift_store(spark, tmp_path):
    """--drift-horizon ages the drift store to the trailing N readings
    (the last per-batch-growth term in the index root): partitions
    beyond the window drop, the surviving readings are bit-identical to
    the unbounded run's trailing window, assignments are untouched, and
    the drift report still serves the rebuild rule's newest-K reads."""
    import pytest

    from cloudcomputing_flink_application_spark import schemas
    from cloudcomputing_flink_application_spark.operators import similarity
    from cloudcomputing_flink_application_spark.streaming import jobs
    from tests.conftest import TESTDATA

    emb = spark.read.parquet(f"{TESTDATA}/sf0.001/embeddings.parquet")
    root = str(tmp_path / "idx")
    d_in = str(tmp_path / "in")
    chk = str(tmp_path / "chk")
    similarity.build_ivf_index(emb.filter("vec_id < 200"), root)
    # four stream batches; horizon 2 keeps only the newest two readings
    for k, (lo, hi) in enumerate(((200, 275), (275, 350), (350, 425), (425, 500))):
        emb.filter(f"vec_id >= {lo} and vec_id < {hi}").write.parquet(
            f"{d_in}/b{k}.parquet"
        )
        q = jobs.run_ivf_assign_stream(
            spark,
            spark.readStream.schema(schemas.EMBEDDINGS).parquet(f"{d_in}/*"),
            chk,
            root,
            drift_horizon=2,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    drift_parts = sorted(
        int(r.batch_id)
        for r in spark.read.parquet(f"{root}/drift")
        .select("batch_id").distinct().collect()
    )
    assert drift_parts == [3, 4]  # trailing 2 of stream partitions 1..4
    # assignments keep every batch (the horizon touches only drift)
    asg_parts = sorted(
        int(r.batch_id)
        for r in spark.read.parquet(f"{root}/assignments")
        .select("batch_id").distinct().collect()
    )
    assert asg_parts == [0, 1, 2, 3, 4]
    assert spark.read.parquet(f"{root}/assignments").count() == emb.count()
    # the report serves the newest-K rule over the surviving window
    report = similarity.drift_report(spark, root)
    assert report.count() == 2
    assert {int(r.batch_id) for r in report.collect()} == {3, 4}
    # a meaningless horizon fails fast
    with pytest.raises(ValueError, match="horizon_batches"):
        jobs.run_ivf_assign_stream(
            spark,
            spark.readStream.schema(schemas.EMBEDDINGS).parquet(f"{d_in}/*"),
            chk,
            root,
            drift_horizon=0,
        )
