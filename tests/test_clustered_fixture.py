"""The hash-seeded clustered-embedding mixture (``pkg/fixtures.py``) and
the IVF behavior it exists to demonstrate.

The driver's embeddings are near-uniform — the regime where IVF pruning
cannot beat a flat scan without giving up recall (measured, SCALING.md).
These tests pin (1) the fixture's determinism and cluster geometry and
(2) that on clustered data the DEFAULT IVF config reaches recall >= 0.9
while scanning a small fraction of the corpus — the claim the scaling
bench then prices in wall-clock at 4x/10x.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cloudcomputing_flink_application_spark import fixtures
from cloudcomputing_flink_application_spark.operators import similarity


def _cos(u, v):
    d = sum(x * y for x, y in zip(u, v))
    return d / math.sqrt(sum(x * x for x in u) * sum(y * y for y in v))


def test_clustered_rows_deterministic_and_separated():
    a = fixtures.clustered_embedding_rows(200)
    b = fixtures.clustered_embedding_rows(200)
    assert a == b  # hash-seeded: no RNG state anywhere
    # geometry: intra-cluster cosines are high, inter-cluster near zero
    by_label: dict[int, list] = {}
    for _, lab, emb in a:
        by_label.setdefault(lab, []).append(emb)
    intra = [
        _cos(v[0], v[1]) for v in by_label.values() if len(v) >= 2
    ]
    labs = sorted(by_label)
    inter = [
        _cos(by_label[labs[i]][0], by_label[labs[i + 1]][0])
        for i in range(len(labs) - 1)
    ]
    assert sum(intra) / len(intra) > 0.75
    assert abs(sum(inter) / len(inter)) < 0.2


def test_clustered_replica_offset_shares_geometry():
    base = fixtures.clustered_embedding_rows(100)
    rep = fixtures.clustered_embedding_rows(100, id_offset=1000)
    # same mixture component sequence, fresh noise: high cosine to the
    # base row of the same index, but not identical vectors
    cosines = [_cos(b[2], r[2]) for b, r in zip(base, rep)]
    assert all(c > 0.6 for c in cosines)
    assert all(b[2] != r[2] for b, r in zip(base, rep))


@pytest.fixture(scope="module")
def clustered_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("clustered") / "embeddings.parquet"
    fixtures.write_clustered_embeddings(str(p), 2000)
    return str(p)


def test_ivf_recall_high_on_clustered_corpus(spark, clustered_path):
    emb = spark.read.parquet(clustered_path)
    try:
        rep = similarity.ivf_recall_report(emb)
        mean = rep.agg(F.avg("recall")).first()[0]
        # defaults probe nprobe=40 of 50x5=250 cells (~16% of the corpus):
        # on clustered data that small scan keeps recall high — the
        # uniform driver table needs ~80% scanned for the same recall
        assert mean >= 0.9
    finally:
        similarity.release_cached()


def test_ivf_assignment_aligns_with_mixture_on_clustered(spark, clustered_path):
    # the coarse level of the two-level codebook is the label; on
    # clustered data nearly every vector's nearest cell is in its OWN
    # mixture component, which is why probing few cells suffices
    emb = spark.read.parquet(clustered_path)
    try:
        base = similarity._normed(emb)
        cb = similarity.ivf_codebook(emb)
        asg = similarity._assign_to_centroids(base, cb)
        frac_own = (
            asg.join(base.select("vec_id", "label"), "vec_id")
            .select(
                (F.floor(F.col("cluster") / 1000) == F.col("label"))
                .cast("int")
                .alias("own")
            )
            .agg(F.avg("own"))
            .first()[0]
        )
        assert frac_own > 0.95
    finally:
        similarity.release_cached()
