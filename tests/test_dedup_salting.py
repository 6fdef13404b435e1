"""Salted block-join must be pair-for-pair identical to the unsalted join."""

from __future__ import annotations

from cloudcomputing_flink_application_spark.operators.dedup import ngram_jaccard_dedup
from tests.conftest import rows_set


def test_salted_join_identical_results(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plain = ngram_jaccard_dedup(docs, salt=1)
    salted = ngram_jaccard_dedup(docs, salt=4)
    assert rows_set(plain) == rows_set(salted)
    assert plain.count() > 0
