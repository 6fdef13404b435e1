"""Exact-substring (duplicated-span) dedup: hand-computed edge contracts.

The span family (`pipeline.dup_span_stats` / `pipeline.scrub_dup_spans`) is
the Lee-et-al-style pass: a token window is duplicated when its exact w-gram
occurs at >= 2 positions corpus-wide (cross-doc OR self-repetition), and the
per-doc duplicated-token count is the COVERAGE UNION of those windows.  The
cases below pin the union arithmetic (overlap, adjacency, gaps) at w=3 where
every number is checkable by hand; sf-corpus oracle parity at the default
width lives in test_offregistry_parity.py.
"""

from __future__ import annotations

import duckdb

from cloudcomputing_flink_application_spark.operators import pipeline
from tests.conftest import rows_set
from tests.oracle_harness import canon_frame

DOC_COLS = ["doc_id", "text"]


def _stats(spark, rows, w=3):
    return rows_set(
        pipeline.dup_span_stats(spark.createDataFrame(rows, DOC_COLS), w=w)
    )


def _scrub(spark, rows, w=3):
    return rows_set(
        pipeline.scrub_dup_spans(spark.createDataFrame(rows, DOC_COLS), w=w)
    )


def test_cross_doc_duplicated_span(spark):
    # "a b c" occurs in both docs; each doc has exactly one duplicated
    # window covering 3 tokens.
    rows = [(1, "a b c d e"), (2, "x y a b c")]
    assert _stats(spark, rows) == {
        (1, 5, 3, 1, 3),
        (2, 5, 3, 1, 3),
    }
    assert _scrub(spark, rows) == {
        (1, "d e", 2, 3),
        (2, "x y", 2, 3),
    }


def test_self_repetition_counts_as_duplication(spark):
    # One doc, no cross-doc twin: "a b a" and "b a b" each occur twice
    # WITHIN the doc, so all 4 windows are duplicated and the union covers
    # every token.
    rows = [(1, "a b a b a b")]
    assert _stats(spark, rows) == {(1, 6, 4, 4, 6)}
    assert _scrub(spark, rows) == {(1, "", 0, 6)}


def test_adjacent_windows_merge_exactly(spark):
    # Doc 1's duplicated starts are p=1 ("p q r") and p=4 ("s t u"):
    # intervals [1,3] and [4,6] are adjacent, not overlapping — the union
    # is 6 tokens, and the scrub must remove all of them as one island.
    rows = [(1, "p q r s t u"), (2, "p q r"), (3, "s t u")]
    assert _stats(spark, rows) == {
        (1, 6, 4, 2, 6),
        (2, 3, 1, 1, 3),
        (3, 3, 1, 1, 3),
    }
    assert _scrub(spark, rows) == {
        (1, "", 0, 6),
        (2, "", 0, 3),
        (3, "", 0, 3),
    }


def test_gapped_islands_keep_the_novel_middle(spark):
    # "a b c" is duplicated at doc 1's ends (p=1 and p=7, also in doc 2);
    # the middle "z z z" stretch is novel and must survive the scrub.
    rows = [(1, "a b c z z z a b c"), (2, "a b c")]
    assert _stats(spark, rows) == {
        (1, 9, 7, 2, 6),
        (2, 3, 1, 1, 3),
    }
    assert _scrub(spark, rows) == {
        (1, "z z z", 3, 6),
        (2, "", 0, 3),
    }


def test_overlapping_windows_never_double_count(spark):
    # Both docs share the 4-token run "a b c d": windows [a b c] and
    # [b c d] are both duplicated and OVERLAP on tokens 2-3 — coverage is
    # 4, not 6.
    rows = [(1, "a b c d x"), (2, "y a b c d")]
    assert _stats(spark, rows) == {
        (1, 5, 3, 2, 4),
        (2, 5, 3, 2, 4),
    }
    assert _scrub(spark, rows) == {
        (1, "x", 1, 4),
        (2, "y", 1, 4),
    }


def test_short_null_and_empty_docs_survive_with_zeros(spark):
    rows = [(1, "a b"), (2, None), (3, ""), (4, "  \t ")]
    assert _stats(spark, rows) == {
        (1, 2, 0, 0, 0),
        (2, 0, 0, 0, 0),
        (3, 0, 0, 0, 0),
        (4, 0, 0, 0, 0),
    }
    assert _scrub(spark, rows) == {
        (1, "a b", 2, 0),
        (2, "", 0, 0),
        (3, "", 0, 0),
        (4, "", 0, 0),
    }


def test_span_family_engine_parity_at_w3(spark):
    # The sf-corpus parity test runs at the default width; this pins the
    # parametric-w SQL builders against the same inline corpus the edge
    # cases above use, NULL doc included.
    rows = [
        (1, "a b c z z z a b c"),
        (2, "a b c"),
        (3, None),
        (4, "q r s t q r s"),
    ]
    docs = spark.createDataFrame(rows, DOC_COLS)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'a b c z z z a b c'), (2, 'a b c'), (3, CAST(NULL AS VARCHAR)), "
        "(4, 'q r s t q r s')) t(doc_id, text)"
    )
    for op, sql in [
        (pipeline.dup_span_stats, pipeline.dup_span_stats_sql(3)),
        (pipeline.scrub_dup_spans, pipeline.scrub_dup_spans_sql(3)),
    ]:
        assert canon_frame(op(docs, w=3).toPandas()) == canon_frame(
            con.execute(sql).df()
        )


def test_scrub_conserves_tokens(spark, sf_dir):
    # kept + removed == n_tokens for every document, on the real corpus at
    # the default width.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = pipeline.scrub_dup_spans(docs)
    stats = pipeline.dup_span_stats(docs)
    j = out.join(stats, "doc_id")
    bad = j.filter(
        (out.kept_tokens + out.removed_tokens != stats.n_tokens)
        | (out.removed_tokens != stats.dup_tokens)
    )
    assert bad.count() == 0
    # and the corpus actually exercises the operator: some doc has dups
    assert stats.filter(stats.dup_tokens > 0).count() > 0
