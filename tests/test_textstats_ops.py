"""Hand-computed fixtures for the corpus-level text operators."""

from __future__ import annotations

from cloudcomputing_flink_application_spark.operators.textstats import (
    length_histogram,
    top_terms,
)
from tests.conftest import rows_set


def test_top_terms_tf_df_ranking(spark):
    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry")], ["doc_id", "text"]
    )
    out = top_terms(docs)
    assert out.columns == ["doc_id", "token", "tf", "df", "score", "rank"]
    assert rows_set(out) == {
        (1, "apple", 2, 1, 2.0, 1),
        (1, "banana", 1, 2, 0.5, 2),
        (2, "cherry", 1, 1, 1.0, 1),
        (2, "banana", 1, 2, 0.5, 2),
    }


def test_length_histogram_null_text_is_bucket_one(spark):
    # A NULL text row must count as zero tokens (bucket 1 = bin-digit count
    # of 0), not the size(NULL) = -1 artifact that conv() would turn into a
    # 64-char two's-complement bucket with total_tokens decremented.
    docs = spark.createDataFrame(
        [(1, "en", None), (2, "en", "one two three")],
        "doc_id: long, lang: string, text: string",
    )
    out = length_histogram(docs)
    assert rows_set(out) == {("en", 1, 1, 0), ("en", 2, 1, 3)}


def test_top_terms_k_limits_and_tiebreak(spark):
    # four tokens with equal score -> alphabetical tiebreak, k cuts at 2
    docs = spark.createDataFrame([(1, "d c b a")], ["doc_id", "text"])
    out = top_terms(docs, k=2)
    assert rows_set(out) == {
        (1, "a", 1, 1, 1.0, 1),
        (1, "b", 1, 1, 1.0, 2),
    }


def test_oov_stats_vocab_boundary_tiebreak(spark):
    # k=2 vocab over counts {aa:3, bb:2, cc:2, dd:1}: the bb/cc tie at the
    # boundary breaks by token string (bb in, cc out), and NULL/empty docs
    # survive with zeros.
    from cloudcomputing_flink_application_spark.operators.textstats import (
        oov_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "aa aa bb cc"),
            (2, "aa bb cc dd"),
            (3, None),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    got = rows_set(oov_stats(docs, k=2))
    assert got == {
        (1, 4, 1, 0.25),  # cc is OOV
        (2, 4, 2, 0.5),   # cc, dd are OOV
        (3, 0, 0, 0.0),
        (4, 0, 0, 0.0),
    }
