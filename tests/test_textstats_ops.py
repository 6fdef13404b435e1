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


# --- r11 corpus profile: sketch twin calibrated against the exact twin ------


def test_corpus_profile_sketch_within_bounds(spark):
    """The sketch profile's contract: exact columns identical, HLL distinct
    estimates within 3 sigma (3 * PROFILE_HLL_RSD), and — r12 (VERDICT
    r11 #4) — quantiles BIT-EQUAL to the exact twin's integer rank rule
    (the histogram form replaced percentile_approx, whose GK merges were
    merge-order-unstable) — at BOTH small SFs, per source."""
    from cloudcomputing_flink_application_spark.operators import textstats as T

    for sf in ("0.001", "0.01"):
        docs = spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet")
        exact = {r["source"]: r.asDict() for r in T.corpus_profile_exact(docs).collect()}
        est = {r["source"]: r.asDict() for r in T.corpus_profile(docs).collect()}
        assert set(exact) == set(est)
        for s in exact:
            ex, es = exact[s], est[s]
            assert es["n_docs"] == ex["n_docs"]
            assert es["total_tokens"] == ex["total_tokens"]
            for col in ("distinct_texts", "distinct_tokens"):
                rel = abs(es[f"{col}_est"] - ex[col]) / max(ex[col], 1)
                assert rel <= 3 * T.PROFILE_HLL_RSD, (sf, s, col, rel)
            for p in T.PROFILE_PCTS:
                assert es[f"len_p{p}"] == ex[f"len_p{p}"], (sf, s, p)


def test_corpus_profile_exact_rank_semantics(spark):
    """Pin the rank arithmetic on a frame where every quantile is hand
    computable: 4 docs in one source with lengths 1,2,3,4 -> p50 = rank
    ceil(4*50/100)=2 -> 2; p90 -> rank 4 -> 4; p99 -> rank 4 -> 4."""
    from cloudcomputing_flink_application_spark.operators import textstats as T

    docs = spark.createDataFrame(
        [
            (1, "a", "s"),
            (2, "ab", "s"),
            (3, "abc", "s"),
            (4, "abcd", "s"),
        ],
        ["doc_id", "text", "source"],
    )
    row = T.corpus_profile_exact(docs).collect()[0].asDict()
    assert row == {
        "source": "s",
        "n_docs": 4,
        "total_tokens": 4,
        "distinct_texts": 4,
        "distinct_tokens": 4,
        "len_p50": 2,
        "len_p90": 4,
        "len_p99": 4,
    }


def test_corpus_profile_null_text_counts_as_empty(spark):
    from cloudcomputing_flink_application_spark.operators import textstats as T

    docs = spark.createDataFrame(
        [(1, None, "s"), (2, "", "s"), (3, "x", "s")],
        ["doc_id", "text", "source"],
    )
    row = T.corpus_profile_exact(docs).collect()[0].asDict()
    # NULL and '' hash identically (coalesce), so 2 distinct texts; the
    # NULL doc contributes len 0 at rank 1
    assert row["distinct_texts"] == 2
    assert row["len_p50"] == 0 and row["len_p99"] == 1
    assert row["total_tokens"] == 1


def test_corpus_profile_hll_union_equals_direct_and_deterministic(spark):
    """The property the streaming twin's store design rests on:
    DataSketches HLL union-of-parts == single-pass estimate (register
    max is associative/commutative), and the estimates are layout-
    independent (same values under any repartition)."""
    from pyspark.sql import functions as F

    from cloudcomputing_flink_application_spark.operators import textstats as T

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    base = docs.select(
        "source", F.md5(F.coalesce("text", F.lit(""))).alias("th")
    )
    direct = {
        r["source"]: r["e"]
        for r in base.groupBy("source")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("th")).alias("e"))
        .collect()
    }
    per_part = base.withColumn("part", F.pmod(F.crc32("th"), F.lit(5))).groupBy(
        "source", "part"
    ).agg(F.hll_sketch_agg("th").alias("sk"))
    merged = {
        r["source"]: r["e"]
        for r in per_part.groupBy("source")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()
    }
    assert direct == merged
    # layout independence of the profile's est columns
    a = {
        r["source"]: (
            r["distinct_texts_est"], r["distinct_tokens_est"], r["len_p50"],
            r["len_p90"], r["len_p99"],
        )
        for r in T.corpus_profile(docs).collect()
    }
    b = {
        r["source"]: (
            r["distinct_texts_est"], r["distinct_tokens_est"], r["len_p50"],
            r["len_p90"], r["len_p99"],
        )
        for r in T.corpus_profile(docs.repartition(7)).collect()
    }
    assert a == b


def test_corpus_profile_keeps_all_empty_token_sources(spark):
    """A source whose every doc tokenizes empty (whitespace-only text)
    must appear in BOTH profile twins with 0 distinct tokens — an inner
    token join silently dropped it while the streaming twin emitted it
    (r11 review).  Engine parity pinned against an inline DuckDB view."""
    import duckdb

    from cloudcomputing_flink_application_spark.operators import textstats as T
    from tests.oracle_harness import canon_frame

    docs = spark.createDataFrame(
        [
            (1, "   ", "en", "empty_src", 3),
            (2, None, "en", "empty_src", 0),
            (3, "a b c", "en", "full_src", 5),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    ex = {r["source"]: r.asDict() for r in T.corpus_profile_exact(docs).collect()}
    assert set(ex) == {"empty_src", "full_src"}
    assert ex["empty_src"]["distinct_tokens"] == 0
    assert ex["empty_src"]["total_tokens"] == 0
    assert ex["empty_src"]["n_docs"] == 2
    sk = {r["source"]: r.asDict() for r in T.corpus_profile(docs).collect()}
    assert set(sk) == {"empty_src", "full_src"}
    assert sk["empty_src"]["distinct_tokens_est"] == 0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, '   ', 'en', 'empty_src', 3), "
        "(2, NULL, 'en', 'empty_src', 0), "
        "(3, 'a b c', 'en', 'full_src', 5)"
        ") t(doc_id, text, lang, source, n_chars)"
    )
    oracle = con.execute(T.CORPUS_PROFILE_EXACT_SQL).df()
    assert canon_frame(T.corpus_profile_exact(docs).toPandas()) == canon_frame(
        oracle
    )


def test_corpus_profile_keeps_null_source_group(spark):
    """r12: a NULL source is a group like any other — groupBy keeps it,
    so the profile stitches must too (null-safe joins; an equi-join
    silently dropped the row, and the sketch twin additionally read its
    distinct_tokens as 0 through the missed left join).  Both twins, and
    engine parity for the exact twin against an inline DuckDB view."""
    import duckdb

    from cloudcomputing_flink_application_spark.operators import textstats as T
    from tests.oracle_harness import canon_frame

    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", None, 5),
            (2, "a b", "en", None, 3),
            (3, "x y", "en", "s1", 3),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    ex = {r["source"]: r.asDict() for r in T.corpus_profile_exact(docs).collect()}
    assert set(ex) == {None, "s1"}
    assert ex[None]["n_docs"] == 2
    assert ex[None]["distinct_tokens"] == 3  # a, b, c — the REAL count
    assert ex[None]["len_p50"] == 3  # lens 3,5 -> rank ceil(2*50/100)=1
    sk = {r["source"]: r.asDict() for r in T.corpus_profile(docs).collect()}
    assert set(sk) == {None, "s1"}
    assert sk[None]["n_docs"] == 2
    assert sk[None]["distinct_tokens_est"] == 3
    assert sk[None]["len_p50"] == 3 and sk[None]["len_p99"] == 5

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'a b c', 'en', NULL, 5), "
        "(2, 'a b', 'en', NULL, 3), "
        "(3, 'x y', 'en', 's1', 3)"
        ") t(doc_id, text, lang, source, n_chars)"
    )
    assert canon_frame(T.corpus_profile_exact(docs).toPandas()) == canon_frame(
        con.execute(T.CORPUS_PROFILE_EXACT_SQL).df()
    )
