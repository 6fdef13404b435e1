"""Cross-engine primitive equivalences that the oracle gate depends on.

Each test pins one Spark<->DuckDB identity documented in functions.text;
if any of these break (engine upgrade, locale change), every dependent
operator's oracle would drift — fail fast here with a precise culprit.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cloudcomputing_flink_application_spark.functions import text as X


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def test_h56_parity(spark, con):
    samples = ["hello", "", "a b c", "über", "123", "the fast key"]
    got = (
        spark.createDataFrame([(s,) for s in samples], ["s"])
        .select("s", X.h56(F.col("s")).alias("h"))
        .collect()
    )
    for row in got:
        (dh,) = con.execute("SELECT " + X.h56_sql("?"), [row.s]).fetchone()
        assert row.h == dh, row.s


def test_tokens_parity(spark, con):
    samples = [" a  b ", "", "one", "tab\tsep", "x  y\n z "]
    got = (
        spark.createDataFrame([(s,) for s in samples], ["text"])
        .select("text", X.tokens("text").alias("t"))
        .collect()
    )
    for row in got:
        (dt,) = con.execute(
            "SELECT " + X.tokens_sql("?"), [row.text]
        ).fetchone()
        assert list(row.t) == list(dt), repr(row.text)


def test_shingles_parity(spark, con):
    samples = ["a b c d", "a b", "a b c", ""]
    got = (
        spark.createDataFrame([(s,) for s in samples], ["text"])
        .select("text", X.shingles(X.tokens("text")).alias("sh"))
        .collect()
    )
    sql = f"SELECT {X.shingles_sql('tok')} FROM (SELECT {X.tokens_sql('?')} AS tok)"
    for row in got:
        (ds,) = con.execute(sql, [row.text]).fetchone()
        assert list(row.sh) == list(ds), repr(row.text)


def test_minhash_bounds():
    # permutation arithmetic must stay under 2^62 (no overflow in either
    # engine, no ANSI-mode exception in Spark)
    max_h = X.MINHASH_PRIME - 1
    for a, b in zip(X.MINHASH_A, X.MINHASH_B):
        assert 0 < a < (1 << 29) and 0 <= b < X.MINHASH_PRIME
        assert a * max_h + b < (1 << 62)
    assert X.LSH_BANDS * X.LSH_ROWS == X.NUM_PERM


def test_dot_product_bitwise_parity(spark, con, sf_dir):
    # sequential double fold (Spark) == list_dot_product (DuckDB), bitwise
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = e.selectExpr("vec_id va", "transform(embedding, x -> cast(x as double)) ea")
    b = e.selectExpr("vec_id vb", "transform(embedding, x -> cast(x as double)) eb")
    pairs = a.join(b, (F.col("va") < F.col("vb")) & (F.col("vb") < 20))
    dots = pairs.select(
        "va", "vb",
        F.aggregate(
            F.zip_with("ea", "eb", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("dot"),
    ).collect()
    spark_d = {(r.va, r.vb): r.dot for r in dots}
    duck = con.execute(
        f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] emb
                   FROM read_parquet('{sf_dir}/embeddings.parquet'))
        SELECT a.vec_id, b.vec_id, list_dot_product(a.emb, b.emb)
        FROM e a JOIN e b ON a.vec_id < b.vec_id WHERE b.vec_id < 20
        """
    ).fetchall()
    assert len(duck) == len(spark_d) > 0
    for va, vb, d in duck:
        assert spark_d[(va, vb)] == d  # bitwise equality, no tolerance


def test_pii_scrub_class_boundaries(spark, con):
    # r14 (VERDICT r13 #4): every documented class boundary, pinned on
    # BOTH engines — expected values are hand-derived, so this is a
    # golden test, not just a parity test.
    #           text                                              email ip ph num  scrubbed
    cases = [
        # email swallows its digits; ip beats phone on dotted quads
        ("contact john.doe+spam@mail.example.co.uk or 192.168.1.100",
         1, 1, 0, 0, "contact <email> or <ip>"),
        # +country, space-separated, and parenthesized area codes
        ("call +1 555 867 5309 or (555) 867-5309 ext 42",
         0, 0, 2, 1, "call <phone> or <phone> ext <num>"),
        # ISO dates survive; dashed US dates are phone-shaped (documented)
        ("dates: 2024-01-15 vs 01-15-2024; range 10-20",
         0, 0, 1, 5, "dates: <num>-<num>-<num> vs <phone>; range <num>-<num>"),
        # \b guards: a 4-digit octet is NOT partially scrubbed as ip
        ("ip 1234.5.6.7890 and 1.2.3.4 and v1.2.3",
         0, 1, 0, 7, "ip <num>.<num>.<num>.<num> and <ip> and v<num>.<num>.<num>"),
        # single-letter TLD and two-group runs fall to the digit class
        ("a@b.c 867-5309 plain 123456789012",
         0, 0, 0, 3, "a@b.c <num>-<num> plain <num>"),
        ("+49 30 1234 5678 end", 0, 0, 1, 0, "<phone> end"),
        ("", 0, 0, 0, 0, ""),
        (None, 0, 0, 0, 0, ""),
    ]
    txt = F.coalesce(F.col("s"), F.lit(""))
    counts, scrubbed = X.pii_stages(txt)
    got = (
        spark.createDataFrame([(c[0],) for c in cases], "s string")
        .select(
            "s",
            *[c.alias(f"n_{n}") for n, c in counts],
            scrubbed.alias("scrubbed"),
        )
        .collect()
    )
    for row, (s, ne, ni, np_, nn, out) in zip(got, cases):
        assert (row.n_email, row.n_ipv4, row.n_phone, row.n_num) == (
            ne, ni, np_, nn,
        ), repr(s)
        assert row.scrubbed == out, repr(s)
    # DuckDB twin over the same rows (RE2 vs Java regex — the identity
    # every PII oracle depends on)
    con.execute("CREATE OR REPLACE TEMP TABLE pii_t(i INT, s VARCHAR)")
    for i, c in enumerate(cases):
        con.execute("INSERT INTO pii_t VALUES (?, ?)", [i, c[0]])
    sel = ", ".join(
        X.pii_count_sql("coalesce(s, '')", k) for k in range(4)
    )
    scrub_sql = X.pii_scrubbed_sql("coalesce(s, '')")
    duck = con.execute(
        f"SELECT {sel}, {scrub_sql} FROM pii_t ORDER BY i"
    ).fetchall()
    for drow, (s, ne, ni, np_, nn, out) in zip(duck, cases):
        assert drow == (ne, ni, np_, nn, out), repr(s)
