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
