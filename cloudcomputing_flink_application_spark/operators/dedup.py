"""Deduplication operators over the ``documents`` / ``embeddings`` tables.

Capability extension beyond the reference (BASELINE.json ``north_star``):
the dedup family a large-scale training-data pipeline needs, each designed
around a *blocking* strategy so no stage is O(n²) on the full corpus:

- exact:           hash-groupBy on md5(text)                — shuffle by hash
- minhash_lsh:     minhash sig -> band buckets -> verify    — shuffle by band key
- simhash:         simhash -> 8-bit band buckets -> verify  — shuffle by band value
- ngram_jaccard:   char-trigram jaccard within source block — shuffle by source
- embedding_cosine: exact cosine pairs (baseline; the ANN path for scale
  lives in operators.similarity)

All arithmetic is engine-parity-safe (see functions.text): md5-derived
integer hashes, integer band keys, and jaccard/cosine as exact ratios of
per-row sequential folds — every operator here has a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloudcomputing_flink_application_spark.functions import text as X

# thresholds (shared by Spark impls and SQL oracles)
MINHASH_JACCARD = 0.9
SIMHASH_MAX_HAMMING = 1
TRIGRAM_JACCARD = 0.5
COSINE_DUP = 0.4


# --- exact -------------------------------------------------------------------


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact dedup: assign every doc the min doc_id of its text-hash group.

    Output: (doc_id, canonical_id, is_dup).  Scale: one shuffle keyed by
    md5(text) — uniform 128-bit keys, no skew beyond true duplicate mass.
    """
    by_hash = documents.select(
        "doc_id", F.md5(F.col("text")).alias("_h")
    )
    canon = by_hash.groupBy("_h").agg(F.min("doc_id").alias("canonical_id"))
    return (
        by_hash.join(canon, "_h")
        .select(
            "doc_id",
            "canonical_id",
            (F.col("doc_id") != F.col("canonical_id")).alias("is_dup"),
        )
    )


EXACT_DEDUP_SQL = """
WITH by_hash AS (
  SELECT doc_id, md5(text) AS h FROM documents
),
canon AS (
  SELECT h, min(doc_id) AS canonical_id FROM by_hash GROUP BY h
)
SELECT b.doc_id, c.canonical_id, b.doc_id <> c.canonical_id AS is_dup
FROM by_hash b JOIN canon c USING (h)
"""


# --- MinHash + LSH -----------------------------------------------------------


def _token_sets(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id", F.array_distinct(X.tokens("text")).alias("tokset")
    ).filter(F.size("tokset") > 0)


def minhash_lsh_dedup(documents: DataFrame) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact jaccard.

    Pipeline: token sets -> 16-perm MinHash signature (per-row array math,
    fuses into the scan) -> 4 bands of 4 -> self-join per band bucket ->
    exact jaccard >= 0.9 on the candidate set.  Scale: the only joins are
    equi-joins on band keys; bucket sizes bound the pair blowup, and the
    verify join touches candidates only — never all pairs.

    Output: (doc_a, doc_b, jaccard), doc_a < doc_b, de-duplicated across
    bands.
    """
    sigs = _token_sets(documents).select(
        "doc_id", "tokset", *[c for c in X.minhash_sig(F.col("tokset"))]
    )
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("band"), X.band_key(j).alias("key"))
                    for j in range(X.LSH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    cands = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    toks = _token_sets(documents)
    verified = (
        cands.join(toks.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("tokset", "ta"), "doc_a")
        .join(toks.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("tokset", "tb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("ta", "tb")).cast("double")
                / F.size(F.array_union("ta", "tb"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= MINHASH_JACCARD)
    )
    return verified


def _minhash_lsh_sql() -> str:
    mh_exprs = ",\n         ".join(X.minhash_sig_sql("tokset"))
    band_rows = "\n    UNION ALL\n".join(
        f"    SELECT doc_id, {j} AS band, {X.band_key_sql(j)} AS key FROM sigs"
        for j in range(X.LSH_BANDS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, list_distinct({X.tokens_sql('text')}) AS tokset
  FROM documents
),
nonempty AS (SELECT * FROM toks WHERE len(tokset) > 0),
sigs AS (
  SELECT doc_id,
         {mh_exprs}
  FROM nonempty
),
bands AS (
{band_rows}
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       len(list_intersect(ta.tokset, tb.tokset))::DOUBLE
         / len(list_distinct(ta.tokset || tb.tokset)) AS jaccard
FROM cands
JOIN nonempty ta ON ta.doc_id = doc_a
JOIN nonempty tb ON tb.doc_id = doc_b
WHERE len(list_intersect(ta.tokset, tb.tokset))::DOUBLE
        / len(list_distinct(ta.tokset || tb.tokset)) >= {MINHASH_JACCARD}
"""


MINHASH_LSH_SQL = _minhash_lsh_sql()


# --- SimHash -----------------------------------------------------------------


def simhash_dedup(documents: DataFrame) -> DataFrame:
    """Near-dup pairs via SimHash hamming distance with band blocking.

    Candidates share at least one of 4 8-bit bands (pigeonhole: hamming <=
    3 guarantees a shared band; we verify at <= SIMHASH_MAX_HAMMING).
    Output: (doc_a, doc_b, hamming).
    """
    sigs = documents.select(
        "doc_id", X.token_hashes(X.tokens("text")).alias("_th")
    ).select("doc_id", X.simhash_from_hashes(F.col("_th")).alias("sh"))
    bands = sigs.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        X.simhash_band(F.col("sh"), j).alias("key"),
                    )
                    for j in range(X.SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sh", "bk.band", "bk.key")
    pairs = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.sh ^ b.sh)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )
    return pairs


def _simhash_sql() -> str:
    band_rows = "\n    UNION ALL\n".join(
        f"    SELECT doc_id, sh, {j} AS band, {X.simhash_band_sql('sh', j)} AS key FROM sigs"
        for j in range(X.SIMHASH_BANDS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {X.tokens_sql('text')} AS tok FROM documents
),
th AS (
  SELECT doc_id, {X.token_hashes_sql('tok')} AS th FROM toks
),
sigs AS (
  SELECT doc_id, {X.simhash_from_hashes_sql('th')} AS sh FROM th
),
bands AS (
{band_rows}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.sh, b.sh)) AS hamming
FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= {SIMHASH_MAX_HAMMING}
"""


SIMHASH_SQL = _simhash_sql()


# --- character n-gram jaccard ------------------------------------------------


def ngram_jaccard_dedup(documents: DataFrame) -> DataFrame:
    """Near-dup pairs by char-trigram jaccard, blocked by ``source``.

    Character trigrams are order-robust (catch shuffled/re-ordered text);
    the ``source`` column is the blocking key bounding the pair count —
    the standard metadata-blocking pattern for pipeline dedup at scale.
    Output: (doc_a, doc_b, jaccard).
    """
    grams = documents.select(
        "doc_id",
        "source",
        F.array_distinct(
            X.shingles(F.split(F.lower("text"), ""), w=3)
        ).alias("g3"),
    ).filter(F.size("g3") > 0)
    pairs = (
        grams.alias("a")
        .join(
            grams.alias("b"),
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (
                F.size(F.array_intersect("a.g3", "b.g3")).cast("double")
                / F.size(F.array_union("a.g3", "b.g3"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= TRIGRAM_JACCARD)
    )
    return pairs


NGRAM_JACCARD_SQL = f"""
WITH chars AS (
  SELECT doc_id, source, string_split(lower(text), '') AS cs FROM documents
),
grams AS (
  SELECT doc_id, source, list_distinct({X.shingles_sql('cs', w=3)}) AS g3
  FROM chars
),
nonempty AS (SELECT * FROM grams WHERE len(g3) > 0)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       len(list_intersect(a.g3, b.g3))::DOUBLE / len(list_distinct(a.g3 || b.g3)) AS jaccard
FROM nonempty a JOIN nonempty b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.g3, b.g3))::DOUBLE / len(list_distinct(a.g3 || b.g3))
      >= {TRIGRAM_JACCARD}
"""


# --- embedding cosine --------------------------------------------------------


def embedding_cosine_dedup(embeddings: DataFrame) -> DataFrame:
    """Exact cosine near-dup pairs over the embedding column.

    This is the exact baseline (all pairs); the sub-quadratic ANN variants
    live in operators.similarity.  Cosine = sequential per-row fold over
    double-cast arrays — bit-identical to DuckDB's list_dot_product
    (verified in tests/test_functions.py).
    Output: (vec_a, vec_b, cos).
    """
    e = embeddings.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    dot = lambda u, v: F.aggregate(  # noqa: E731
        F.zip_with(u, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norms = e.select(
        "vec_id", "emb", F.sqrt(dot(F.col("emb"), F.col("emb"))).alias("nrm")
    )
    return (
        norms.alias("a")
        .join(norms.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (dot(F.col("a.emb"), F.col("b.emb")) / (F.col("a.nrm") * F.col("b.nrm"))).alias("cos"),
        )
        .filter(F.col("cos") > COSINE_DUP)
    )


EMBEDDING_COSINE_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) > {COSINE_DUP}
"""
