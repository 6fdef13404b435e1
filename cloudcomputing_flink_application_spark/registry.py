"""Query registry: every operator from SURVEY.md §2 as a (spark, sf_dir) ->
DataFrame callable plus its DuckDB oracle SQL.

This is the single source the driver contract (``__spark_entry__.py``) and
``bench.py`` read.  Each entry's Spark plan and oracle SQL are written to be
**bit-identical** under the driver's order-insensitive value-hash compare:
integer-only derivations, exact-cents averages, explicit casts, and aligned
column aliases on both sides (see sources.derived for the shared views).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from cloudcomputing_flink_application_spark.operators import (
    dedup,
    multimodal,
    olap,
    pipeline,
    similarity,
    taxi,
    telematics,
    textstats,
    timeseries,
)
from cloudcomputing_flink_application_spark.sources import derived
from cloudcomputing_flink_application_spark.sources.readers import read_events
from cloudcomputing_flink_application_spark.sources.scan_cache import (
    memo_parquet_scan,
)


@dataclass(frozen=True)
class Query:
    """A registered query: Spark implementation + optional DuckDB oracle."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""


#: Session confs every query needs regardless of who built the session —
#: the driver's verify harness constructs its own SparkSession, so these are
#: (re)applied at query time.  All are runtime-settable SQL confs.
_REQUIRED_CONFS = {
    # the testdata's TIMESTAMP(NANOS) parquet needs the nanos-as-long read
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # reference semantics pin UTC (SURVEY.md §2.9 X4)
    "spark.sql.session.timeZone": "UTC",
    # Arrow path for the mapInPandas operators
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    for k, v in _REQUIRED_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static on some builds
            pass
    return spark


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_events(ensure_session_confs(spark), sf_dir)


def _car_reports(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derived.car_reports_from_events(_events(spark, sf_dir))


def _taxi_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derived.taxi_trips_from_events(_events(spark, sf_dir))


# --- the five reference queries on the derived views -------------------------

def q_speed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-SPEED (VehicleTelematics.java:59-83) on the derived car_reports."""
    return telematics.speed_radar(_car_reports(spark, sf_dir))


Q_SPEED_SQL = f"""
WITH {derived.CAR_REPORTS_CTE.strip()}
SELECT time, vid, xway, seg, dir, spd
FROM car_reports
WHERE spd >= 90
"""


def q_avgspd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-AVGSPD (VehicleTelematics.java:93-152,255-288) on derived reports."""
    return telematics.average_speed_fines(_car_reports(spark, sf_dir))


Q_AVGSPD_SQL = f"""
WITH {derived.CAR_REPORTS_CTE.strip()},
measured AS (
  SELECT time, vid, xway, seg, pos
  FROM car_reports WHERE dir = 0 AND seg IN (52, 56)
),
staged AS (
  SELECT time, vid, xway, seg,
         max(CASE WHEN seg = 52 THEN pos END) OVER run AS p1,
         arg_max(CASE WHEN seg = 52 THEN time END,
                 CASE WHEN seg = 52
                      THEN CAST(pos AS BIGINT) * 2147483648 - time END) OVER run AS t1,
         min(CASE WHEN seg = 56 THEN pos END) OVER run AS p2,
         arg_min(CASE WHEN seg = 56 THEN time END,
                 CASE WHEN seg = 56
                      THEN CAST(pos AS BIGINT) * 2147483648 + time END) OVER run AS t2,
         lag(seg) OVER (PARTITION BY vid ORDER BY time) AS prev_seg
  FROM measured
  WINDOW run AS (PARTITION BY vid ORDER BY time
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
fines AS (
  SELECT t1 AS time1, t2 AS time2, vid, xway, CAST(0 AS INT) AS dir,
         CAST(trunc((((p2 - p1) // (t2 - t1)) * 3600 // 1000) * 0.621371) AS INT) AS avgspd
  FROM staged
  WHERE prev_seg = 52 AND seg = 56 AND t1 IS NOT NULL AND t2 > t1
)
SELECT * FROM fines WHERE avgspd > 60
"""


def q_accidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-ACC (VehicleTelematics.java:162-172,290-331) on derived reports."""
    return telematics.accident_reports(_car_reports(spark, sf_dir))


Q_ACCIDENTS_SQL = f"""
WITH {derived.CAR_REPORTS_CTE.strip()},
runs AS (
  SELECT time, vid, xway, seg, dir, pos,
         count(*) OVER w AS n,
         min(pos) OVER w AS mn,
         max(pos) OVER w AS mx,
         lag(time, 3) OVER (PARTITION BY vid ORDER BY time) AS t1,
         lag(xway, 3) OVER (PARTITION BY vid ORDER BY time) AS xway1,
         lag(seg, 3)  OVER (PARTITION BY vid ORDER BY time) AS seg1,
         lag(dir, 3)  OVER (PARTITION BY vid ORDER BY time) AS dir1
  FROM car_reports
  WINDOW w AS (PARTITION BY vid ORDER BY time ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
)
SELECT t1 AS time1, time AS time2, vid, xway1 AS xway, seg1 AS seg, dir1 AS dir, pos
FROM runs
WHERE n = 4 AND mn = mx
"""


def q_cong(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-CONG (CongestionArea.java:43-61,92-117) on the derived taxi view."""
    return taxi.congestion_daily(_taxi_trips(spark, sf_dir))


Q_CONG_SQL = f"""
WITH {derived.TAXI_TRIPS_CTE.strip()}
SELECT strftime(date_trunc('day', tpep_pickup_datetime), '%Y/%m/%d') AS day,
       CAST(count(*) AS INT) AS trips,
       (CASE WHEN sum(CAST(round(total_amount * 100) AS BIGINT)) < 0 THEN -1 ELSE 1 END)
         * ((2 * abs(sum(CAST(round(total_amount * 100) AS BIGINT))) + count(*))
            // (2 * count(*))) / 100.0 AS avg_total
FROM taxi_trips
WHERE congestion_surcharge > 0
GROUP BY 1
"""


def q_sat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-SAT (SaturatedVendor.java:40-91) on the derived taxi view."""
    return taxi.saturated_vendors(_taxi_trips(spark, sf_dir))


Q_SAT_SQL = f"""
WITH {derived.TAXI_TRIPS_CTE.strip()},
ordered AS (
  SELECT vendor_id,
         tpep_pickup_datetime AS p, tpep_dropoff_datetime AS d,
         lag(tpep_pickup_datetime)  OVER w AS pp,
         lag(tpep_dropoff_datetime) OVER w AS pd
  FROM taxi_trips
  WINDOW w AS (PARTITION BY vendor_id
               ORDER BY tpep_pickup_datetime, tpep_dropoff_datetime)
)
SELECT vendor_id,
       strftime(pp, '%Y-%m-%d %H:%M:%S') AS first_pickup,
       strftime(d,  '%Y-%m-%d %H:%M:%S') AS last_dropoff,
       CAST(2 AS INT) AS trips
FROM ordered
WHERE pd IS NOT NULL AND epoch_ms(p) - epoch_ms(pd) < 600000
"""


def olap_confs(spark: SparkSession) -> SparkSession:
    """UTC session for the timestamp comparisons in the OLAP queries."""
    return ensure_session_confs(spark)


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # memoized scan (r14 optimization round): write-once driver testdata,
    # ~135 ms of listing+footer work per plain read — see sources.scan_cache
    return memo_parquet_scan(
        ensure_session_confs(spark), f"{sf_dir}/documents.parquet"
    )


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return memo_parquet_scan(
        ensure_session_confs(spark), f"{sf_dir}/embeddings.parquet"
    )


def _on_docs(op):
    return lambda spark, sf_dir: op(_documents(spark, sf_dir))


def _on_embs(op):
    return lambda spark, sf_dir: op(_embeddings(spark, sf_dir))


REGISTRY: dict[str, Query] = {
    # --- reference queries (SURVEY.md §2.11) on derived views ---
    "q_speed": Query(q_speed, Q_SPEED_SQL, "Q-SPEED: reports at/over 90 mph"),
    "q_avgspd": Query(q_avgspd, Q_AVGSPD_SQL, "Q-AVGSPD: seg 52-56 average-speed fines"),
    "q_accidents": Query(q_accidents, Q_ACCIDENTS_SQL, "Q-ACC: 4+ stopped reports"),
    "q_cong": Query(q_cong, Q_CONG_SQL, "Q-CONG: daily surcharged-trip averages"),
    "q_sat": Query(q_sat, Q_SAT_SQL, "Q-SAT: back-to-back vendor trips"),
    # --- dedup family (SURVEY.md §7 Milestone 6) ---
    "dedup_exact": Query(
        _on_docs(dedup.exact_dedup), dedup.EXACT_DEDUP_SQL,
        "exact dedup: canonical id per text-hash group",
    ),
    # (r7 consolidation: minhash_lsh_dedup + ngram_jaccard_dedup are
    # registered as the method-keyed union dedup_text_pairs; the embedding
    # pair in dedup_embedding; brute+IVF top-k in ann_topk.  Every
    # component stays public with its own oracle in
    # tests/test_offregistry_parity.py.)
    "dedup_text_pairs": Query(
        _on_docs(dedup.text_pair_dedup_methods), dedup.TEXT_PAIR_METHODS_SQL,
        "near-dup pairs, method-keyed union: MinHash 16-perm 4x4-band LSH "
        "(jaccard-verified) + char-trigram jaccard within source blocks",
    ),
    "dedup_minhash_clusters": Query(
        _on_docs(dedup.minhash_cluster_dedup), dedup.MINHASH_CLUSTER_SQL,
        "scale-shaped MinHash dedup: per-doc cluster assignment via star linking",
    ),
    "dedup_cc_clusters": Query(
        _on_docs(dedup.minhash_cc_dedup), dedup.MINHASH_CC_SQL,
        "full transitive-closure dedup clusters: large-star/small-star "
        "connected components over the verified star-edge graph",
    ),
    "dedup_purge": Query(
        _on_docs(dedup.minhash_purge_dedup), dedup.MINHASH_PURGE_SQL,
        "purged corpus: one row per kept doc with cluster size + chars saved",
    ),
    "dedup_band_flags": Query(
        _on_docs(dedup.minhash_band_flags), dedup.MINHASH_BAND_FLAGS_SQL,
        "candidate-level MinHash band flags (streaming-ingest dedup contract)",
    ),
    "dedup_simhash": Query(
        _on_docs(dedup.simhash_dedup), dedup.SIMHASH_SQL,
        "SimHash 32-bit, 8-bit-band blocking, hamming-verified",
    ),
    "dedup_embedding": Query(
        _on_embs(dedup.embedding_dedup_methods), dedup.EMBEDDING_METHODS_SQL,
        "embedding near-dup pairs, method-keyed union: exact cosine "
        "baseline + hyperplane-LSH sub-quadratic scale path",
    ),
    # --- similarity search ---
    "ann_topk": Query(
        _on_embs(similarity.topk_methods), similarity.TOPK_METHODS_SQL,
        "top-k per query vector, method-keyed union: brute-force cosine "
        "baseline + IVF-pruned (two-level codebook) + PQ-ADC over "
        "32x-compressed codes (r9)",
    ),
    "ann_ivf_recall": Query(
        _on_embs(similarity.ivf_recall_report), similarity.IVF_RECALL_SQL,
        "recall@k of the IVF path vs the exact baseline, per query",
    ),
    "emb_kmeans_codebook": Query(
        _on_embs(similarity.ivf_kmeans_codebook), similarity.KMEANS_CODEBOOK_SQL,
        "IVF index build: one Lloyd k-means update with exact quantized sums",
    ),
    "emb_quantize": Query(
        _on_embs(similarity.quantize_embeddings), similarity.QUANTIZE_SQL,
        "symmetric int8 embedding quantization (storage path)",
    ),
    # --- text analysis ---
    # (registry consolidation, r5: the driver's correctness harness checks
    # at most 50 queries — r4 registered 53 and exactly the first 50 got
    # rows — so the per-row projections over one scan are exposed as their
    # single-pass compositions; every underlying operator stays public, and
    # each de-registered op/SQL pair keeps full rows+schema+values oracle
    # parity in tests/test_offregistry_parity.py.)
    "text_doc_stats": Query(
        _on_docs(textstats.doc_stats), textstats.DOC_STATS_SQL,
        "per-doc report: marker-ngram language ID + quality signals + "
        "token counts in one scan-fused projection",
    ),
    "text_fingerprint": Query(
        _on_docs(textstats.fingerprint), textstats.FINGERPRINT_SQL,
        "bottom-k shingle-hash document fingerprint",
    ),
    "text_token_freq": Query(
        _on_docs(textstats.token_freq), textstats.TOKEN_FREQ_SQL,
        "corpus vocabulary: top-k tokens (explode + partial-agg count)",
    ),
    "text_top_terms": Query(
        _on_docs(textstats.top_terms), textstats.TOP_TERMS_SQL,
        "per-doc distinctive terms: top-k tokens by exact tf/df ratio",
    ),
    "text_len_histogram": Query(
        _on_docs(textstats.length_histogram), textstats.LENGTH_HISTOGRAM_SQL,
        "per-language token-length histogram (power-of-two buckets)",
    ),
    "text_redact_split": Query(
        _on_docs(textstats.redact_split), textstats.REDACT_SPLIT_SQL,
        "governance pass: PII-style digit-run redaction + content-addressed "
        "90/5/5 train/valid/test split in one scan-fused projection",
    ),
    # --- training-data pipeline (corpus preparation) ---
    "pipe_decontam": Query(
        _on_docs(pipeline.decontaminate), pipeline.DECONTAMINATE_SQL,
        "benchmark decontamination: 5-gram shingle overlap vs broadcast eval set",
    ),
    "pipe_contam_report": Query(
        _on_docs(pipeline.contamination_report), pipeline.CONTAM_REPORT_SQL,
        "per-benchmark-doc leak report (reverse attribution of decontaminate)",
    ),
    "pipe_repetition": Query(
        _on_docs(pipeline.repetition_stats), pipeline.REPETITION_SQL,
        "Gopher-style repetition metrics (top-2gram / dup-3gram fractions)",
    ),
    "pipe_pack_chunks": Query(
        _on_docs(pipeline.pack_chunks), pipeline.PACK_CHUNKS_SQL,
        "sequence packing: concat-and-chunk offsets via bounded windows",
    ),
    "pipe_sample": Query(
        _on_docs(pipeline.sample_stratified), pipeline.SAMPLE_STRATIFIED_SQL,
        "deterministic per-language stratified sampling (stable hash predicate)",
    ),
    "pipe_source_report": Query(
        _on_docs(pipeline.source_report), pipeline.SOURCE_REPORT_SQL,
        "per-source corpus accounting: docs, distinct texts, dup rate",
    ),
    "pipe_clean_corpus": Query(
        _on_docs(pipeline.clean_corpus), pipeline.CLEAN_CORPUS_SQL,
        "composed cleaning pipeline: quality -> repetition -> decontam -> dedup -> split",
    ),
    # --- r7 compositions (the r6 off-registry operators earn driver rows) ---
    "text_span_scrub": Query(
        _on_docs(pipeline.span_pass), pipeline.SPAN_PASS_SQL,
        "exact-substring span pass: per-doc duplication stats + scrubbed "
        "text (Lee-et-al-style corpus-duplicated window removal)",
    ),
    "pipe_prep": Query(
        _on_docs(pipeline.prep_corpus), pipeline.PREP_CORPUS_SQL,
        "composed training prep: sqrt-temperature source mixing -> "
        "sliding-window chunking -> per-doc OOV quality columns",
    ),
    # --- analytical joins over the star schema (beyond the join-free reference) ---
    "olap_revenue_by_nation": Query(
        lambda s, d: olap.revenue_by_nation(olap_confs(s), d), olap.REVENUE_BY_NATION_SQL,
        "4-way join + exact-cents revenue per customer nation",
    ),
    "olap_top_suppliers": Query(
        lambda s, d: olap.top_suppliers_by_nation(olap_confs(s), d), olap.TOP_SUPPLIERS_SQL,
        "top-k suppliers per nation (rank over aggregated revenue)",
    ),
    "olap_shipping_priority": Query(
        lambda s, d: olap.shipping_priority(olap_confs(s), d), olap.SHIPPING_PRIORITY_SQL,
        "top-k unshipped-revenue orders (TPC-H Q3 shape)",
    ),
    "olap_order_priority": Query(
        lambda s, d: olap.order_priority_counts(olap_confs(s), d), olap.ORDER_PRIORITY_SQL,
        "semi-join order-priority counts (TPC-H Q4 shape)",
    ),
    "olap_customer_distribution": Query(
        lambda s, d: olap.customer_distribution(olap_confs(s), d),
        olap.CUSTOMER_DISTRIBUTION_SQL,
        "customer order-count distribution incl. zero-order customers (TPC-H Q13 shape)",
    ),
    "olap_pricing_summary": Query(
        lambda s, d: olap.pricing_summary(olap_confs(s), d), olap.PRICING_SUMMARY_SQL,
        "pricing summary report (TPC-H Q1 shape, exact-int sums)",
    ),
    "olap_large_orders": Query(
        lambda s, d: olap.large_orders(olap_confs(s), d), olap.LARGE_ORDERS_SQL,
        "large-volume-customer orders: HAVING-filtered aggregate joined back "
        "to orders (TPC-H Q18 shape, AQE runtime broadcast)",
    ),
    "olap_suite_extra": Query(
        lambda s, d: olap.suite_extra(olap_confs(s), d), olap.SUITE_EXTRA_SQL,
        "keyed union of the extra TPC-H shapes: Q5/Q7/Q19/Q22 (r6), "
        "Q6/Q10/Q14/Q17 (r8), Q8/Q9/Q15/Q16/Q20/Q21 (r9 — market share, "
        "the two hard decorrelation probes, scalar-max, count-distinct "
        "anti-join, and profit shapes)",
    ),
    # --- time-series compositions over events ---
    "ts_asof_join": Query(
        timeseries.purchases_asof_signup, timeseries.ASOF_SIGNUP_SQL,
        "as-of join: purchase -> most recent prior signup (union-window composition)",
    ),
    "ts_range_count": Query(
        timeseries.concurrent_events, timeseries.CONCURRENT_EVENTS_SQL,
        "bucketed range self-join: events within ±5 min (band-blocked equi-join)",
    ),
    "ts_sessionize": Query(
        timeseries.sessionize, timeseries.SESSIONIZE_SQL,
        "gap-based sessionization (lag + flag + running sum)",
    ),
    "ts_rollup": Query(
        timeseries.rollup_events, timeseries.ROLLUP_EVENTS_SQL,
        "hypertable-style hour+day rollup in one pass (GROUPING SETS)",
    ),
    "ts_json_stats": Query(
        timeseries.events_json_stats, timeseries.EVENTS_JSON_SQL,
        "semi-structured extraction: JSON props aggregated per event_type",
    ),
    "ts_rolling_active": Query(
        timeseries.rolling_active_users, timeseries.ROLLING_ACTIVE_SQL,
        "DAU + trailing-7-day distinct actives via contribution explode",
    ),
    "ts_funnel": Query(
        timeseries.signup_funnel, timeseries.SIGNUP_FUNNEL_SQL,
        "signup->purchase cohort conversion funnel (7-day window)",
    ),
    "ts_anomalies": Query(
        timeseries.hourly_anomalies, timeseries.HOURLY_ANOMALIES_SQL,
        "hourly volume-spike detection (integer-exact z-test)",
    ),
    "ts_retention": Query(
        timeseries.retention_matrix, timeseries.RETENTION_MATRIX_SQL,
        "weekly cohort retention triangle (distinct actives per week offset)",
    ),
    # --- multimodal columns (mapInPandas plumbing, deterministic fake decode) ---
    "mm_media_probe": Query(
        _on_docs(multimodal.media_probe), multimodal.MEDIA_PROBE_SQL,
        "binary payload -> image metadata + PCM frame accounting in one "
        "Arrow mapInPandas pass",
    ),
}
