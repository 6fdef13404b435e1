"""r14 evidence script (VERDICT r13 #1b): re-measure the queries whose
per-query rows the truncated r13 driver record lost — one quiet session,
adaptive sentinel warm-up, 5 cold-cache runs each, bracketing probes.

Protocol identical to bench.py's per-query loop (same materialize sink,
same clearCache cold-cache rule) with RUNS=5 so the BASELINE.md r14 note
gets a same-estimator median plus the full run list for auditability.
Emits one JSON line; stderr carries per-run detail.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

from bench import materialize, sentinel_sec, settle_sentinel

QUERIES = [
    "ann_ivf_recall", "ann_topk", "dedup_band_flags", "dedup_cc_clusters",
    "dedup_embedding", "dedup_exact", "dedup_minhash_clusters",
    "dedup_purge", "dedup_simhash", "dedup_text_pairs",
    "emb_kmeans_codebook", "emb_quantize", "mm_media_probe",
    "olap_customer_distribution",
]


def main() -> None:
    from cloudcomputing_flink_application_spark.registry import REGISTRY
    from cloudcomputing_flink_application_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="remeasure-r14")
    settle_sentinel(spark)
    probe0 = sentinel_sec(spark)
    out: dict[str, dict] = {}
    for name in QUERIES:
        q = REGISTRY[name]
        t0 = time.perf_counter()
        materialize(q.fn(spark, sf_dir))
        warm = round(time.perf_counter() - t0, 3)
        runs = []
        for _ in range(5):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            materialize(q.fn(spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "warm": warm,
            "runs": runs,
            "median": round(statistics.median(runs), 3),
            "min": min(runs),
        }
        print(f"# {name}: median {out[name]['median']} runs {runs}",
              file=sys.stderr)
    probe1 = sentinel_sec(spark)
    print(json.dumps({
        "probe_first": probe0,
        "probe_last": probe1,
        "queries": {n: v["median"] for n, v in out.items()},
        "detail": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
