"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line:

    {"metric": "wall_sec_total", "value": N, "unit": "sec",
     "queries": {"q_speed": sec, ...}, "sf": 0.1}

Per-query time = median of 3 runs after 1 warm-up; heavy queries — those
whose warm-up AND first timed run both exceed SPARK_GRAFT_BENCH_HEAVY_SEC
— are timed once (BASELINE.md protocol; requiring both keeps a one-off
JIT-inflated warm-up or a contended first run from collapsing a light
query to a single sample).
Results are materialized with the noop sink — full execution of every
operator, no driver-side row transfer in the measurement.

Contention sentinel (r6): a fixed-cost data-independent probe job (small
range -> shuffle -> count, constant work regardless of SF) is timed
immediately BEFORE the first query and AFTER the last, and both times
plus their ratio are emitted in the JSON (``sentinel`` key).  A quiet
machine holds the ratio near 1.0 and the absolute times near the
BASELINE.md reference value; a contended session (the r4->r5 uniform
+13% drift signature) shows up directly as an inflated sentinel instead
of needing a by-hand diff against clean runs.

Per-query outlier flag (r7): each median-of-3 query also records its
run-to-run spread (max/min); spreads > 2x land in the JSON ``outliers``
key.  This closes the one contention mode the two-point sentinel cannot
see — a mid-run burst between the probes (the r6 signature: three
unchanged operators breached their bars while the sentinel read clean).
An entry in ``outliers`` means that query's record absorbed a burst and
should be re-measured before being treated as a regression.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from cloudcomputing_flink_application_spark.registry import REGISTRY
from cloudcomputing_flink_application_spark.session import get_spark

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
HEAVY_SEC = float(os.environ.get("SPARK_GRAFT_BENCH_HEAVY_SEC", "8"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark(app_name="cloudcomputing-flink-application-bench")

    def materialize(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    def sentinel_sec() -> float:
        """Min of 3 runs of the constant probe job (min = least-contended
        estimate; the probe is data-independent so any inflation is
        machine state, not workload)."""
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(
                spark.range(0, 2_000_000, 1, 16)
                .selectExpr("id % 97 AS k")
                .groupBy("k")
                .count()
            )
            samples.append(time.perf_counter() - t0)
        return round(min(samples), 3)

    sentinel_sec()  # JIT/codegen warm-up for the probe shape
    sentinel_first = sentinel_sec()

    per_query: dict[str, float] = {}
    outliers: dict[str, float] = {}
    for name, q in sorted(REGISTRY.items()):
        t0 = time.perf_counter()
        materialize(q.fn(spark, sf_dir))  # warm-up (JIT, code cache, FS cache)
        warm = time.perf_counter() - t0

        def timed_run() -> float:
            # Cold-cache timing: operators that persist() intermediate prep
            # (the MinHash family) must pay their own materialization inside
            # the measured run, not inherit the warm-up's cache entries.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            materialize(q.fn(spark, sf_dir))
            return time.perf_counter() - t0

        # Heavy classification requires warm-up AND first timed run BOTH
        # over the threshold — i.e. min(warm, first) decides.  Warm-up
        # alone misfires on JIT: pipe_clean_corpus warms at ~13 s but
        # settles near 3 s, and classifying on warm-up left it ONE timed
        # sample that a single contention burst then poisoned.  First-run
        # alone has the mirrored failure (a contended first run of a light
        # query becomes its record).  Either signal being fast proves the
        # query is light, so the median-of-3 runs.  Total work unchanged:
        # heavy = warm + 1 run; light = warm + RUNS runs (probe included).
        samples = [timed_run()]
        if min(warm, samples[0]) <= HEAVY_SEC:
            samples += [timed_run() for _ in range(RUNS - 1)]
        per_query[name] = round(statistics.median(samples), 3)
        # Run-to-run spread (max/min): the per-query contention flag the
        # two-point sentinel cannot provide (r6 VERDICT — a mid-run burst
        # between the sentinel probes inflated three queries' records
        # invisibly).  > 2x spread on a median-of-3 means one run was
        # burst-inflated; the median absorbs ONE outlier, and the JSON now
        # carries the evidence instead of burying it in stderr.
        if len(samples) > 1 and min(samples) > 0:
            spread = max(samples) / min(samples)
            if spread > 2.0:
                outliers[name] = round(spread, 2)
        print(
            f"# {name}: {per_query[name]}s (warm: {round(warm, 3)}, "
            f"runs: {[round(s, 3) for s in samples]})",
            file=sys.stderr,
        )

    sentinel_last = sentinel_sec()
    total = round(sum(per_query.values()), 3)
    print(json.dumps({
        "metric": "wall_sec_total",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "sentinel": {
            "first_sec": sentinel_first,
            "last_sec": sentinel_last,
            "drift": round(sentinel_last / sentinel_first, 2)
            if sentinel_first > 0
            else None,
        },
        "outliers": outliers,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
