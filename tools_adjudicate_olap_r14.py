"""r14 evidence script (VERDICT r13 #2): adjudicate the olap_suite_extra
creep (5.47 baseline row -> 6.76 r12 -> 7.65 r13-flagged) with the
established 10-run cold-cache protocol (BASELINE.md r12 ann_topk note)
plus the new per-arm trace, on one quiet session.

Emits one JSON line: bracketing probes, the 10 cold runs, median/min,
and two per-arm cold passes (arm sums exceed the union row — each arm
pays its own scans; the union shares them — so arms are attribution
evidence, not a baseline).
"""

from __future__ import annotations

import json
import statistics
import sys
import time

from bench import materialize, sentinel_sec, settle_sentinel

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from cloudcomputing_flink_application_spark.operators.olap import (
        suite_extra,
        suite_extra_arms,
    )
    from cloudcomputing_flink_application_spark.registry import olap_confs
    from cloudcomputing_flink_application_spark.session import get_spark

    spark = get_spark(app_name="adjudicate-olap-r14")
    settle_sentinel(spark)
    probe0 = sentinel_sec(spark)
    s = olap_confs(spark)

    # JIT warm-up (discarded)
    materialize(suite_extra(s, SF_DIR))
    runs = []
    for i in range(10):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        materialize(suite_extra(s, SF_DIR))
        runs.append(round(time.perf_counter() - t0, 3))
        print(f"# run {i}: {runs[-1]}s", file=sys.stderr)
    probe_mid = sentinel_sec(spark)

    arm_trace: dict[str, list[float]] = {}
    for _pass in range(2):
        spark.catalog.clearCache()
        for arm, df in suite_extra_arms(s, SF_DIR).items():
            t0 = time.perf_counter()
            materialize(df)
            arm_trace.setdefault(arm, []).append(
                round(time.perf_counter() - t0, 3)
            )
    probe1 = sentinel_sec(spark)
    print(json.dumps({
        "probe_first": probe0,
        "probe_mid": probe_mid,
        "probe_last": probe1,
        "runs": runs,
        "median": round(statistics.median(runs), 3),
        "min": min(runs),
        "arms_min": {a: min(v) for a, v in arm_trace.items()},
        "arms": arm_trace,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
