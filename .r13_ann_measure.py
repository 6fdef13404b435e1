"""r13 item 2: five quiet cold-cache runs of ann_ivf_recall at sf0.1
(the BASELINE.md re-record protocol), with sentinel probes bracketing
the series so the record itself proves the session was quiet.
Run on an idle machine only, from the repo root (imports ``bench`` so
the probe/warm-up protocol can never drift from the harness's)."""

import json
import time

from bench import materialize, sentinel_sec, settle_sentinel
from cloudcomputing_flink_application_spark.registry import REGISTRY
from cloudcomputing_flink_application_spark.session import get_spark


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="ann-ivf-recall-rerecord")
    q = REGISTRY["ann_ivf_recall"]

    settle_sentinel(spark)
    s0 = sentinel_sec(spark)
    # query JIT warm-up x4 (the ann family settles over ~8 runs — the
    # r12 BASELINE note; a single warm-up records the decay tail, not
    # the steady state), then 5 cold-cache runs
    for _ in range(4):
        spark.catalog.clearCache()
        materialize(q.fn(spark, sf_dir))
    runs = []
    for _ in range(5):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        materialize(q.fn(spark, sf_dir))
        runs.append(round(time.perf_counter() - t0, 3))
    s1 = sentinel_sec(spark)
    print(
        json.dumps(
            {
                "query": "ann_ivf_recall",
                "runs": runs,
                "max": max(runs),
                "rerecord_row": round(max(runs) * 1.05, 2),
                "sentinel_first": s0,
                "sentinel_last": s1,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
