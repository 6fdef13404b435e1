"""r14 optimization-round measurement harness (guide §1: measure first).

For each selected registry query, on one quiet session:

- time DataFrame CONSTRUCTION (``q.fn`` — driver-side plan building; the
  bench's timed region includes it, and the olap_suite_extra adjudication
  showed it can dominate), then
- time N cold-cache EXECUTIONS of the noop sink (``bench.materialize`` —
  same sink as bench.py), and
- optionally write ``explain("formatted")`` to ``plans/r14/<q>_<tag>.txt``.

Emits one JSON line with per-query {construct, runs, median, min}; stderr
carries progress.  Usage:

    python tools_measure_r14.py [--queries a,b,c] [--runs 3]
        [--plans-tag before|after|none] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

from bench import materialize, sentinel_sec, settle_sentinel


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-tag", default="none")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from cloudcomputing_flink_application_spark.registry import REGISTRY
    from cloudcomputing_flink_application_spark.session import get_spark

    names = (
        [n for n in args.queries.split(",") if n]
        if args.queries
        else sorted(REGISTRY)
    )
    spark = get_spark(app_name="measure-r14")
    settle_sentinel(spark)
    probe0 = sentinel_sec(spark)
    print(f"# probe first: {probe0}", file=sys.stderr)

    plans_dir = os.path.join(os.path.dirname(__file__), "plans", "r15")
    if args.plans_tag != "none":
        os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        q = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"measure:{name}")
        # construction cost: driver-side plan building, measured alone
        t0 = time.perf_counter()
        df = q.fn(spark, args.sf_dir)
        construct = round(time.perf_counter() - t0, 3)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if args.plans_tag != "none":
            with open(
                os.path.join(plans_dir, f"{name}_{args.plans_tag}.txt"), "w"
            ) as fh:
                fh.write(plan)
        exchanges = plan.count("Exchange")
        # warm-up (JIT) then cold-cache runs, bench.py protocol
        t0 = time.perf_counter()
        materialize(df)
        warm = round(time.perf_counter() - t0, 3)
        runs = []
        n_jobs = None
        for i in range(args.runs):
            spark.catalog.clearCache()
            if i == args.runs - 1:
                # count the Spark jobs one full cold run triggers (actions
                # from persist materialization, iterative rounds, ...)
                spark.sparkContext.setJobGroup(f"measure:{name}", name)
            t0 = time.perf_counter()
            materialize(q.fn(spark, args.sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
            if i == args.runs - 1:
                tracker = spark.sparkContext.statusTracker()
                n_jobs = len(tracker.getJobIdsForGroup(f"measure:{name}"))
                spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
        out[name] = {
            "construct": construct,
            "warm": warm,
            "runs": runs,
            "median": round(statistics.median(runs), 3),
            "min": min(runs),
            "jobs": n_jobs,
            "exchanges": exchanges,
        }
        print(
            f"# {name}: construct {construct} warm {warm} runs {runs} "
            f"jobs {n_jobs} exchanges {exchanges}",
            file=sys.stderr,
        )
        spark.sparkContext.setJobDescription(None)
    probe1 = sentinel_sec(spark)
    print(f"# probe last: {probe1}", file=sys.stderr)
    print(json.dumps({
        "probe_first": probe0,
        "probe_last": probe1,
        "detail": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
