#!/usr/bin/env python
"""r15 optimization-round profiler.

For each named query: time plan CONSTRUCTION (fn call, py4j round-trips)
separately from EXECUTION (.count(), min of N), count the Spark jobs the
execution schedules (AQE makes one job per materialized query stage, so the
job count is a direct proxy for exchange count at local scale), and dump
.explain("formatted") to plans/r15/<query>_<tag>.txt.

Usage: python scripts/profile_r15.py <tag> [query ...]
  tag: 'before' / 'after' (plan file suffix)
  queries: default = bench HEADLINE list
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from bench import HEADLINE  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from spark_streaming_logservice_spark import registry
    from spark_streaming_logservice_spark.session import get_spark

    registry.load_all()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="profile-r15", master=f"local[{cpus}]")
    sc = spark.sparkContext

    # warm: JVM, parquet footers, codegen of a representative query
    registry.QUERIES["q01_pricing_summary"](spark, sf_dir).count()
    if "sr01_logstore_typed_agg" in names:
        registry.QUERIES["sr01_logstore_typed_agg"](spark, sf_dir).count()

    plans_dir = os.path.join(_HERE, "plans", "r15")
    os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in names:
        fn = registry.QUERIES.get(name)
        if fn is None:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        sc.setJobDescription(f"profile:{name}")
        # plan construction cost (pure driver/py4j work)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0

        # capture the formatted plan once (pre-execution, AQE initial plan)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)

        best = None
        jobs_delta = None
        for i in range(runs):
            group = f"profile-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            if best is None or dt < best:
                best = dt
                jobs_delta = n_jobs
        out[name] = {
            "build_s": round(t_build, 4),
            "exec_min_s": round(best, 4),
            "jobs": jobs_delta,
        }
        print(
            f"{name:38s} build {t_build*1000:7.1f} ms  "
            f"exec {best:7.3f} s  jobs {jobs_delta}"
        )
        sc.setJobDescription(None)

    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "profile": out}))


if __name__ == "__main__":
    main()
