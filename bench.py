#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set: one representative per operator family (scan-agg, multi-join,
window functions, sessionization, event-time windows, dedup, minhash, ANN,
text stats, multimodal pandas stage). Heavy all-pairs document queries
(d02/d04) are exercised for correctness in tests, not here — their cost is a
property of the tiny synthetic vocabulary, not the engine.
"""

from __future__ import annotations

import json
import os
import time

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q07_volume_shipping",
    "q10_returned_items",
    "q13_top_orders_per_customer",
    "l02_tumbling_window_hourly",
    "l07_sessionize",
    "l11_session_window_native",
    "e02_daily_error_rate",
    "d01_exact_dedup",
    "d03_minhash_signatures",
    "s01_cosine_topk",
    "s03_cosine_neardup_pairs",
    "t01_text_stats",
    "m01_multimodal_decode",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from spark_streaming_logservice_spark.session import get_spark
    from spark_streaming_logservice_spark import registry

    registry.load_all()
    spark = get_spark(app_name="logstream-bench", master=f"local[{cpus}]")

    # Warm the JVM + parquet footers once so per-query timings measure the
    # engine, not session startup.
    registry.QUERIES["q01_pricing_summary"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
