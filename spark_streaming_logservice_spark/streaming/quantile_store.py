"""Streaming quantile maintenance via a mergeable fixed-bin histogram.

Exact streaming percentiles need the full value multiset; the mergeable
alternative is a FIXED-BIN histogram — bin counts are decomposable sums, so
the store rides the same crash-safe additive swap as the rollup/Count-Min
stores (streaming/rollup.merge_additive), and any quantile is served by
walking the cumulative bin counts with linear interpolation inside the
landing bin. Error is bounded by one bin width by construction — the
histogram analog of a t-digest, chosen because its merge is plain addition
(associative, commutative, idempotent-mergeable — the class a crash-retried
merge needs; digest merges are not idempotent under replay).

Bin layout: ``n_bins`` equal-width bins over a FIXED [lo, hi) domain chosen
at store creation (values outside clamp to the edge bins, preserving count
mass and keeping extreme quantiles honest to within the clamp). A fixed
domain is what makes partials from different batches alignable — a
data-dependent domain would make old partials unmergeable."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.streaming.queries import (
    idempotent_foreach_batch,
)
from spark_streaming_logservice_spark.streaming.rollup import merge_additive

_SCHEMA = "bin INT, cnt BIGINT"


def histogram_partials(
    df: DataFrame, value_col: str, lo: float, hi: float, n_bins: int = 256
) -> DataFrame:
    """Per-batch bin counts: bin = clamp(floor((x−lo)·n/(hi−lo)), 0, n−1).
    Output is ≤ n_bins rows regardless of batch size."""
    x = F.col(value_col).cast("double")
    raw = F.floor((x - lo) * n_bins / (hi - lo)).cast("int")
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    return (
        df.where(x.isNotNull())
        .groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def incremental_histogram_writer(
    table_dir: str, value_col: str, lo: float, hi: float, n_bins: int = 256
):
    """foreachBatch function maintaining the histogram store with
    batchId-idempotent replay."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        merge_additive(
            table_dir,
            histogram_partials(batch_df, value_col, lo, hi, n_bins),
            key_cols=["bin"],
            sum_cols=["cnt"],
            schema=_SCHEMA,
            batch_id=batch_id,
        )

    return idempotent_foreach_batch(write, os.path.join(table_dir, "_markers"))


def read_quantiles(
    spark: SparkSession,
    table_dir: str,
    probs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> list[float]:
    """Serve quantiles from the maintained histogram: walk cumulative bin
    counts, interpolate linearly inside the landing bin. O(n_bins) rows to
    the driver — constant, never corpus-sized."""
    rows = (
        spark.read.schema(_SCHEMA)
        .parquet(os.path.join(table_dir, "data"))
        .orderBy("bin")
        .collect()
    )
    counts = {r["bin"]: r["cnt"] for r in rows}
    total = sum(counts.values())
    width = (hi - lo) / n_bins
    out = []
    for p in probs:
        target = p * total
        seen = 0
        val = hi
        for b in range(n_bins):
            c = counts.get(b, 0)
            if c and seen + c >= target:
                frac = (target - seen) / c if c else 0.0
                val = lo + (b + frac) * width
                break
            seen += c
        out.append(val)
    return out
