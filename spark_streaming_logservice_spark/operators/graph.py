"""Distributed connected components for dedup clustering.

Near-duplicate detection (MinHash-LSH, SimHash, embedding cosine) emits
*pairs*; collapsing a corpus needs *clusters* — the transitive closure of
those pairs — so one canonical document survives per duplicate group. This
module provides that closure as a DataFrame-native operator.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi, Mirrokni,
Rastogi, Vassilvitskii — "Connected Components in MapReduce and Beyond",
ACM SoCC 2014). Each round is a constant number of hash shuffles on node id
and the edge set converges to star graphs (every node pointing at its
component's minimum id) in O(log^2 n) rounds — in practice a handful, even
on path-shaped graphs where naive label propagation needs O(diameter)
rounds.

Design for 100 TB:
- Per round: one window shuffle per star op plus a distinct; all expressions
  are built-in (whole-stage codegen), nothing leaves the JVM.
- The driver loop carries only a 2-value convergence checksum per round —
  edges themselves never visit the driver.
- ``localCheckpoint`` after each round truncates lineage, so plan size and
  task binary size stay constant across iterations (an unbounded iterative
  plan is the classic Spark iterative-algorithm failure mode).
- Degree skew: a high-degree node makes one hot window partition. Upstream
  LSH bucket caps (operators/dedup.py d04) bound degree by construction;
  for arbitrary graphs the large-star step itself is the paper's remedy —
  it detaches large neighborhoods onto the minimum in one round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star: for every node u, connect each strictly-larger neighbor
    to min(N(u) ∪ {u}). Emitted edges always point high→low."""
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    w = Window.partitionBy("src")
    m = F.least(F.min("dst").over(w), F.col("src"))
    return (
        sym.withColumn("m", m)
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: orient edges high→low; for every node u, connect u and
    each smaller neighbor to min(N(u) ∪ {u})."""
    ori = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    w = Window.partitionBy("src")
    annotated = ori.select(
        "src",
        "dst",
        F.min("dst").over(w).alias("m"),
        F.row_number().over(Window.partitionBy("src").orderBy("dst")).alias("rn"),
    )
    nbrs = annotated.where(F.col("dst") != F.col("m")).select(
        F.col("dst").alias("src"), F.col("m").alias("dst")
    )
    selfe = annotated.where(F.col("rn") == 1).select(
        F.col("src"), F.col("m").alias("dst")
    )
    return nbrs.union(selfe).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``, where
    ``component`` is the minimum node id of its connected component.

    Nodes with no edges don't appear in the input and therefore don't appear
    in the output — callers treat absent nodes as singleton components.

    Raises ``RuntimeError`` if the edge set hasn't reached a fixed point
    after ``max_iterations`` alternating rounds (the paper's bound makes
    this unreachable for any real graph; the guard catches driver bugs).
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev: tuple | None = None
    for _ in range(max_iterations):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # Convergence = unchanged edge set; (count, order-independent hash)
        # is a 2-value fingerprint, so the driver never sees the edges.
        # bit_xor (not sum) keeps the fold overflow-free under ANSI mode.
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
        ).first()
        chk = (row["n"], row["h"])
        if chk == prev:
            break
        prev = chk
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )
    # Fixed point is a star graph: (v, min) for every non-root v; roots map
    # to themselves.
    return (
        e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
        .union(e.select(F.col("dst").alias("node"), F.col("dst").alias("component")))
        .distinct()
    )
