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


# --- g01: PageRank (fixed-iteration, oracle-checkable) ---------------------
# The canonical iterative join-aggregate workload. Spark-first shape per
# iteration: edges ⋈ ranks on src (hash shuffle), groupBy dst (partial agg),
# left join back to the node set — three stages, all codegen'd. The edge
# relation is cached once and reused across iterations; ranks are
# localCheckpoint'd per round so the plan (and task binaries) stay O(1) in
# the iteration count instead of growing a lineage chain.
#
# 100 TB notes: ranks is O(nodes) and edges O(edges); neither is collected
# or broadcast. Degree skew (a celebrity node) makes one hot reduce key in
# the contribution agg — partial aggregation absorbs it map-side because
# the key space is nodes, the classic wordcount bound. Deterministic at the
# oracle level: contributions are summed doubles, so parity holds at 4-dp
# rounding (same discipline as the jaccard/cosine operators).

def pagerank(edges: DataFrame, iterations: int = 3, damping: float = 0.85,
             checkpoint: bool = True, cleanup: bool = True) -> DataFrame:
    """(node, pr) after ``iterations`` synchronous updates of
    pr(v) = (1-d) + d * Σ_{u→v} pr(u)/outdeg(u), pr₀ = 1.0.
    Dangling-node mass is dropped (both engines implement the same formula,
    so parity is exact).

    ``cleanup=True`` (default) eagerly materializes the final ranks and
    unpersists the loop-invariant edge/node caches before returning —
    otherwise every invocation leaks two cached relations into the session
    until LRU eviction (and repeated calls accumulate distinct entries).
    Pass ``cleanup=False`` to keep the caches when the caller will iterate
    further (and own the unpersist)."""
    F_ = F
    edges = edges.select("src", "dst").distinct()
    nodes = (
        edges.select(F_.col("src").alias("node"))
        .union(edges.select(F_.col("dst").alias("node")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F_.count(F_.lit(1)).alias("outdeg"))
    # edge+outdeg is the loop-invariant relation: cache it once
    ed = edges.join(deg, "src").select("src", "dst", "outdeg")
    ed = ed.persist()
    nodes = nodes.persist()
    ranks = nodes.select("node", F_.lit(1.0).alias("pr"))
    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(F_.col("dst").alias("node"), (F_.col("pr") / F_.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F_.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F_.lit(1.0 - damping)
                    + F_.lit(damping) * F_.coalesce(F_.col("inflow"), F_.lit(0.0))
                ).alias("pr"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    if cleanup:
        # eager checkpoint pins the result (O(nodes) rows) so the caches it
        # was computed from can be released immediately
        ranks = ranks.localCheckpoint(eager=True)
        ed.unpersist()
        nodes.unpersist()
    return ranks


def _supplier_customer_edges(spark, sf_dir):
    from spark_streaming_logservice_spark.tables import load_table

    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )


def _register_g01() -> None:
    from pyspark.sql import SparkSession

    from spark_streaming_logservice_spark.registry import query

    _PR_ITER = """
      SELECT n.node,
             CAST(0.15 AS DOUBLE)
             + CAST(0.85 AS DOUBLE) * coalesce(sum(p.pr / d.outdeg), 0) AS pr
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN deg d ON d.src = e.src
      LEFT JOIN {prev} p ON p.node = e.src
      GROUP BY n.node
    """

    oracle = f"""
    WITH edges AS (
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                      'c' || CAST(o_custkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), deg AS (
      SELECT src, count(*) AS outdeg FROM edges GROUP BY src
    ), pr0 AS (
      SELECT node, CAST(1.0 AS DOUBLE) AS pr FROM nodes
    ), pr1 AS ({_PR_ITER.format(prev="pr0")}
    ), pr2 AS ({_PR_ITER.format(prev="pr1")}
    ), pr3 AS ({_PR_ITER.format(prev="pr2")})
    SELECT node, round(pr, 4) AS pagerank
    FROM pr3 ORDER BY pagerank DESC, node LIMIT 20
    """

    @query("g01_pagerank", oracle=oracle)
    def g01_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
        """3-iteration PageRank over the supplier→customer ship graph.
        Checkpointing disabled here: at 3 iterations the lineage is small,
        and the driver re-plans the query from scratch per run."""
        edges = _supplier_customer_edges(spark, sf_dir)
        ranks = pagerank(edges, iterations=3, checkpoint=False)
        return (
            ranks.select("node", F.round("pr", 4).alias("pagerank"))
            .orderBy(F.desc("pagerank"), F.asc("node"))
            .limit(20)
        )


_register_g01()
