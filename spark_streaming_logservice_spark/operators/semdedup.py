"""Semantic deduplication (SemDeDup-style cluster-then-prune).

Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540): embed the corpus, k-means the
embeddings, and *within each cluster* drop every item whose cosine
similarity to a higher-priority cluster-mate exceeds a threshold. The
clustering is what makes this tractable — pairwise comparison happens only
inside cells, never across the corpus, so the pair count is
O(sum cell_size^2) instead of O(n^2).

Spark-first shape (reusing the IVF machinery from ann_ivf.py):
1. Train the coarse quantizer on a bounded id-prefix sample (O(sample) at
   any corpus size) — identical to the s05 pipeline, so the oracle can
   replay it exactly.
2. Assign every vector to its nearest cell: broadcast join against the
   k-row centroid relation + min_by — one corpus pass, row-local.
3. Self-join the index on ``cell`` (a shuffle hash join keyed by cell;
   with id_a < id_b only the triangle materializes) and flag every vector
   that has a lower-id cell-mate with round(cos, 6) >= threshold.
4. Left anti-style flag join back: output (vec_id, cell, is_kept).

100 TB notes: the number of cells must scale with the corpus (the paper
uses k ~ n/5000; here K_CELLS=16 matches the test SF) so per-cell pair
counts stay bounded — the shuffle key is ``cell`` and AQE's skew split
handles an oversized cell. The pruning decision needs only (vec_id, cell,
emb); nothing corpus-wide is broadcast. Determinism: the priority order is
vec_id ASC (the paper keeps a random item per dup-set; a fixed tie-break
is the reproducible equivalent), and all float paths are the bit-aligned
flat folds shared with s05 (see ann_ivf module docstring).

Reference parity: the reference engine has no semantic dedup; this is part
of the north-star training-data surface (brief: "embedding-cosine
near-dup" as a first-class component).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.operators.ann_ivf import (
    K_CELLS,
    N_ITERS,
    TRAIN_SAMPLE_IDS,
    _assign_top1,
    _centroids_df,
    _dot_flat,
    _normalized,
    train_centroids,
)
from spark_streaming_logservice_spark.registry import query
from spark_streaming_logservice_spark.tables import load_table

SEM_THRESHOLD = 0.30  # cosine cut; sits in the synthetic corpus's tail


def semantic_dedup(
    emb: DataFrame,
    k: int = K_CELLS,
    threshold: float = SEM_THRESHOLD,
    dim: int | None = None,
) -> DataFrame:
    """(vec_id, cell, is_kept): SemDeDup pruning over IVF cells.

    ``emb`` is (vec_id, emb array<double>), un-normalized. A vector is
    dropped when some lower-vec_id vector in the same cell has
    round(cosine, 6) >= threshold.
    """
    spark = emb.sparkSession
    if dim is None:
        dim = emb.limit(1).select(F.size("emb").alias("d")).first()["d"]
    sample = _normalized(
        emb.where(F.col("vec_id") < TRAIN_SAMPLE_IDS), dim
    ).localCheckpoint(eager=True)
    cents_df = _centroids_df(spark, train_centroids(sample, dim, k, N_ITERS))
    par = spark.sparkContext.defaultParallelism
    # NOTE (r14): deliberately NOT localCheckpoint'd — the self-join sides
    # and the flag join all reshuffle this subtree, and the A/B measured
    # the checkpointed variant SLOWER (3.06 s → 3.42 s): the assign stage
    # is one codegen'd broadcast-join pass, cheaper to recompute than to
    # materialize + rescan as an RDD.
    index = _assign_top1(
        _normalized(emb.repartition(par), dim), cents_df, dim, with_emb=True
    )
    # triangle self-join keyed by cell: only within-cell pairs materialize
    a = index.select(
        F.col("cell"), F.col("vec_id").alias("id_a"), F.col("emb").alias("emb_a")
    )
    b = index.select(
        F.col("cell"), F.col("vec_id").alias("id_b"), F.col("emb").alias("emb_b")
    )
    dup_ids = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.round(_dot_flat(F.col("emb_a"), F.col("emb_b"), dim), 6)
            >= F.lit(threshold)
        )
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return (
        index.select("vec_id", "cell")
        .join(dup_ids.withColumn("dup", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.coalesce(~F.col("dup"), F.lit(True)).alias("is_kept"),
        )
        .orderBy("vec_id")
    )


# The oracle replays the identical pipeline: the shared s05 CTE chain up to
# the full-corpus cell assignment (idx), then the within-cell triangle prune.
from spark_streaming_logservice_spark.operators.ann_ivf import _IVF_ITER  # noqa: E402

_S11_ORACLE = (
    """
    WITH raw AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    base AS (
        SELECT vec_id,
               list_transform(e, x -> x / sqrt(list_sum(list_transform(e, y -> y * y)))) AS emb
        FROM raw
    ),
    tbase AS (
        SELECT * FROM base WHERE vec_id < """
    + str(TRAIN_SAMPLE_IDS)
    + """
    ),
    seed AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
               emb AS cvec
        FROM tbase ORDER BY vec_id LIMIT """
    + str(K_CELLS)
    + """
    ),"""
    + _IVF_ITER.format(i=1, prev="seed")
    + ","
    + _IVF_ITER.format(i=2, prev="c1")
    + """,
    idx AS (
        SELECT vec_id, emb, cell FROM (
            SELECT b.vec_id, b.emb, s.cell,
                   row_number() OVER (
                       PARTITION BY b.vec_id
                       ORDER BY list_dot_product(b.emb, s.cvec) DESC, s.cell ASC
                   ) AS crk
            FROM base b CROSS JOIN c2 s
        ) WHERE crk = 1
    ),
    dup AS (
        SELECT DISTINCT b.vec_id
        FROM idx a JOIN idx b USING (cell)
        WHERE a.vec_id < b.vec_id
          AND round(list_dot_product(a.emb, b.emb), 6) >= """
    + str(SEM_THRESHOLD)
    + """
    )
    SELECT i.vec_id, i.cell, (d.vec_id IS NULL) AS is_kept
    FROM idx i LEFT JOIN dup d ON i.vec_id = d.vec_id
    ORDER BY i.vec_id
    """
)


@query("s11_semdedup", oracle=_S11_ORACLE)
def s11_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup verdict per vector: (vec_id, cell, is_kept)."""
    from spark_streaming_logservice_spark.operators.similarity import _probe_dim

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    return semantic_dedup(e, dim=_probe_dim(e, "emb", cache_key=sf_dir))


@query(
    "s12_semdedup_report",
    oracle=(
        _S11_ORACLE.replace(
            """
    SELECT i.vec_id, i.cell, (d.vec_id IS NULL) AS is_kept
    FROM idx i LEFT JOIN dup d ON i.vec_id = d.vec_id
    ORDER BY i.vec_id
    """,
            """
    SELECT i.cell,
           count(*) AS n_vectors,
           CAST(sum(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_pruned
    FROM idx i LEFT JOIN dup d ON i.vec_id = d.vec_id
    GROUP BY i.cell
    ORDER BY i.cell
    """,
        )
    ),
)
def s12_semdedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell prune report: (cell, n_vectors, n_pruned) — the summary a
    pipeline operator would monitor (prune rate per semantic cluster)."""
    from spark_streaming_logservice_spark.operators.similarity import _probe_dim

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    verdict = semantic_dedup(e, dim=_probe_dim(e, "emb", cache_key=sf_dir))
    return (
        verdict.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(F.when(F.col("is_kept"), 0).otherwise(1)).alias("n_pruned"),
        )
        .orderBy("cell")
    )
