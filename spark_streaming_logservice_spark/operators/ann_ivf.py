"""IVF (inverted-file) approximate nearest neighbor: coarse k-means
quantizer + probe-limited search, built from pure DataFrame operations.

The scale story (north-star §2.5 "IVF or LSH-bucketed variant as the scale
path"): brute force is O(queries × corpus); IVF assigns the corpus to k
coarse cells once (iterative Lloyd steps, each one shuffle), then each query
scores only the vectors in its nprobe closest cells — O(queries × corpus/k ×
nprobe). Everything is JVM-side array arithmetic (zip_with/aggregate); the
only state between iterations is a k-row centroid table, collected and
rebroadcast (k is tiny by construction, so the driver round-trip is the
correct plan, not a shortcut).

Deterministic: centroids seed from the k lowest vec_ids; no RNG.
Oracle-backed since round 3: the DuckDB oracle replays the identical
pipeline as a CTE chain — seed = k lowest vec_ids, each Lloyd step is a
positional-explode groupBy mean renormalized, assignment/probing are
row_number over centroid dot products. Both engines accumulate dot products
and norms sequentially over the list (zip_with+aggregate vs
list_dot_product/list_sum), and scores are rounded to 6 decimals with a
vec_id tie-break before ranking, so ranking is stable across engines.
tests/test_ann.py additionally pins literal rows vs a numpy reimplementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_streaming_logservice_spark.operators.similarity import _dot, _norm, cosine_topk
from spark_streaming_logservice_spark.registry import query
from spark_streaming_logservice_spark.tables import load_table

K_CELLS = 16
N_ITERS = 2
N_PROBE = 2
TOP_K = 3
N_QUERY = 5


def _normalize(col: Column) -> Column:
    n = _norm(col)
    return F.transform(col, lambda x: x / n)


def build_ivf_index(emb: DataFrame, k: int = K_CELLS, iters: int = N_ITERS) -> DataFrame:
    """Assign every vector to a coarse cell. Returns (vec_id, emb, cell)."""
    base = emb.select("vec_id", _normalize(F.col("emb")).alias("emb"))
    # deterministic seed: k lowest ids
    centroids = (
        base.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("cell"),
            F.col("emb").alias("cvec"),
        )
    )
    for _ in range(iters):
        assigned = _assign(base, centroids)
        # Lloyd update: element-wise mean per cell, renormalized.
        pos = assigned.select(
            "cell", F.posexplode("emb").alias("pos", "val")
        )
        means = (
            pos.groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("m")))
                ).alias("pm")
            )
            .select(
                "cell",
                F.transform(F.col("pm"), lambda s: s.getField("m")).alias("cvec"),
            )
        )
        centroids = means.select("cell", _normalize(F.col("cvec")).alias("cvec"))
    return _assign(base, centroids), centroids


def _assign(base: DataFrame, centroids: DataFrame, rank: int = 1) -> DataFrame:
    """Nearest-centroid assignment (top-``rank`` cells per vector)."""
    scored = base.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "emb",
        "cell",
        _dot(F.col("emb"), F.col("cvec")).alias("cscore"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cscore"), F.asc("cell"))
    out = scored.withColumn("crk", F.row_number().over(w)).where(F.col("crk") <= rank)
    if rank == 1:
        return out.select("vec_id", "emb", "cell")
    return out.select("vec_id", "emb", "cell", "crk")


def ivf_search(
    emb: DataFrame,
    queries: DataFrame,
    k: int = K_CELLS,
    nprobe: int = N_PROBE,
    top_k: int = TOP_K,
) -> DataFrame:
    """Probe-limited ANN: score each query only against vectors whose cell is
    among the query's nprobe closest centroids."""
    index, centroids = build_ivf_index(emb, k)
    qn = queries.select(
        F.col("vec_id").alias("q_id"), _normalize(F.col("emb")).alias("q_emb")
    )
    # query → nprobe cells
    q_cells = (
        _assign(
            qn.select(F.col("q_id").alias("vec_id"), F.col("q_emb").alias("emb")),
            centroids,
            rank=nprobe,
        )
        .select(F.col("vec_id").alias("q_id"), "cell")
    )
    cand = q_cells.join(index, "cell").where(F.col("q_id") != F.col("vec_id"))
    scored = cand.join(F.broadcast(qn), "q_id").select(
        "q_id",
        F.col("vec_id").alias("n_id"),
        F.round(_dot(F.col("q_emb"), F.col("emb")), 6).alias("score"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("n_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_k)
        .orderBy("q_id", "rk")
    )


# The oracle replays build_ivf_index + ivf_search exactly: normalize, seed
# centroids from the K_CELLS lowest vec_ids, two Lloyd steps (nearest-cell
# assignment by dot product, positional-mean update, renormalize), final
# assignment, nprobe=2 query cells, probe-limited scoring, top-3 per query.
_IVF_ITER = """
    a{i} AS (
        SELECT vec_id, emb, cell FROM (
            SELECT b.vec_id, b.emb, s.cell,
                   row_number() OVER (
                       PARTITION BY b.vec_id
                       ORDER BY list_dot_product(b.emb, s.cvec) DESC, s.cell ASC
                   ) AS crk
            FROM base b CROSS JOIN {prev} s
        ) WHERE crk = 1
    ),
    m{i} AS (
        SELECT cell, pos, avg(val) AS m
        FROM (SELECT cell, unnest(emb) AS val,
                     unnest(range(1, len(emb) + 1)) AS pos
              FROM a{i})
        GROUP BY cell, pos
    ),
    c{i} AS (
        SELECT cell,
               list_transform(cv, x -> x / sqrt(list_sum(list_transform(cv, y -> y * y)))) AS cvec
        FROM (SELECT cell, list(m ORDER BY pos) AS cv FROM m{i} GROUP BY cell)
    )"""

_S05_ORACLE = (
    """
    WITH raw AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    base AS (
        SELECT vec_id,
               list_transform(e, x -> x / sqrt(list_sum(list_transform(e, y -> y * y)))) AS emb
        FROM raw
    ),
    seed AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
               emb AS cvec
        FROM base ORDER BY vec_id LIMIT 16
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
    qv AS (SELECT vec_id AS q_id, emb AS q_emb FROM base WHERE vec_id < 5),
    qc AS (
        SELECT q_id, cell FROM (
            SELECT q.q_id, c.cell,
                   row_number() OVER (
                       PARTITION BY q.q_id
                       ORDER BY list_dot_product(q.q_emb, c.cvec) DESC, c.cell ASC
                   ) AS crk
            FROM qv q CROSS JOIN c2 c
        ) WHERE crk <= 2
    ),
    cand AS (
        SELECT qc.q_id, i.vec_id AS n_id,
               round(list_dot_product(qv.q_emb, i.emb), 6) AS score
        FROM qc JOIN idx i USING (cell) JOIN qv USING (q_id)
        WHERE qc.q_id <> i.vec_id
    )
    SELECT q_id, n_id, score, rk FROM (
        SELECT q_id, n_id, score,
               row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id ASC) AS rk
        FROM cand
    ) WHERE rk <= 3 ORDER BY q_id, rk
    """
)


@query("s05_ann_ivf", oracle=_S05_ORACLE)
def s05_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw IVF results (q_id, n_id, score, rk), fully oracle-backed: the
    DuckDB CTE chain above replays seeding, both Lloyd steps, probing and
    scoring (see module docstring for why the float paths agree).
    tests/test_ann.py additionally pins the rows against a numpy
    reimplementation."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    return ivf_search(e, e.where(F.col("vec_id") < N_QUERY))


@query(
    "s06_ann_ivf_recall",
    oracle="""
    SELECT vec_id AS q_id,
           CAST(3 AS BIGINT) AS k_returned,
           TRUE AS in_true_top10
    FROM embeddings WHERE vec_id < 5 ORDER BY q_id
    """,
)
def s06_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable IVF validation. The approximate neighbor list itself
    can't be SQL-oracled (k-means is iterative), so this query instead
    asserts the property that makes IVF *useful*: every returned neighbor
    must sit inside the brute-force true top-10, computed in the same job
    (empirically the worst true rank is 4 with K_CELLS=16/nprobe=2). A broken
    quantizer, probe, or scoring path flips in_true_top10 / k_returned and
    fails the driver's hash check against the constant-structure oracle."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    q = e.where(F.col("vec_id") < N_QUERY)
    ivf = ivf_search(e, q)
    truth = cosine_topk(
        e.select("vec_id", F.col("emb").alias("embedding")),
        q.select("vec_id", F.col("emb").alias("embedding")),
        k=10,
    ).select("q_id", "n_id", F.lit(True).alias("hit"))
    return (
        ivf.join(truth, ["q_id", "n_id"], "left")
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("k_returned"),
            F.bool_and(F.coalesce(F.col("hit"), F.lit(False))).alias("in_true_top10"),
        )
        .orderBy("q_id")
    )
