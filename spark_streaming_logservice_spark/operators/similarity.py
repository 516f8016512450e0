"""Similarity search over the ``embeddings`` table (north-star §2.5).

- s01: brute-force cosine top-k — the correctness baseline. Query vectors are
  broadcast (tiny side), candidates stream through a single narrow projection;
  the dot product is a JVM-side ``zip_with``+``aggregate`` over
  ``array<double>`` (sequential accumulation ⇒ bit-reproducible against the
  oracle's equally sequential list_dot_product).
- s02: LSH-bucketed ANN (sign-pattern of leading dimensions = random-
  hyperplane LSH with axis-aligned planes). At 100 TB the bucket id is the
  shuffle/cluster key: candidates co-partition by cell, turning ANN into a
  per-bucket local top-k instead of an all-pairs cross join.

Scores are rounded to 6 decimals before ranking with a vec_id tie-break, so
ranking is stable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_streaming_logservice_spark.registry import query
from spark_streaming_logservice_spark.tables import load_table

N_QUERY = 5  # vec_id < N_QUERY are the query vectors
TOP_K = 5
N_PLANES = 8  # leading dims whose sign pattern forms the LSH cell


def _dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product (JVM, no Python)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    emb: DataFrame, queries: DataFrame, k: int = TOP_K
) -> DataFrame:
    """Brute-force cosine top-k of ``queries`` against ``emb`` (both with
    columns vec_id, embedding: array<double>)."""
    q = queries.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.round(
                _dot(F.col("q_emb"), F.col("n_emb"))
                / (_norm(F.col("q_emb")) * _norm(F.col("n_emb"))),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("n_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .orderBy("q_id", "rk")
    )


_DUCK_DOT = (
    "list_sum(list_transform(list_zip(a.emb, b.emb), x -> x[1] * x[2]))"
)
_DUCK_NORM_A = "sqrt(list_sum(list_transform(a.emb, x -> x * x)))"
_DUCK_NORM_B = "sqrt(list_sum(list_transform(b.emb, x -> x * x)))"


# --- s01: brute-force cosine top-k ----------------------------------------

@query(
    "s01_cosine_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ), scored AS (
      SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             round({_DUCK_DOT} / ({_DUCK_NORM_A} * {_DUCK_NORM_B}), 6) AS score
      FROM e a JOIN e b ON a.vec_id < {N_QUERY} AND b.vec_id <> a.vec_id
    ), ranked AS (
      SELECT q_id, n_id, score,
             row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rk
      FROM scored
    )
    SELECT q_id, n_id, score, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= {TOP_K}
    ORDER BY q_id, rk
    """,
)
def s01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return cosine_topk(e, e.where(F.col("vec_id") < N_QUERY)).select(
        "q_id", "n_id", "score", "rk"
    )


# --- s02: LSH-bucketed ANN -------------------------------------------------

def _duckdb_cell() -> str:
    terms = [
        f"(CASE WHEN emb[{i + 1}] > 0 THEN {2 ** i} ELSE 0 END)"
        for i in range(N_PLANES)
    ]
    return "(" + " + ".join(terms) + ")"


@query(
    "s02_ann_lsh_bucketed",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ), cells AS (
      SELECT vec_id, emb, {_duckdb_cell()} AS cell FROM e
    ), scored AS (
      SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             round({_DUCK_DOT} / ({_DUCK_NORM_A} * {_DUCK_NORM_B}), 6) AS score
      FROM cells a JOIN cells b ON a.cell = b.cell AND b.vec_id <> a.vec_id
      WHERE a.vec_id < {4 * N_QUERY}
    ), ranked AS (
      SELECT q_id, n_id, score,
             row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rk
      FROM scored
    )
    SELECT q_id, n_id, score, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= 3
    ORDER BY q_id, rk
    """,
)
def s02_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    cell = None
    for i in range(N_PLANES):
        term = F.when(F.element_at("emb", i + 1) > 0, F.lit(2**i)).otherwise(F.lit(0))
        cell = term if cell is None else cell + term
    cells = e.withColumn("cell", cell)
    a = cells.where(F.col("vec_id") < 4 * N_QUERY).alias("a")
    b = cells.alias("b")
    scored = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("b.vec_id") != F.col("a.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("q_id"),
            F.col("b.vec_id").alias("n_id"),
            F.round(
                _dot(F.col("a.emb"), F.col("b.emb"))
                / (_norm(F.col("a.emb")) * _norm(F.col("b.emb"))),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("n_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .orderBy("q_id", "rk")
    )


# --- s03: embedding-cosine near-duplicate pairs (bucketed) -----------------

@query(
    "s03_cosine_neardup_pairs",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ), cells AS (
      SELECT vec_id, emb, {_duckdb_cell()} AS cell FROM e
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round({_DUCK_DOT} / ({_DUCK_NORM_A} * {_DUCK_NORM_B}), 6) AS cosine
      FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine FROM pairs
    WHERE cosine >= 0.3
    ORDER BY cosine DESC, id_a, id_b
    LIMIT 100
    """,
)
def s03_cosine_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup (north-star dedup family): LSH cells bound
    the candidate set to same-bucket pairs — the all-pairs cross join never
    materializes, which is what makes this shape viable at 100 TB."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    cell = None
    for i in range(N_PLANES):
        term = F.when(F.element_at("emb", i + 1) > 0, F.lit(2**i)).otherwise(F.lit(0))
        cell = term if cell is None else cell + term
    cells = e.withColumn("cell", cell)
    a = cells.alias("a")
    b = cells.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(
                _dot(F.col("a.emb"), F.col("b.emb"))
                / (_norm(F.col("a.emb")) * _norm(F.col("b.emb"))),
                6,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.3)
        .orderBy(F.desc("cosine"), F.asc("id_a"), F.asc("id_b"))
        .limit(100)
    )


# --- s04: per-label embedding stats (array aggregation) --------------------

@query(
    "s04_label_norm_stats",
    oracle="""
    SELECT label,
           count(*) AS n,
           round(avg(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                  x -> x * x)))), 4) AS avg_norm,
           round(avg(list_sum(CAST(embedding AS DOUBLE[])) / len(embedding)), 6)
             AS avg_mean_component
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
)
def s04_label_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    return (
        e.select(
            "label",
            _norm(F.col("emb")).alias("nrm"),
            (
                F.aggregate(F.col("emb"), F.lit(0.0), lambda acc, x: acc + x)
                / F.size("emb")
            ).alias("mean_c"),
        )
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
            F.round(F.avg("mean_c"), 6).alias("avg_mean_component"),
        )
        .orderBy("label")
    )
