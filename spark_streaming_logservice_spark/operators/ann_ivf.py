"""IVF (inverted-file) approximate nearest neighbor: coarse k-means
quantizer + probe-limited search, built from pure DataFrame operations.

The scale story (north-star §2.5 "IVF or LSH-bucketed variant as the scale
path"): brute force is O(queries × corpus); IVF assigns the corpus to k
coarse cells once, then each query scores only the vectors in its nprobe
closest cells — O(queries × corpus/k × nprobe).

Execution shape (shared with ann_pq.py, each choice measured — see git
history): the quantizer trains on a bounded id-prefix sample (classic IVF
practice; O(sample) at any corpus size, and the sample's single partition
keeps the Lloyd means' float-accumulation order bit-aligned with the
sequential oracle); centroids are k rows by construction and live on the
driver between steps (IEEE doubles survive collect/createDataFrame
round-trips unchanged) — a lazy centroid DataFrame would re-run the whole
training chain once per downstream use; cell assignment is a broadcast
join against the centroid LocalRelation + min_by aggregation, a
literal-free stable plan shape compiled once; FULL-WIDTH dot products and
norms use the HOF left fold (zip_with/aggregate/transform — bit-identical
to the flat expansion, O(1) expression tree; the flat 64-term tree cost
~0.5-1 s of Catalyst analysis per site per invocation, measured r9, and
the r5/r6 A/B showed HOF execution also wins at full width), while
SUBSPACE-width folds (ann_pq's dl=16 chunks) stay flat element_at
arithmetic inside whole-stage codegen — the regime where flat wins;
corpus-wide passes are row-local and repartition freely.

Determinism: centroids seed from the k lowest vec_ids; no RNG. Ranking by
score DESC, cell ASC is realized as min_by over a (-score, cell) struct —
IEEE negation is an exact sign flip, so the total order matches the
oracle's descending sort bit-for-bit. Scores round to 6 decimals with a
vec_id tie-break before the final ranking. The DuckDB oracle replays the
identical pipeline (sampled seeding, both Lloyd steps, probing, scoring);
tests/test_ann.py additionally pins literal rows vs a numpy
reimplementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_streaming_logservice_spark.registry import query
from spark_streaming_logservice_spark.tables import load_table

K_CELLS = 16
N_ITERS = 2
N_PROBE = 2
TOP_K = 3
N_QUERY = 5
TRAIN_SAMPLE_IDS = 4096  # id-prefix training sample bound


def _ss_flat(vec: Column, dim: int) -> Column:
    acc: Column = F.lit(0.0)
    for i in range(dim):
        x = F.element_at(vec, i + 1)
        acc = acc + x * x
    return acc


def _dot_flat(a: Column, b: Column, dim: int) -> Column:
    acc: Column = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.element_at(a, i + 1) * F.element_at(b, i + 1)
    return acc


def _dot_hof(a: Column, b: Column) -> Column:
    """Full-width dot product as zip_with + aggregate left fold —
    bit-identical to ``_dot_flat`` (((0+p₁)+p₂)+… in element order) with an
    O(1) expression tree; used at FULL vector width where the flat 64-term
    tree costs ~0.5 s of Catalyst analysis per site per invocation and the
    r5/r6 A/B showed HOF execution also wins (subspace-width folds stay
    flat)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _normalized(df: DataFrame, dim: int, vec_col: str = "emb") -> DataFrame:
    """(vec_id, emb) L2-normalized via the HOF left fold + per-element
    transform — bit-identical to the flat expansion (same ((0+x²)+x²)+…
    association, same per-element division), but the expression tree is
    O(1) instead of O(dim): the flat 64-wide form cost ~1 s of Catalyst
    ANALYSIS per invocation (measured r9 — dominating the stored-index
    serve path on a 5-row query side), exactly the full-width regime where
    the r5/r6 A/B already showed the HOF form winning at execution too.
    Subspace-width scoring (dl≤16 flat folds) stays flat — that's the
    regime flat wins."""
    nrm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    return df.select("vec_id", F.col(vec_col).alias("v"), nrm.alias("nrm")).select(
        "vec_id",
        F.transform(F.col("v"), lambda x: x / F.col("nrm")).alias("emb"),
    )


def _norm_py(vals: list[float]) -> list[float]:
    """Driver-side renormalization with the same left-fold / per-element
    division the engines use (never math.fsum)."""
    s = 0.0
    for v in vals:
        s = s + v * v
    n = s**0.5
    return [v / n for v in vals]


def _centroids_df(spark: SparkSession, cents: list[tuple[int, list[float]]]) -> DataFrame:
    return spark.createDataFrame(cents, "cell INT, cvec ARRAY<DOUBLE>")


def _assign_top1(
    base: DataFrame, cents_df: DataFrame, dim: int, with_emb: bool
) -> DataFrame:
    """Nearest cell per vector by score DESC, cell ASC. ``with_emb`` keeps
    the vector payload (needed by Lloyd means and by IVF-Flat candidate
    scoring).

    NOTE (r15 A/B, reverted): a row-local fold — all k centroids in ONE
    array-of-structs row, scored per input row with transform + array_min
    — removed the k× expansion and the groupBy exchange but measured
    SLOWER (s07 4.4 → 6.2 s, s05 3.4 → 3.7 s at sf0.1): HOF lambdas
    evaluate interpreted (~10× the codegen'd per-row cost, stage CPU 0.8
    → 8 s), and the deliberately single-partition training sample then
    pays that serially (its means stage went 0.1 → 0.95 s on one core).
    The broadcast-expand + partial-agg shape keeps scoring inside
    whole-stage codegen; partial aggregation collapses the k× rows
    map-side, so the exchange carries ~one row per vector either way."""
    scored = base.join(F.broadcast(cents_df), how="cross").select(
        "vec_id",
        *(["emb"] if with_emb else []),
        "cell",
        (-_dot_hof(F.col("emb"), F.col("cvec"))).alias("nscore"),
    )
    aggs = [
        F.min_by(F.col("cell"), F.struct(F.col("nscore"), F.col("cell"))).alias(
            "cell"
        )
    ]
    if with_emb:
        aggs.append(F.first("emb").alias("emb"))
    return scored.groupBy("vec_id").agg(*aggs)


def train_centroids(
    sample: DataFrame, dim: int, k: int, iters: int
) -> list[tuple[int, list[float]]]:
    """Lloyd steps over the (single-partition) sample; centroids round-trip
    through the driver exactly."""
    spark = sample.sparkSession
    seed_rows = sample.orderBy("vec_id").limit(k).collect()
    cents = [(cell, list(r["emb"])) for cell, r in enumerate(seed_rows)]
    for _ in range(iters):
        assigned = _assign_top1(sample, _centroids_df(spark, cents), dim, with_emb=True)
        means = (
            assigned.select("cell", F.posexplode("emb").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        # empty cells drop out, exactly like the groupBy does
        cents = [
            (cell, _norm_py([poses[p] for p in sorted(poses)]))
            for cell, poses in sorted(by_cell.items())
        ]
    return cents


def ivf_serve(
    index: DataFrame,
    cents_df: DataFrame,
    queries: DataFrame,
    dim: int,
    nprobe: int = N_PROBE,
    top_k: int = TOP_K,
) -> DataFrame:
    """The SERVING half of IVF — probe + score over an already-encoded
    index (vec_id, cell, emb-normalized) and trained centroids. Shared by
    the train-inline path below and the persisted index store
    (streaming/ann_index.py), which is what 100 TB serving actually runs:
    train once, encode incrementally, pay only this stage per query. All
    float ops are the same flat folds as training-time search, so results
    from a parquet-round-tripped index are bit-identical (IEEE doubles
    survive parquet exactly)."""
    qn = _normalized(queries, dim).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    # query → nprobe cells: queries are the small side, a window is fine
    qw = Window.partitionBy("q_id").orderBy(F.asc("nscore"), F.asc("cell"))
    q_cells = (
        qn.join(F.broadcast(cents_df), how="cross")
        .select(
            "q_id",
            "cell",
            (-_dot_hof(F.col("q_emb"), F.col("cvec"))).alias("nscore"),
        )
        .withColumn("crk", F.row_number().over(qw))
        .where(F.col("crk") <= nprobe)
        .select("q_id", "cell")
    )
    cand = q_cells.join(index, "cell").where(F.col("q_id") != F.col("vec_id"))
    scored = cand.join(F.broadcast(qn), "q_id").select(
        "q_id",
        F.col("vec_id").alias("n_id"),
        F.round(_dot_hof(F.col("q_emb"), F.col("emb")), 6).alias("score"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("n_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_k)
        .orderBy("q_id", "rk")
    )


def ivf_search(
    emb: DataFrame,
    queries: DataFrame,
    k: int = K_CELLS,
    nprobe: int = N_PROBE,
    top_k: int = TOP_K,
    dim: int | None = None,
) -> DataFrame:
    """Probe-limited ANN: score each query only against vectors whose cell is
    among the query's nprobe closest centroids. Pass ``dim`` when the caller
    already knows the embedding width — the 1-row probe is otherwise a
    whole Spark job per invocation."""
    spark = emb.sparkSession
    if dim is None:
        dim = emb.limit(1).select(F.size("emb").alias("d")).first()["d"]
    sample = _normalized(
        emb.where(F.col("vec_id") < TRAIN_SAMPLE_IDS), dim
    ).localCheckpoint(eager=True)
    cents_df = _centroids_df(spark, train_centroids(sample, dim, k, N_ITERS))
    # corpus pass: row-local, repartitions freely
    par = spark.sparkContext.defaultParallelism
    index = _assign_top1(
        _normalized(emb.repartition(par), dim), cents_df, dim, with_emb=True
    )
    return ivf_serve(index, cents_df, queries, dim, nprobe, top_k)


# The oracle replays the pipeline exactly: normalize, seed centroids from
# the K_CELLS lowest vec_ids of the training sample, two Lloyd steps
# (nearest-cell assignment by dot product, positional-mean update,
# renormalize), full-corpus assignment, nprobe=2 query cells, probe-limited
# scoring, top-3 per query.
_IVF_ITER = """
    a{i} AS (
        SELECT vec_id, emb, cell FROM (
            SELECT b.vec_id, b.emb, s.cell,
                   row_number() OVER (
                       PARTITION BY b.vec_id
                       ORDER BY list_dot_product(b.emb, s.cvec) DESC, s.cell ASC
                   ) AS crk
            FROM tbase b CROSS JOIN {prev} s
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

# raw → base (normalized) → trained centroids (c2) → full-corpus cell
# assignment (idx) → query set (qv): the pipeline prefix shared by s05's
# oracle and the stored-index serving oracles (streaming/ann_index.py
# s26), which replay the same training because the store's artifacts ARE
# this training's output, bit-for-bit.
_IVF_ORACLE_CORE = (
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
    qv AS (SELECT vec_id AS q_id, emb AS q_emb FROM base WHERE vec_id < """
    + str(N_QUERY)
    + """)"""
)

_S05_ORACLE = (
    _IVF_ORACLE_CORE
    + """,
    qc AS (
        SELECT q_id, cell FROM (
            SELECT q.q_id, c.cell,
                   row_number() OVER (
                       PARTITION BY q.q_id
                       ORDER BY list_dot_product(q.q_emb, c.cvec) DESC, c.cell ASC
                   ) AS crk
            FROM qv q CROSS JOIN c2 c
        ) WHERE crk <= """
    + str(N_PROBE)
    + """
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
    ) WHERE rk <= """
    + str(TOP_K)
    + """ ORDER BY q_id, rk
    """
)


@query("s05_ann_ivf", oracle=_S05_ORACLE)
def s05_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw IVF results (q_id, n_id, score, rk), fully oracle-backed: the
    DuckDB CTE chain above replays sampled seeding, both Lloyd steps,
    probing and scoring (see module docstring for why the float paths
    agree). tests/test_ann.py additionally pins the rows against a numpy
    reimplementation."""
    from spark_streaming_logservice_spark.operators.similarity import _probe_dim

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    return ivf_search(
        e,
        e.where(F.col("vec_id") < N_QUERY),
        dim=_probe_dim(e, "emb", cache_key=sf_dir),
    )


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
    """Driver-checkable IVF validation: every returned neighbor must sit
    inside the brute-force true top-10, computed in the same job
    (empirically the worst true rank is 4 with K_CELLS=16/nprobe=2). A
    broken quantizer, probe, or scoring path flips in_true_top10 /
    k_returned and fails the driver's hash check against the
    constant-structure oracle."""
    from spark_streaming_logservice_spark.operators.similarity import cosine_topk

    from spark_streaming_logservice_spark.operators.similarity import _probe_dim

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    q = e.where(F.col("vec_id") < N_QUERY)
    ivf = ivf_search(e, q, dim=_probe_dim(e, "emb", cache_key=sf_dir))
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
