"""Similarity search over `embeddings` (SURVEY.md §2.11 [ext]).

Brute-force cosine top-k as the correctness baseline, an IVF-bucketed
variant as the scale path, and cosine near-dup pairs.

Numeric discipline: everything is computed in float64 after an explicit
array<float> → array<double> cast; dot products are sequential left-to-right
folds in both engines, so the doubles match bit-for-bit. Similarities are
rounded to 6 decimals in the *output* (and ordering happens on the rounded
value with a deterministic id tie-break) purely to be robust against any
engine reassociating the fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register

_COS_SQL = "round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)"


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<double> columns — built-in
    higher-order functions only (zip_with + aggregate), fully JVM-side."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    nb = F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x)
    return dot / (F.sqrt(na) * F.sqrt(nb))


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    )


@register(
    "cosine_topk",
    oracle=f"""
        WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
        SELECT b.vec_id AS vec_id, {_COS_SQL.replace('a.embedding', 'q.embedding')} AS sim
        FROM embeddings b, q
        WHERE b.vec_id <> 0
        ORDER BY sim DESC, b.vec_id
        LIMIT 10
    """,
    tags=("ext-sim",),
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against a query vector (vec_id=0).

    The query vector is a one-row broadcast; the scan over candidates is
    embarrassingly parallel and the top-k is TakeOrderedAndProject (per-
    partition heaps). This is the exact baseline the IVF variant is measured
    against."""
    vecs = _vectors(spark, sf_dir)
    q = F.broadcast(vecs.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb")))
    sim = F.round(cosine(F.col("embedding"), F.col("q_emb")), 6)
    return (
        vecs.filter(F.col("vec_id") != 0)
        .crossJoin(q)
        .select("vec_id", sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(10)
    )


@register(
    "embedding_near_dup",
    oracle=f"""
        SELECT a.vec_id AS a_id, b.vec_id AS b_id, {_COS_SQL} AS sim
        FROM embeddings a
        JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {_COS_SQL} >= 0.45
    """,
    tags=("ext-sim", "ext-dedup"),
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim ≥ 0.45).

    Here: an O(n²) self-join — acceptable because `embeddings` is the dim-
    sized table in this harness (broadcast side). At real corpus scale the
    pair space must be bucketed first (LSH over random hyperplane signs —
    exactly the simhash machinery applied to embedding components) so the
    join is an equi-join on bucket keys; see ann_ivf_topk for the clustered
    variant of the same idea."""
    vecs = _vectors(spark, sf_dir)
    a = vecs.alias("a")
    b = F.broadcast(vecs.alias("b"))
    sim = F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6)
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("a_id"), F.col("b.vec_id").alias("b_id"), sim.alias("sim"))
        .filter(F.col("sim") >= 0.45)
    )


@register(
    "embedding_centroids",
    oracle="""
        SELECT label, pos - 1 AS pos,
               round(CAST(SUM(CAST(val AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*), 6)
                   AS mean_val
        FROM (
            SELECT label, unnest(embedding) AS val,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings
        )
        GROUP BY label, pos
    """,
    tags=("ext-sim",),
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (the centroid), long format (label, pos,
    mean_val) — the vector-aggregation building block behind k-means-style
    IVF training (``ivf_topk``'s docstring names sampled k-means as its
    scale path; one Lloyd iteration is exactly assign + THIS aggregate).

    Plan: posexplode to (label, pos, component) rows, then one partial+final
    hash aggregate on (label, pos) — the shuffle carries |labels|×dim
    pre-aggregated rows per partition, not vectors. Component sums go
    through DECIMAL(38,9) so the mean is order-independent (float addition
    is not associative; decimal is exact), then one double division and a
    6-decimal round shared with the oracle. At 100 TB the same shape holds:
    map-side combine reduces each partition to |labels|×dim rows before the
    exchange, and the result (≤10⁴ centroids × dim) broadcasts back for the
    next assignment pass."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("label", F.posexplode("embedding").alias("pos", "val"))
    mean_val = (
        F.sum(F.col("val").cast("decimal(38,9)")).cast("double") / F.count("*")
    )
    return e.groupBy("label", "pos").agg(F.round(mean_val, 6).alias("mean_val"))


N_CENTROIDS = 8
IVF_K = 5


def ivf_topk(spark: SparkSession, sf_dir: str, nprobe: int = 1) -> DataFrame:
    """IVF approximate nearest neighbor with a tunable probe width.

    Vectors are assigned to their nearest 'centroid' (deterministically:
    the first N_CENTROIDS vectors act as centroids); the query probes its
    ``nprobe`` nearest centroids' buckets and exact top-k runs inside the
    probed union. nprobe trades scanned fraction for recall:
    nprobe=N_CENTROIDS degenerates to exact brute force (tested), nprobe=1
    is the registered fast path. Measured on the harness embeddings
    (sf0.01, label-clustered): recall@5 = 1.0 already at nprobe=1 with
    ~1/8 of the table scanned — see PLANS.md for the sweep.

    At scale: centroids come from a sampled k-means (Spark ML KMeans), the
    assignment is a broadcast join against ≤10⁴ centroids, and the bucketed
    table is written partitioned by centroid_id so a probe touches nprobe
    partitions (partition pruning does the skipping)."""
    vecs = _vectors(spark, sf_dir)
    centroids = F.broadcast(
        vecs.filter(F.col("vec_id") < N_CENTROIDS).select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
        )
    )
    # assign: argmax cosine over centroids, deterministic tie-break.
    sim_c = F.round(cosine(F.col("embedding"), F.col("c_emb")), 9)
    ranked = (
        vecs.crossJoin(centroids)
        .select("vec_id", "embedding", "centroid_id", sim_c.alias("c_sim"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.col("c_sim").desc(), F.col("centroid_id"))
            ),
        )
    )
    assigned = ranked.filter(F.col("rn") == 1).select("vec_id", "embedding", "centroid_id")
    # the query's nprobe nearest centroids (one tiny ranked frame)
    q_probes = F.broadcast(
        ranked.filter((F.col("vec_id") == 0) & (F.col("rn") <= nprobe)).select(
            F.col("centroid_id").alias("q_centroid")
        )
    )
    q_emb = F.broadcast(
        vecs.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    )
    bucket = assigned.join(q_probes, assigned.centroid_id == F.col("q_centroid")).crossJoin(q_emb)
    sim = F.round(cosine(F.col("embedding"), F.col("q_emb")), 6)
    return (
        bucket.filter(F.col("vec_id") != 0)
        .select("vec_id", sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(IVF_K)
    )


@register(
    "ann_ivf_topk",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        centroids AS (
            SELECT vec_id AS centroid_id, emb AS c_emb
            FROM vecs WHERE vec_id < {N_CENTROIDS}
        ),
        ranked AS (
            SELECT v.vec_id, v.emb, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN centroids c
        ),
        assigned AS (SELECT vec_id, emb, centroid_id FROM ranked WHERE rn = 1),
        q_probes AS (SELECT centroid_id FROM ranked WHERE vec_id = 0 AND rn <= 1),
        q AS (SELECT emb AS q_emb FROM vecs WHERE vec_id = 0)
        SELECT a.vec_id AS vec_id,
               round(list_cosine_similarity(a.emb, q.q_emb), 6) AS sim
        FROM assigned a JOIN q_probes p ON a.centroid_id = p.centroid_id CROSS JOIN q
        WHERE a.vec_id <> 0
        ORDER BY sim DESC, a.vec_id
        LIMIT {IVF_K}
    """,
    tags=("ext-sim",),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered IVF fast path (nprobe=1) — see ivf_topk for the sweepable
    variant and the recall/cost contract.

    "Approximate" does not mean nondeterministic: every step (first-N
    centroid choice, rounded-cosine argmax assignment with id tie-break,
    probe selection, rounded output sims) is a deterministic function of
    the data, so DuckDB replays the SAME index construction and probe and
    hash-matches exactly. Recall vs exact brute force is separately pinned
    in tests/test_similarity.py."""
    return ivf_topk(spark, sf_dir, nprobe=1)
