"""Similarity search over `embeddings` (SURVEY.md §2.11 [ext]).

Brute-force cosine top-k as the correctness baseline, an IVF-bucketed
variant as the scale path, and cosine near-dup pairs via random-hyperplane
LSH (band-key equi-join candidates + exact verify — never all-pairs).

Numeric discipline: everything is computed in float64 after an explicit
array<float> → array<double> cast; dot products are sequential left-to-right
folds in both engines, so the doubles match bit-for-bit. Similarities are
rounded to 6 decimals in the *output* (and ordering happens on the rounded
value with a deterministic id tie-break) purely to be robust against any
engine reassociating the fold.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

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


# ---------------------------------------------------------------------------
# Embedding near-dup via random-hyperplane LSH
# ---------------------------------------------------------------------------
#
# Candidate generation must never be an all-pairs join: pairs come from an
# equi-join on (band, band_key) over sign-bit signatures, then only the
# candidates pay an exact cosine verify. Determinism across engines is
# guaranteed by doing the projection in scaled-integer arithmetic:
#
#   b_p     = floor(v_p * 10^6)        -- one float64 multiply + floor,
#                                         bit-identical in Spark and DuckDB
#   proj_j  = Σ_p w_jp * b_p           -- exact int64 sum, order-independent
#   bit_j   = 1 iff proj_j >= 0
#
# with Rademacher planes w_jp ∈ {±1} derived from md5(f"hp:{j}:{p}") — a
# recipe DuckDB replays verbatim, so the oracle rebuilds the SAME index and
# the result hash-matches by construction (the same contract as
# minhash_lsh_dedup, plans/dedup.py:333).

EMB_DIM = 64
#: Harness configuration: the synthetic near-dup pairs sit at cosine
#: 0.45–0.6 — a low-similarity regime that needs wide OR-amplification.
#: The registered band shape is chosen by lsh_params(NEAR_DUP_TAU,
#: NEAR_DUP_RECALL_TARGET) below, not hardcoded; LSH_BANDS/LSH_RBITS
#: remain the documented default shape for direct API calls. Production
#: near-dup thresholds (τ ≥ 0.8) invert the trade: fewer/longer bands —
#: 8 bands × 16 bits touches 0.03% of the pair space on the same data
#: (pinned in tests/test_similarity.py).
LSH_BANDS = 64
LSH_RBITS = 8
NEAR_DUP_TAU = 0.45
NEAR_DUP_RECALL_TARGET = 0.95
_COMP_SCALE = 1_000_000


def lsh_params(
    threshold: float, target_recall: float = 0.95, max_planes: int = 1024
) -> tuple[int, int]:
    """Pick (bands, rbits) for hyperplane LSH from the cosine threshold.

    Collision theory: two vectors at cosine s agree on one sign bit with
    p = 1 − arccos(s)/π, on an r-bit band with p^r, and survive b bands
    with 1 − (1−p^r)^b. For each band width r (longest first — longer
    bands mean fewer random collisions, so the 2^r keyspace prunes the
    pair space harder) take the smallest b reaching ``target_recall`` at
    the threshold; accept the first (b, r) within the plane budget.
    Low thresholds force wide OR-amplification (τ=0.45 → 64×8-ish, ~24%
    of the pair space exactly verified); production near-dup thresholds
    invert it (τ=0.9 → a handful of 16-bit bands, <0.1%)."""
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    for rbits in (16, 12, 8, 6, 4):
        p_band = p**rbits
        if p_band <= 0.0:
            continue
        if p_band >= 1.0:
            # threshold=1.0 → exact duplicates collide on every band with
            # certainty; one band of this width already has recall 1
            return 1, rbits
        b = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_band))
        if b * rbits <= max_planes:
            return b, rbits
    return max_planes // 4, 4


@lru_cache(maxsize=8)
def _hyperplanes(n_planes: int, dim: int = EMB_DIM) -> np.ndarray:
    """Deterministic ±1 hyperplanes: w[j,p] = +1 iff the first hex char of
    md5(f"hp:{j}:{p}") is even. DuckDB regenerates the identical matrix via
    strpos('02468ace', substr(md5(...), 1, 1)) > 0."""
    w = np.empty((n_planes, dim), dtype=np.int64)
    for j in range(n_planes):
        for p in range(dim):
            first = hashlib.md5(f"hp:{j}:{p}".encode()).hexdigest()[0]
            w[j, p] = 1 if int(first, 16) % 2 == 0 else -1
    return w


def _band_keys_udf(bands: int, rbits: int):
    """Arrow-batched signature stage: an exact int64 matmul over the plane
    matrix per batch (the one place numpy genuinely beats 512 codegen'd
    aggregate expressions), returning the per-band keys as array<long>."""
    w = _hyperplanes(bands * rbits)
    weights = 1 << np.arange(rbits, dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def band_keys(comps: pd.Series) -> pd.Series:
        if comps.empty:
            return pd.Series([], dtype=object)
        b = np.vstack(comps.to_numpy()).astype(np.int64)  # (batch, dim)
        bits = (b @ w.T >= 0).astype(np.int64)  # (batch, planes)
        keys = bits.reshape(len(b), bands, rbits) @ weights
        return pd.Series(list(keys))

    return band_keys


def _band_sigs(spark: SparkSession, sf_dir: str, bands: int, rbits: int) -> DataFrame:
    """(vec_id, band, key) — one row per vector per band. The signature pass
    is embarrassingly parallel (no shuffle): scan → scaled-int transform →
    Arrow matmul → posexplode."""
    vecs = _vectors(spark, sf_dir)
    comps = F.transform(
        F.col("embedding"), lambda x: F.floor(x * F.lit(float(_COMP_SCALE))).cast("long")
    )
    keys = _band_keys_udf(bands, rbits)(comps)
    return vecs.select("vec_id", F.posexplode(keys).alias("band", "key"))


def lsh_candidates(
    spark: SparkSession, sf_dir: str, bands: int = LSH_BANDS, rbits: int = LSH_RBITS
) -> DataFrame:
    """Distinct candidate pairs (a_id < b_id) from the band-key equi-join.
    The shuffle carries (vec_id, band, key) triples — never embeddings —
    and the join is hash/sort-merge on (band, key), never a nested loop.
    The signature table is persisted and materialized first: the Arrow
    matmul is the dominant stage and a self-join would otherwise compute
    it once per side (same pattern as the simhash band table)."""
    sigs = _band_sigs(spark, sf_dir, bands, rbits).persist()
    sigs.count()
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("a_id"), F.col("b.vec_id").alias("b_id"))
        .distinct()
    )


def hyperplane_near_dup(
    spark: SparkSession,
    sf_dir: str,
    bands: int = LSH_BANDS,
    rbits: int = LSH_RBITS,
    threshold: float = NEAR_DUP_TAU,
) -> DataFrame:
    """LSH candidates → join embeddings back by id → exact JVM-side cosine
    verify at ``threshold``. At 100 TB the join-backs are two key shuffles
    sized by the candidate set (already deduped across bands), and the
    signature table would be materialized once instead of recomputed per
    self-join side."""
    cand = lsh_candidates(spark, sf_dir, bands, rbits)
    vecs = _vectors(spark, sf_dir).select("vec_id", "embedding")
    sim = F.round(cosine(F.col("ea.embedding"), F.col("eb.embedding")), 6)
    return (
        cand.join(vecs.alias("ea"), F.col("a_id") == F.col("ea.vec_id"))
        .join(vecs.alias("eb"), F.col("b_id") == F.col("eb.vec_id"))
        .select("a_id", "b_id", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def exact_near_dup(spark: SparkSession, sf_dir: str, threshold: float = NEAR_DUP_TAU) -> DataFrame:
    """Brute-force all-pairs ground truth — test-only (recall pinning in
    tests/test_similarity.py). Deliberately NOT registered: the broadcast
    O(n²) self-join is exactly the shape the registered operator exists to
    avoid."""
    vecs = _vectors(spark, sf_dir)
    a = vecs.alias("a")
    b = F.broadcast(vecs.alias("b"))
    sim = F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6)
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("a_id"), F.col("b.vec_id").alias("b_id"), sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


#: Planner-chosen band shape for the registered query: the production-τ
#: knob in action. At τ=0.45 with a 0.95 recall target the planner lands
#: on a wide-OR shape (95×8 under the 1024-plane budget); raising τ to a
#: production 0.9 would flip it to a handful of 16-bit bands with no code
#: change — the whole point of deriving (b, r) instead of freezing it.
_PLAN_BANDS, _PLAN_RBITS = lsh_params(NEAR_DUP_TAU, NEAR_DUP_RECALL_TARGET)
_N_PLANES = _PLAN_BANDS * _PLAN_RBITS


@register(
    "embedding_near_dup",
    oracle=f"""
        WITH comps AS (
            SELECT vec_id,
                   generate_subscripts(embedding, 1) - 1 AS p,
                   CAST(floor(unnest(embedding::DOUBLE[]) * {_COMP_SCALE}) AS BIGINT) AS b
            FROM embeddings
        ),
        planes AS (
            SELECT j, p,
                   CASE WHEN strpos('02468ace',
                                    substr(md5('hp:' || CAST(j AS VARCHAR) || ':'
                                               || CAST(p AS VARCHAR)), 1, 1)) > 0
                        THEN 1 ELSE -1 END AS w
            FROM range({_N_PLANES}) t1(j) CROSS JOIN range({EMB_DIM}) t2(p)
        ),
        bits AS (
            SELECT c.vec_id, pl.j,
                   CASE WHEN SUM(pl.w * c.b) >= 0 THEN 1 ELSE 0 END AS bit
            FROM comps c JOIN planes pl ON pl.p = c.p
            GROUP BY c.vec_id, pl.j
        ),
        bandkeys AS (
            SELECT vec_id, j // {_PLAN_RBITS} AS band,
                   SUM(bit * (1 << (j % {_PLAN_RBITS}))) AS key
            FROM bits GROUP BY vec_id, j // {_PLAN_RBITS}
        ),
        cand AS (
            SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
            FROM bandkeys a
            JOIN bandkeys b ON a.band = b.band AND a.key = b.key
                           AND a.vec_id < b.vec_id
        )
        SELECT c.a_id, c.b_id,
               round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                            eb.embedding::DOUBLE[]), 6) AS sim
        FROM cand c
        JOIN embeddings ea ON ea.vec_id = c.a_id
        JOIN embeddings eb ON eb.vec_id = c.b_id
        WHERE round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                           eb.embedding::DOUBLE[]), 6) >= {NEAR_DUP_TAU}
    """,
    tags=("ext-sim", "ext-dedup"),
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim ≥ NEAR_DUP_TAU) via
    random-hyperplane LSH: sign-bit signatures over deterministic
    md5-derived Rademacher planes, banded (b, r) as chosen by the
    lsh_params planner from (NEAR_DUP_TAU, NEAR_DUP_RECALL_TARGET) — not
    hardcoded — then equi-join on band keys and exact cosine verify inside
    the candidate set only. The oracle is generated with the same
    planner-chosen shape, so the two engines always rebuild the same
    index. "Approximate" ≠ nondeterministic: every stage is integer-exact;
    recall vs brute force is pinned separately in tests/test_similarity.py."""
    return hyperplane_near_dup(spark, sf_dir, bands=_PLAN_BANDS, rbits=_PLAN_RBITS)


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


def kmeans_step(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """One Lloyd iteration over (vec_id, embedding) given (centroid_id,
    c_emb): broadcast argmax-cosine assignment (rounded to 9 decimals with
    centroid-id tie-break — deterministic), then decimal-exact element-wise
    means re-assembled into vectors. Empty clusters drop (standard Lloyd
    choice); centroid ids keep their original labels.

    Scale shape: the assignment is vectors × broadcast(≤10⁴ centroids) with
    no shuffle of the fact side; the mean is posexplode → partial+final
    hash agg carrying |centroids|×dim pre-aggregated rows per partition
    (the embedding_centroids block); the result is centroid-count sized and
    broadcasts back for the next pass."""
    sim_c = F.round(cosine(F.col("embedding"), F.col("c_emb")), 9)
    ranked = (
        vectors.crossJoin(F.broadcast(centroids))
        .select("vec_id", "embedding", "centroid_id", sim_c.alias("c_sim"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.col("c_sim").desc(), F.col("centroid_id"))
            ),
        )
    )
    assigned = ranked.filter(F.col("rn") == 1).select("embedding", "centroid_id")
    means = (
        assigned.select("centroid_id", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("centroid_id", "pos")
        .agg(
            (F.sum(F.col("val").cast("decimal(38,9)")).cast("double") / F.count("*")).alias("m")
        )
    )
    return (
        means.groupBy("centroid_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("centroid_id", F.transform("pm", lambda s: s["m"]).alias("c_emb"))
    )


def kmeans_train(
    vectors: DataFrame, k: int | None = None, n_iters: int = 2, init: str = "first"
) -> DataFrame:
    """Deterministic k-means with three seeding strategies — all RNG-free,
    so any index built from any of them is exactly reproducible:

    - ``"first"``: the first k ids — the registered IVF contract's seed
      (trivially replayable in the SQL oracles).
    - ``"sample"``: a deterministic uniform draw (rank by md5(vec_id),
      take k via TakeOrdered — never a global sort) — the production
      trainer's seed shape, independent of id order.
    - ``"farthest"``: deterministic farthest-point (k-center) seeding —
      md5-min start, then greedily add the vector farthest (min-cosine
      to the chosen set, ties by vec_id) k−1 times; one broadcast-scan
      pass per seed (k-means|| is the O(log k)-pass production variant
      of the same idea).

    What the seed comparison MEASURED (tests pin it; numbers at
    sf0.001, k=8, 2 Lloyd steps, nprobe=1 recall@5): first-k 0.875,
    sample 0.375, farthest 0.325 — and neither more iterations, more
    centroids (k=16 ≥ the 10 modes), nor k-center coverage recovers the
    first-k number. The 0.875 is partly an EVALUATION COINCIDENCE, not
    a seeding win: the recall probes query vec_ids 0..7, which under
    the first-k seed are the initial centroids themselves — each
    query's neighborhood starts centered on the query. With any
    independent seed, single-probe recall sits at the boundary-loss
    floor and climbs the nprobe curve exactly as IVF theory says
    (sample seed: 0.375 → 0.525 → 0.65 → 0.70 at nprobe 1..4). The
    operational lessons, recorded here so nobody "fixes" the seed
    chasing the coincidence: (a) size nprobe from a measured
    recall curve whose query set is NOT the seed set — that curve is
    now REGISTERED as ``ann_recall_honest`` (sample seed, disjoint
    queries, nprobe 1..4; driver-hash-pinned per round: 0.225 → 0.65
    mean recall@5 at sf0.01 under auto-k), so serving guidance reads
    the honest number from the artifact, not the coincidental 0.875 —
    and ``ann_recall_lloyd`` pins the same curve after ONE Lloyd step
    (0.20 → 0.525 → 0.775 → 0.875 at sf0.01): the refinement buys
    nothing at nprobe=1 (boundary loss is a partitioning property) but
    +0.18-0.23 recall at every nprobe ≥ 2, which is the measured case
    for paying the trainer pass in the index build;
    (b) since r8 the registered serving keys BUILD from that measured
    recipe (lloyd_centroids = sample seed + one Lloyd step; oracles
    replay the trainer via _lloyd_chain_sql) — the first-k seed
    (_ivf_ranked) remains only for the bucketing consumers
    (semantic_dedup, knn_graph) and the kmeans demos.

    ``k=None`` derives the centroid count from the corpus size
    (auto_centroids — the build-time default, so no caller hand-sets a k
    that stops fitting when the corpus grows ×10; explicit k remains the
    experiment knob). ``n_iters`` Lloyd steps follow; each step
    localCheckpoints — the loop is the same iterative-plan shape as
    connected_components, and untruncated lineage would nest every
    previous step's plan."""
    if k is None:
        k = auto_centroids(vectors.count())
    if init == "first":
        seed = vectors.orderBy("vec_id").limit(k)
        cent = seed.select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
        ).localCheckpoint(eager=True)
    elif init == "sample":
        seed = vectors.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id").limit(k)
        cent = seed.select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
        ).localCheckpoint(eager=True)
    elif init == "farthest":
        cent = _farthest_point_seed(vectors, k)
    else:
        raise ValueError(f"unknown init: {init!r}")
    for _ in range(n_iters):
        cent = kmeans_step(vectors, cent).localCheckpoint(eager=True)
    return cent


def _farthest_point_seed(vectors: DataFrame, k: int) -> DataFrame:
    """Deterministic k-center seeding: md5-min start, then k−1 greedy
    farthest-point picks (max over vectors of the min cosine-distance to
    the chosen seeds; round-9 + vec_id tie-break keeps every pick
    deterministic). Each pick is one broadcast-scan aggregate — k passes
    total, the k-means|| trade documented in kmeans_train."""
    first = (
        vectors.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(1)
        .select(F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb"))
        .localCheckpoint(eager=True)
    )
    seeds = first
    for _ in range(k - 1):
        d = F.lit(1.0) - F.round(cosine(F.col("embedding"), F.col("c_emb")), 9)
        nxt = (
            vectors.crossJoin(F.broadcast(seeds))
            .groupBy("vec_id")
            .agg(F.min(d).alias("d_min"), F.first("embedding").alias("embedding"))
            .orderBy(F.col("d_min").desc(), "vec_id")
            .limit(1)
            .select(F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb"))
        )
        seeds = seeds.union(nxt).localCheckpoint(eager=True)
    return seeds


N_CENTROIDS = 8
IVF_K = 5

#: Auto-k: the centroid count is DERIVED from the corpus size instead of
#: hand-set. Rule: k = clamp(n // IVF_TARGET_BUCKET) — expected bucket
#: size stays constant as the corpus grows, which is what returns the
#: bucketed stages to linear (measured, tools/ext_stress.py k-scaling:
#: k fixed at 8 → 2.5-3.4× of linear at ×10 vectors; k ∝ n → 0.3×).
#: The IVF_MAX_K ceiling is the broadcast bound: the centroid table rides
#: a broadcast join in every assignment, and 65,536 × a few-hundred-float
#: rows ≈ tens of MB is where that stops being free — past it (n > 4M at
#: this bucket size) the design moves to a two-level index (coarse
#: centroids over centroid groups), not a bigger broadcast; serving-only
#: deployments that never run bucketed pair stages can also switch to
#: k ≈ √n, which minimizes per-query probe cost (k centroid scans +
#: nprobe·n/k bucket rows) at the price of buckets that grow √n.
IVF_TARGET_BUCKET = 64
IVF_MIN_K = 4
IVF_MAX_K = 65_536

def _auto_k_sql(src: str = "vecs") -> str:
    """auto_centroids in the oracles' dialect — a scalar subquery over the
    given CTE (the ``vecs`` relation for whole-corpus builds; the ``base``
    relation for the incremental-add key, whose k freezes at build time),
    so DuckDB derives the identical k from the identical table."""
    return (
        f"(SELECT LEAST({IVF_MAX_K}, GREATEST({IVF_MIN_K}, "
        f"COUNT(*) // {IVF_TARGET_BUCKET})) FROM {src})"
    )


#: The common whole-corpus form.
AUTO_K_SQL = _auto_k_sql()


def auto_centroids(n: int) -> int:
    """Centroid count for an n-vector corpus (see the constants above)."""
    return min(IVF_MAX_K, max(IVF_MIN_K, n // IVF_TARGET_BUCKET))


def _ivf_ranked(vecs: DataFrame, n_centroids: int | None = None) -> DataFrame:
    """Every vector ranked against every centroid (first-N deterministic
    seed): argmax cosine rounded to 9 decimals, centroid-id tie-break —
    the shared assignment recipe of ivf_topk, the index builder,
    semantic_dedup, and the oracle replay. ``n_centroids`` defaults to
    the corpus-derived auto-k (one count — metadata-only under parquet
    aggregate pushdown — mirrored by AUTO_K_SQL in every oracle);
    explicit values remain the experiment knob (kmeans demos, stress
    sweeps)."""
    if n_centroids is None:
        n_centroids = auto_centroids(vecs.count())
    return _ranked_against(
        vecs,
        vecs.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
        ),
    )


def _ranked_against(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """The assignment core under any centroid frame — broadcast cross join,
    round-9 cosine argmax, centroid-id tie-break. _ivf_ranked feeds it the
    first-k contract seed; the honest recall key feeds it the sample
    seed's centroids; the rounding/tie-break is ONE definition either
    way."""
    centroids = F.broadcast(centroids)
    sim_c = F.round(cosine(F.col("embedding"), F.col("c_emb")), 9)
    return (
        vecs.crossJoin(centroids)
        .select("vec_id", "embedding", "centroid_id", sim_c.alias("c_sim"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.col("c_sim").desc(), F.col("centroid_id"))
            ),
        )
    )


def lloyd_centroids(vecs: DataFrame, k: int | None = None) -> DataFrame:
    """The SERVING trainer: deterministic sample seed + ONE Lloyd step —
    the exact recipe whose recall value is driver-pinned (ann_recall_lloyd
    vs ann_recall_honest: +0.18-0.23 recall@5 at every nprobe ≥ 2 for one
    extra assignment+mean pass per index build). Every serving key's index
    builds from THIS frame since r8; the raw first-k seed (_ivf_ranked)
    remains only for the bucketing consumers (semantic_dedup, knn_graph),
    whose pair quality is measured separately, and the kmeans demos."""
    return kmeans_train(vecs, k=k, n_iters=1, init="sample")


def _ranked_lloyd(vecs: DataFrame, n_centroids: int | None = None) -> DataFrame:
    """Every vector ranked against the Lloyd-refined serving centroids —
    the serving twin of _ivf_ranked (same _ranked_against core, same
    round-9/tie-break contract; only the centroid frame differs)."""
    if n_centroids is None:
        n_centroids = auto_centroids(vecs.count())
    return _ranked_against(vecs, lloyd_centroids(vecs, n_centroids))


def _lloyd_chain_sql(
    k_sql: str | None = None, prefix: str = "", src: str = "vecs", n_iters: int = 1
) -> str:
    """CTE chain ``seeds → c0 → a1 → m1 → c1 [→ … → cN]`` replaying
    lloyd_centroids (sample seed via md5 ranking, then ``n_iters``
    kmeans_steps: round-9 argmax-cosine assignment with centroid-id
    tie-break → DECIMAL(38,9)-exact element-wise means) against the
    ``src`` CTE the caller provides. ONE definition feeds ann_recall_lloyd
    and every serving oracle, so the trainer replay cannot drift between
    keys. Splice after ``vecs`` with a leading comma; the refined
    centroids are the ``{prefix}c{n_iters}`` relation. ``prefix``
    namespaces the CTEs where the surrounding query already uses the bare
    names (_PQ_CTES trains the PQ codebook through its own c0/a1/m1);
    ``src`` lets the incremental-add keys train on the ``base`` slice
    while assigning the whole corpus."""
    if k_sql is None:
        k_sql = _auto_k_sql(src)
    p = prefix
    head = f"""
        {p}seeds AS (
            SELECT vec_id FROM (
                SELECT vec_id,
                       ROW_NUMBER() OVER (
                           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                       ) AS srn
                FROM {src}
            ) WHERE srn <= {k_sql}
        ),
        {p}c0 AS (
            SELECT v.vec_id AS centroid_id, v.emb AS c_emb
            FROM {src} v JOIN {p}seeds s ON v.vec_id = s.vec_id
        ),"""
    step = """
        {p}a{i} AS (
            SELECT vec_id, emb, centroid_id FROM (
                SELECT v.vec_id, v.emb, c.centroid_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                    c.centroid_id
                       ) AS rn
                FROM {src} v CROSS JOIN {p}c{prev} c
            ) WHERE rn = 1
        ),
        {p}m{i} AS (
            SELECT centroid_id, pos - 1 AS pos,
                   CAST(SUM(CAST(val AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS m
            FROM (
                SELECT centroid_id, unnest(emb) AS val,
                       generate_subscripts(emb, 1) AS pos
                FROM {p}a{i}
            )
            GROUP BY centroid_id, pos
        ),
        {p}c{i} AS (
            SELECT centroid_id, list(m ORDER BY pos) AS c_emb
            FROM {p}m{i} GROUP BY centroid_id
        )"""
    steps = ",".join(
        step.format(p=p, src=src, i=i, prev=i - 1) for i in range(1, n_iters + 1)
    )
    return head + steps


def _memo_read(spark: SparkSession, path: str, memo: dict | None = None) -> DataFrame:
    """Read an index-interior parquet table, reusing a caller-held schema
    memo.

    ``spark.read.parquet`` with no schema runs a one-task footer-inference
    job per call (~50-90 ms quiet, more under load) — a maintenance
    stream's fold pays it per TRIGGER per table even though the layout
    under its lease cannot change. A single-owner scope (a foreachBatch
    stream holding the index's maintenance lease, or a key function that
    built the index it is reading) passes one dict for its lifetime: the
    first read infers and memoizes, later reads hand the stored schema to
    the reader and skip the job.

    This is deliberately NOT a module-level cache keyed on path (the r12
    hazard note in OPTIMIZATION_r12.md): the memo's lifetime equals its
    owner's exclusive-write scope, so a layout-changing rewrite by a later
    owner can never see a stale schema — there is no invalidation to get
    wrong. The fold's own writes never change the column set or types, so
    within one scope the memoized schema stays exact. Callers without an
    ownership scope pass nothing and keep per-call inference."""
    if memo is None:
        return spark.read.parquet(path)
    schema = memo.get(path)
    if schema is None:
        df = spark.read.parquet(path)
        memo[path] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def _collect_touched(assigned: DataFrame, *key_cols: str):
    """Materialize a changeset-sized assignment frame once for its three
    consumers (touched-keys collect, skip-existing anti-join, append
    write) and collect the distinct partition keys. The materialization
    is an EAGER localCheckpoint, and that choice is measured: a persist()
    variant (tried r13 for deterministic block release) was a wash at
    sf0.1 but 40-60% SLOWER at the ×10 stress scale (isolated ×10 add
    min-of-3: 7.5 s from the columnar cache vs 4.7-5.4 s from checkpoint
    row blocks — the 273-partition append pays a per-task columnar→row
    conversion when it reads an InMemoryRelation). Checkpoint blocks are
    freed when the frame is garbage-collected, which at one changeset
    per fold is bounded. Returns (materialized frame, sorted key list —
    scalars for one key column, tuples otherwise)."""
    assigned = assigned.localCheckpoint(eager=True)
    rows = assigned.select(*key_cols).distinct().collect()
    if len(key_cols) == 1:
        touched = sorted(r[key_cols[0]] for r in rows)
    else:
        touched = sorted(tuple(r[c] for c in key_cols) for r in rows)
    return assigned, touched


#: Interior-table schemas per index layout — STATIC BY CONSTRUCTION: every
#: table of a kind is written by exactly one builder/fold in this module
#: (or operators/ann_lookup.py for the lookups), always with these columns
#: and types, and the maintenance ops never alter a table's column set.
#: Serve keys read with these instead of paying a footer-inference job per
#: interior table per call (~0.1-0.2 s/key across ~70 ext keys — the r12
#: verdict's named r13 slice; the fold loops already amortize via the
#: single-owner schema memo, but a serve key has no ownership scope to
#: amortize over). Strings are EXACTLY what inference returns on a built
#: index — including the partition columns' INT (directory-name inference
#: would yield INT, and several registered keys' output schemas embed the
#: consequence of that via their explicit bigint casts), which is safe by
#: construction: centroid/coarse/sub ids are bounded by IVF_MAX_K = 65,536
#: (the broadcast bound), far inside int32. Pinned against inference on
#: freshly-built indexes of every layout in tests/test_layout_schemas.py,
#: so a builder change that drifts a schema fails loudly there.
LAYOUT_SCHEMAS: dict[str, str] = {
    "centroids": "centroid_id BIGINT, c_emb ARRAY<DOUBLE>",
    "vectors": "vec_id BIGINT, embedding ARRAY<DOUBLE>, centroid_id INT",
    "vectors_ivfpq": (
        "vec_id BIGINT, embedding ARRAY<DOUBLE>, codes ARRAY<BIGINT>, "
        "centroid_id INT"
    ),
    "vectors_ivf2": (
        "vec_id BIGINT, embedding ARRAY<DOUBLE>, coarse_id INT, centroid_id INT"
    ),
    "vectors_split": (
        "vec_id BIGINT, embedding ARRAY<DOUBLE>, centroid_id INT, sub_id INT"
    ),
    "codebook": "block INT, cid BIGINT, c_sub ARRAY<DOUBLE>",
    "coarse": "coarse_id BIGINT, g_emb ARRAY<DOUBLE>",
    "fine": "centroid_id BIGINT, c_emb ARRAY<DOUBLE>, coarse_id BIGINT",
    "sub_centroids": "centroid_id BIGINT, sub_id INT, s_emb ARRAY<DOUBLE>",
    "lookup": "vec_id BIGINT, centroid_id BIGINT, bucket INT",
    "lookup_ivf2": "vec_id BIGINT, coarse_id BIGINT, centroid_id BIGINT, bucket INT",
    "lookup_split": "vec_id BIGINT, centroid_id BIGINT, sub_id BIGINT, bucket INT",
}


def _layout_read(spark: SparkSession, path: str, kind: str) -> DataFrame:
    """Read an index-interior table with its layout's static schema
    (LAYOUT_SCHEMAS) — zero inference jobs on serve paths. The memo'd
    variant (_memo_read) remains for the FOLD loops, whose single-owner
    scope already amortizes inference and whose generic delete/compact
    paths are deliberately layout-agnostic."""
    return spark.read.schema(LAYOUT_SCHEMAS[kind]).parquet(path)


def ivf_build_index(
    spark: SparkSession, sf_dir: str, path: str, n_centroids: int | None = None
) -> None:
    """Materialize the IVF index the ivf_topk docstring promises at scale:

    - ``centroids/``: the Lloyd-refined serving centroids (lloyd_centroids
      — sample seed + one kmeans_step), written FIRST and read back so the
      stored frame and the assignment below cannot disagree. Persisting
      the trainer output is what makes serving and incremental adds
      train-free: probes rank against the stored table, and a new batch
      assigns against the SAME frozen centroids (ann_index_incremental_add)
      instead of retraining — retraining on the union would move every
      centroid and invalidate the existing partitions.
    - ``vectors/``: the assigned table written ``partitionBy(centroid_id)``,
      so a probe reads nprobe directories via partition pruning instead of
      scanning the whole index (plan-asserted in tests/test_similarity.py).

    Callers that already derived auto-k pass it so the build doesn't
    re-count."""
    ivf_build_index_frame(_vectors(spark, sf_dir), path, n_centroids)


def ivf_build_index_frame(
    vecs: DataFrame, path: str, n_centroids: int | None = None,
    schema_memo: dict | None = None,
) -> None:
    """ivf_build_index over an explicit (vec_id, embedding) frame — the
    incremental-add key builds from its ``base`` slice through this.
    ``schema_memo`` (see _memo_read) lets a caller that will keep folding
    into this index reuse the read-back's inferred schema."""
    import os

    spark = vecs.sparkSession
    cent = lloyd_centroids(vecs, n_centroids if n_centroids is not None
                           else auto_centroids(vecs.count()))
    cent.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    cent_r = _memo_read(spark, os.path.join(path, "centroids"), schema_memo)
    assigned = _ranked_against(vecs, cent_r).filter(F.col("rn") == 1).select(
        "vec_id", "embedding", "centroid_id"
    )
    assigned.write.partitionBy("centroid_id").mode("overwrite").parquet(
        os.path.join(path, "vectors")
    )


def ivf_index_incremental_add(
    spark: SparkSession, path: str, batch: DataFrame, skip_existing: bool = False,
    schema_memo: dict | None = None,
) -> list[int]:
    """Fold an arriving embedding batch into a materialized IVF index
    WITHOUT retraining and WITHOUT touching existing data — the vector
    twin of the partitioned-state merge (operators/partitioned_state.py)
    and the answer to rebuild-on-stale being the only maintenance story:

    - the batch is assigned against the STORED frozen ``centroids/`` table
      (retraining on the union would move every centroid and invalidate
      every existing partition — the index's identity IS its trained
      centroids, so adds must freeze them);
    - the assigned rows APPEND to ``vectors/`` partitioned by centroid_id:
      only partitions that receive batch rows gain files, every other
      partition stays byte-identical (tested), and the job shuffles the
      BATCH, never the index.

    Cost at 100 TB: one broadcast assignment over the batch plus k' ≤
    |batch| partition appends — the ingest cost tracks the changeset, not
    the corpus (the incremental_dedup_bucketed property, now on the vector
    surface). Periodic full retrains remain a quality decision (centroid
    drift as the distribution shifts), not a correctness one: probes
    against frozen centroids stay exact over everything indexed.

    ``skip_existing=True`` makes the add IDEMPOTENT under replay (the
    foreachBatch retry contract — a failed micro-batch re-runs, and a
    plain parquet append would double-insert): already-indexed vec_ids
    are anti-joined out by reading ONLY the touched partitions (the
    partition-pruned fraction the batch maps to, never the whole index).
    Streaming ingest (streaming/ann_ingest.py) always sets it.

    Returns the touched centroid ids. ``schema_memo`` (see _memo_read)
    lets a single-owner fold loop skip per-trigger schema inference."""
    import os

    cent_r = _memo_read(spark, os.path.join(path, "centroids"), schema_memo)
    # one assignment job feeds every use below (_collect_touched)
    assigned, touched = _collect_touched(
        _ranked_against(batch, cent_r)
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "centroid_id"),
        "centroid_id",
    )
    if skip_existing and touched:
        # no broadcast hint: the anti-join's build side is the touched
        # partitions' vec_id column (column-pruned scan), whose size scales
        # with the index fraction the batch maps to — AQE promotes it when
        # small and keeps a shuffled join when not
        existing = (
            _memo_read(spark, os.path.join(path, "vectors"), schema_memo)
            .filter(F.col("centroid_id").isin(touched))
            .select("vec_id")
        )
        out = assigned.join(existing, "vec_id", "left_anti")
    else:
        out = assigned
    out.write.mode("append").partitionBy("centroid_id").parquet(
        os.path.join(path, "vectors")
    )
    return touched


#: Largest takedown batch the delete path will broadcast: 1M bigint ids is
#: ~8 MB of payload (tens of MB as an in-memory hashed relation) — safely
#: under executor broadcast budgets. Bigger batches fall back to a shuffled
#: join, which is the right plan for them anyway.
DELETE_BROADCAST_MAX_IDS = 1_000_000


def ivf_index_delete(
    spark: SparkSession,
    path: str,
    delete_ids: DataFrame,
    partition_cols: tuple[str, ...] = ("centroid_id",),
    touched: list | None = None,
    schema_memo: dict | None = None,
    n_ids_hint: int | None = None,
) -> list:
    """Remove vectors from a materialized IVF index by id — the lifecycle
    op incremental_add is missing (takedown / right-to-be-forgotten: at
    100 TB you are handed vec_ids, not embeddings, and a full index
    rebuild per deletion request is exactly the cost model adds were
    built to avoid). Partition-scoped like the add:

    - LOCATE: one column-pruned scan semi-joined against the id list
      finds which centroid partitions hold victims — the only full-index
      read, and it reads two columns. The id list is broadcast only while
      it is provably small (a bounded limit+count probe, not an assumed
      hint): takedown batches from start_ann_delete_stream are unbounded,
      and an oversized forced broadcast is a driver OOM. An id→centroid
      lookup table would remove even that scan at true scale; the
      probe-side layout already supports it (the assignment IS that
      table).
    - REWRITE: only the touched partitions are rewritten (per-write
      dynamic partitionOverwriteMode — untouched partitions stay
      byte-identical, tested), from a changeset-sized localCheckpoint
      (breaks lineage to the files being replaced, the same trick the
      add uses for its read-then-append).
    - SWEEP: a partition whose EVERY row was deleted produces no output
      under dynamic overwrite and would silently keep serving its dead
      rows — those directories are removed explicitly through the Hadoop
      FileSystem API (operators/fsutil.py — the index lives wherever
      ``path`` points, HDFS/S3A/file:, so a POSIX sweep is the wrong
      substrate), raising on a failed delete (the partitioned_state
      sweep discipline).

    Centroids stay FROZEN through deletes (same invariant as the add:
    the index's identity is its trained centroids; deletions thin cells,
    they don't move them — ann_retrain_decision prices when thinning
    warrants a retrain). Idempotent: re-deleting the same ids finds no
    victims and writes nothing. ``partition_cols`` names the layout's
    partition key — ("centroid_id",) for flat IVF/IVFPQ,
    ("coarse_id", "centroid_id") for the nested two-level layout (empty
    parent trees are pruned after a leaf sweep). ``touched`` skips the
    LOCATE scan entirely when the caller already knows the victim
    partitions — the id→centroid lookup table's point read
    (operators/ann_lookup.locate) supplies exactly this, turning the
    delete's one whole-index touch into a bucket-pruned read (the
    ann_index_delete_lookup key drives that composition end to end).
    ``n_ids_hint`` is an UPPER BOUND on the id count when the caller
    already knows one (the apply-log fold counts its ops in one fused
    aggregate) — it replaces the bounded broadcast probe job, never the
    correctness of the join (an oversized hint only forfeits the
    broadcast). Returns the touched centroid ids (key tuples for
    multi-column layouts)."""
    import functools as ft
    import os

    from ..operators import fsutil

    vec_dir = os.path.join(path, "vectors")
    idx = _memo_read(spark, vec_dir, schema_memo)
    # One materialization (changeset-sized by contract) serves the probe,
    # the locate scan and the rewrite anti-join — without it the
    # delete_ids lineage is fully evaluated three times per call, and in
    # start_ann_delete_stream that re-reads every micro-batch's source
    # twice more; an expensive lineage could cost more than the broadcast
    # the probe guards. distinct() rides the same job: semi/anti joins
    # never cared about duplicate ids, but the fused locate below counts
    # victim ROWS via a left join, which must see each id once.
    delete_ids = delete_ids.distinct().localCheckpoint(eager=True)
    # Broadcast the id list only when provably small — via the caller's
    # bound when given, else a bounded probe (limit(N+1).count() scans at
    # most N+1 rows, so the probe's cost is capped regardless of how
    # large a takedown batch arrives).
    small = (
        n_ids_hint <= DELETE_BROADCAST_MAX_IDS
        if n_ids_hint is not None
        else delete_ids.limit(DELETE_BROADCAST_MAX_IDS + 1).count()
        <= DELETE_BROADCAST_MAX_IDS
    )
    if small:
        delete_ids = F.broadcast(delete_ids)
    survivors: set | None = None
    if touched is None:
        # LOCATE, fused (r13): ONE aggregate over the same column-pruned
        # scan the old semi-join read yields BOTH the victim partitions
        # AND — via per-key victim/total row counts — which of them keep
        # survivors, removing the separate post-rewrite distinct-collect
        # job (guide §1.2: fewer serial driver round-trips per fold).
        stats = (
            idx.select(*partition_cols, "vec_id")
            .join(delete_ids.withColumn("__del", F.lit(1)), "vec_id", "left")
            .groupBy(*partition_cols)
            .agg(F.count("*").alias("__total"), F.count("__del").alias("__victims"))
            .filter(F.col("__victims") > 0)
            .collect()
        )
        touched = sorted(tuple(r[c] for c in partition_cols) for r in stats)
        survivors = {
            tuple(r[c] for c in partition_cols)
            for r in stats
            if r["__victims"] < r["__total"]
        }
    else:
        touched = sorted(
            k if isinstance(k, tuple) else (k,) for k in touched
        )
    if not touched:
        return []

    def _keys_filter(keys):
        # OR-of-AND literals on the partition columns — planning-time
        # partition pruning (a semi-join would locate the same rows but
        # open every directory); changeset-sized by construction
        return ft.reduce(
            lambda a, b: a | b,
            [
                ft.reduce(
                    lambda x, y: x & y,
                    [F.col(c) == F.lit(v) for c, v in zip(partition_cols, key)],
                )
                for key in keys
            ],
        )

    # no projection: the rewrite is layout-agnostic (the IVFPQ vectors
    # table carries its codes column through unchanged; the two-level
    # layout passes partition_cols=("coarse_id", "centroid_id")), so one
    # delete implementation serves every partitioned index layout.
    # When the fused locate already proved EVERY touched partition fully
    # emptied, there is nothing to rewrite — skip straight to the sweep.
    if survivors is None or survivors:
        remaining = (
            idx.filter(_keys_filter(touched))
            .join(delete_ids, "vec_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if survivors is None:
            # caller-supplied ``touched`` (the lookup-table path) skipped
            # the fused locate, so the survivor set comes from the
            # rewrite frame
            survivors = {
                tuple(r[c] for c in partition_cols)
                for r in remaining.select(*partition_cols).distinct().collect()
            }
    if survivors:
        remaining.filter(_keys_filter(sorted(survivors))).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            *partition_cols
        ).parquet(vec_dir)
    for key in touched:
        if key in survivors:
            continue
        dead = "/".join(
            [vec_dir, *(f"{c}={v}" for c, v in zip(partition_cols, key))]
        )
        fsutil.delete_dir(spark, dead)
        # a nested layout can leave an empty parent tree behind a swept
        # leaf — prune upward so listings never show hollow directories
        fsutil.prune_empty_parents(spark, dead, vec_dir)
    if len(partition_cols) == 1:
        return [k[0] for k in touched]
    return touched


#: The simulated takedown set for the delete key: vec_id ≡ 5 (mod 16) —
#: ~6% of the corpus, disjoint mod-class from the add key's batch so the
#: two lifecycle keys never share a slice.
DEL_MOD = 16
DEL_REM = 5


def _ivf_del_index_path(sf_dir: str, k: int) -> str:
    import os

    return os.path.join(
        os.path.dirname(_ivf_index_path(sf_dir, k)), f"del_lloyd1_c{k}"
    )


@register(
    "ann_index_delete",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        {_lloyd_chain_sql(src="vecs")},
        ranked AS (
            SELECT v.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN c1 c
        )
        SELECT vec_id, centroid_id FROM ranked
        WHERE rn = 1 AND vec_id % {DEL_MOD} <> {DEL_REM}
    """,
    tags=("ext-sim", "opt-partition-pruning"),
)
def ann_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index deletion, driver-checked end to end: build the materialized
    IVF index over the FULL corpus, then remove the takedown set (vec_id
    ≡ 5 mod 16) via ivf_index_delete — partition-scoped rewrite of only
    the touched centroid directories, frozen centroids, empty-partition
    sweep. The returned frame is the post-delete index read back from
    disk; the oracle is the deletion-equivalence statement: the full
    build's assignment minus the deleted ids, exactly — which holds
    precisely BECAUSE deletes freeze centroids (a retrain-on-delete
    would move every assignment and the equivalence would be false).

    Idempotent per sf_dir via the same freshness + completion-marker
    gate as the add key (_DEL_SUCCESS: the build's own _SUCCESS must not
    pass for the post-delete state)."""
    import os

    vecs = _vectors(spark, sf_dir)
    n = vecs.count()
    if n == 0:
        return spark.createDataFrame([], "vec_id bigint, centroid_id bigint")
    k = auto_centroids(n)
    path = _ivf_del_index_path(sf_dir, k)
    marker = os.path.join(path, "_DEL_SUCCESS")
    if not (_ivf_index_is_fresh(path, sf_dir) and _incr_marker_fresh(marker, sf_dir)):
        ivf_build_index_frame(vecs, path, n_centroids=k)
        ivf_index_delete(
            spark,
            path,
            vecs.filter(
                F.pmod(F.col("vec_id"), F.lit(DEL_MOD)) == DEL_REM
            ).select("vec_id"),
        )
        open(marker, "w").close()
    idx = _layout_read(spark, os.path.join(path, "vectors"), "vectors")
    return idx.select(
        "vec_id", F.col("centroid_id").cast("bigint").alias("centroid_id")
    )


@register(
    "ann_index_delete_lookup",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        {_lloyd_chain_sql(src="vecs")},
        ranked AS (
            SELECT v.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN c1 c
        )
        SELECT vec_id, centroid_id FROM ranked
        WHERE rn = 1 AND vec_id % {DEL_MOD} <> {DEL_REM}
    """,
    tags=("ext-sim", "opt-partition-pruning"),
)
def ann_index_delete_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Takedown with ZERO whole-index reads, driver-checked end to end —
    the composition ann_index_delete's docstring promised: LOCATE through
    the id→centroid lookup table's bucket-pruned point read
    (operators/ann_lookup.locate — reads only the takedown ids' hash
    buckets, never the index), feed the located partitions straight into
    ivf_index_delete (which then skips its own scan), and refresh ONLY
    the lookup buckets the deleted ids hash into. Every step's cost
    tracks the changeset; the index is touched only at the rewrite of
    its victim partitions.

    The returned frame is the post-delete LOOKUP table read back from
    disk — deliberately not the index: hashing the lookup against the
    full-assignment-minus-deleted oracle proves the maintenance loop
    kept the derived table exactly consistent with the index it mirrors
    (a stale or over-swept bucket hash-mismatches here)."""
    import os

    from ..operators.ann_lookup import build_lookup, locate, refresh_lookup_buckets

    vecs = _vectors(spark, sf_dir)
    n = vecs.count()
    if n == 0:
        return spark.createDataFrame([], "vec_id bigint, centroid_id bigint")
    k = auto_centroids(n)
    path = os.path.join(
        os.path.dirname(_ivf_index_path(sf_dir, k)), f"dellk_lloyd1_c{k}"
    )
    marker = os.path.join(path, "_DELLK_SUCCESS")
    if not (_ivf_index_is_fresh(path, sf_dir) and _incr_marker_fresh(marker, sf_dir)):
        ivf_build_index_frame(vecs, path, n_centroids=k)
        build_lookup(spark, path)
        dels = vecs.filter(
            F.pmod(F.col("vec_id"), F.lit(DEL_MOD)) == DEL_REM
        ).select("vec_id")
        touched = sorted(
            r["centroid_id"]
            for r in locate(spark, path, dels)
            .select("centroid_id")
            .distinct()
            .collect()
        )
        ivf_index_delete(spark, path, dels, touched=touched)
        refresh_lookup_buckets(spark, path, dels)
        open(marker, "w").close()
    lk = _layout_read(spark, os.path.join(path, "lookup"), "lookup")
    return lk.select(
        "vec_id", F.col("centroid_id").cast("bigint").alias("centroid_id")
    )


def ivf_probe_index(
    spark: SparkSession,
    path: str,
    q_emb: list[float],
    probe_ids: list[int],
    k: int = IVF_K,
    exclude_ids: tuple[int, ...] = (),
) -> DataFrame:
    """Exact top-k inside the probed buckets of a materialized index. The
    isin() filter on the partition column prunes at planning time — only
    the probed directories are ever read. ``exclude_ids`` drops known ids
    (typically the query vector itself) before the top-k."""
    idx = _layout_read(spark, path, "vectors").filter(F.col("centroid_id").isin(probe_ids))
    if exclude_ids:
        idx = idx.filter(~F.col("vec_id").isin(list(exclude_ids)))
    q = F.array(*[F.lit(float(x)) for x in q_emb])
    sim = F.round(cosine(F.col("embedding").cast("array<double>"), q), 6)
    return (
        idx.select("vec_id", sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def ivf_topk(spark: SparkSession, sf_dir: str, nprobe: int = 1) -> DataFrame:
    """IVF approximate nearest neighbor with a tunable probe width.

    Vectors are assigned to their nearest Lloyd-refined centroid
    (lloyd_centroids — fully deterministic, so the oracle replays the
    trainer exactly); the query probes its
    ``nprobe`` nearest centroids' buckets and exact top-k runs inside the
    probed union. nprobe trades scanned fraction for recall:
    nprobe=N_CENTROIDS degenerates to exact brute force (tested), nprobe=1
    is the registered fast path. Measured on the harness embeddings
    (sf0.01, label-clustered): recall@5 = 1.0 already at nprobe=1 with
    ~1/8 of the table scanned — see PLANS.md for the sweep.

    At scale: centroids come from the deterministic Lloyd trainer
    (lloyd_centroids — the refinement ann_recall_lloyd prices at +0.18-0.23
    recall@5 for nprobe ≥ 2), the assignment is a broadcast join against
    ≤10⁴ centroids, and the bucketed table is written partitioned by
    centroid_id so a probe touches nprobe partitions (partition pruning
    does the skipping)."""
    vecs = _vectors(spark, sf_dir)
    ranked = _ranked_lloyd(vecs)
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


def _ivf_oracle(nprobe: int) -> str:
    """The DuckDB replay of ivf_topk's deterministic index build + probe,
    parameterized by probe width so every registered nprobe gets its own
    driver-checked entry. Since r8 the build half is the Lloyd-refined
    serving trainer (_lloyd_chain_sql — sample seed + one kmeans_step),
    not the raw first-k seed: the refinement's recall value is pinned by
    ann_recall_lloyd, and the serve oracles replay the SAME chain so the
    driver hash-checks the trainer inside the recipe it ships."""
    return f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        {_lloyd_chain_sql()},
        ranked AS (
            SELECT v.vec_id, v.emb, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN c1 c
        ),
        assigned AS (SELECT vec_id, emb, centroid_id FROM ranked WHERE rn = 1),
        q_probes AS (SELECT centroid_id FROM ranked WHERE vec_id = 0 AND rn <= {nprobe}),
        q AS (SELECT emb AS q_emb FROM vecs WHERE vec_id = 0)
        SELECT a.vec_id AS vec_id,
               round(list_cosine_similarity(a.emb, q.q_emb), 6) AS sim
        FROM assigned a JOIN q_probes p ON a.centroid_id = p.centroid_id CROSS JOIN q
        WHERE a.vec_id <> 0
        ORDER BY sim DESC, a.vec_id
        LIMIT {IVF_K}
    """


@register("ann_ivf_topk", oracle=_ivf_oracle(1), tags=("ext-sim",))
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


KMEANS_K = 4
KMEANS_ITERS = 2


def _kmeans_oracle(k: int, n_iters: int) -> str:
    """DuckDB replay of kmeans_train: first-k-by-id init, then ``n_iters``
    unrolled Lloyd steps (argmax cosine rounded to 9 with centroid-id
    tie-break → decimal-exact element-wise means). Generated per iteration
    count so the oracle and the Spark loop can't drift."""
    assign = """
        a{i} AS (
            SELECT vec_id, emb, centroid_id FROM (
                SELECT v.vec_id, v.emb, c.centroid_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                    c.centroid_id
                       ) AS rn
                FROM vecs v CROSS JOIN c{prev} c
            ) WHERE rn = 1
        ),
        m{i} AS (
            SELECT centroid_id, pos - 1 AS pos,
                   CAST(SUM(CAST(val AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS m
            FROM (
                SELECT centroid_id, unnest(emb) AS val,
                       generate_subscripts(emb, 1) AS pos
                FROM a{i}
            )
            GROUP BY centroid_id, pos
        ),
        c{i} AS (
            SELECT centroid_id, list(m ORDER BY pos) AS c_emb
            FROM m{i} GROUP BY centroid_id
        )"""
    steps = ",".join(assign.format(i=i, prev=i - 1) for i in range(1, n_iters + 1))
    return f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        c0 AS (
            SELECT vec_id AS centroid_id, emb AS c_emb
            FROM vecs ORDER BY vec_id LIMIT {k}
        ),
        {steps}
        SELECT centroid_id, pos, round(m, 6) AS c_val
        FROM m{n_iters}
    """


@register("kmeans_iterate", oracle=_kmeans_oracle(KMEANS_K, KMEANS_ITERS), tags=("ext-sim",))
def kmeans_iterate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd k-means, driver-checked: first-k-by-id init,
    KMEANS_ITERS assign+mean rounds (kmeans_train), output exploded to
    (centroid_id, pos, c_val) with a 6-decimal output round. Every step is
    exact — argmax on round-9 cosines with id tie-break, means through
    DECIMAL(38,9) — so the unrolled SQL replay hash-matches the loop.

    Scale shape per step: broadcast assignment against ≤10⁴ centroids (no
    fact-side shuffle), posexplode → partial+final hash agg carrying
    |centroids|×dim rows, localCheckpoint truncating the iterative
    lineage. This is the trainer behind the IVF index; the registered
    run pins the full loop, not just one step."""
    vecs = _vectors(spark, sf_dir)
    cent = kmeans_train(vecs, k=KMEANS_K, n_iters=KMEANS_ITERS)
    return cent.select(
        "centroid_id", F.posexplode("c_emb").alias("pos", "c_val")
    ).select("centroid_id", "pos", F.round("c_val", 6).alias("c_val"))


def _ivf_index_path(sf_dir: str, k: int) -> str:
    import os

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    warehouse = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "spark-warehouse"
    )
    # the builder recipe is part of the identity: a different derived k,
    # trainer (the r8 lloyd1 flip minted this tag), or any future
    # assignment constant must produce a NEW index directory, never
    # silently serve one built under the old recipe
    return os.path.join(warehouse, f"ivf_{tag}", f"index_lloyd1_c{k}")


def _ivf_index_is_fresh(path: str, sf_dir: str) -> bool:
    """The _SUCCESS marker alone is not enough: a regenerated corpus under
    the same sf_dir would otherwise keep serving the stale index (the
    oracle replays from the fresh parquet — driver hash-mismatch at best,
    silently wrong neighbors at worst). Source-mtime check via
    io.materialization_is_fresh on BOTH halves (an interrupted build can
    leave centroids/ without vectors/); the recipe constants are covered
    by the recipe-tagged path."""
    import os

    from ..io import materialization_is_fresh

    src = os.path.join(sf_dir, "embeddings.parquet")
    return materialization_is_fresh(
        os.path.join(path, "vectors"), src
    ) and materialization_is_fresh(os.path.join(path, "centroids"), src)


@register("ivf_index_probe", oracle=_ivf_oracle(1), tags=("ext-sim", "opt-partition-pruning"))
def ivf_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized-index ANN path, driver-checked end to end:
    ivf_build_index writes the assigned table partitionBy(centroid_id)
    once per sf_dir (idempotent via _SUCCESS + source-mtime freshness +
    a recipe-tagged path — see _ivf_index_is_fresh; the lake.py pattern
    plus staleness guards), then ivf_probe_index answers the query by
    reading ONLY the probed centroid's directory — partition pruning at
    planning time, the plan shape asserted in tests/test_similarity.py.
    Same deterministic Lloyd recipe as ann_ivf_topk, so the oracle is the
    same replay; what this entry adds is the driver confirming the
    on-disk index round trip, not just the in-memory plan. Serving is
    TRAIN-FREE: the probe ranks the query against the STORED centroids/
    table (centroid-count rows), so a serve run after the build touches
    no full-corpus stage at all."""
    import os

    vecs = _vectors(spark, sf_dir)
    # derive auto-k ONCE: path identity, build, and probe assignment all
    # share it (three redundant count jobs otherwise)
    k_auto = auto_centroids(vecs.count())
    path = _ivf_index_path(sf_dir, k_auto)
    if not _ivf_index_is_fresh(path, sf_dir):
        ivf_build_index(spark, sf_dir, path, n_centroids=k_auto)
    # two driver-side scalars of control flow, not data: the query vector
    # and its probe bucket (both one-row lookups)
    q_row = vecs.filter(F.col("vec_id") == 0).select("embedding").head()
    if q_row is None:
        # no query vector (empty corpus): the probe has nothing to rank
        return spark.createDataFrame([], "vec_id bigint, sim double")
    q_emb = q_row[0]
    cent_r = _layout_read(spark, os.path.join(path, "centroids"), "centroids")
    probes = [
        r.centroid_id
        for r in _ranked_against(vecs.filter(F.col("vec_id") == 0), cent_r)
        .filter(F.col("rn") <= 1)
        .select("centroid_id")
        .collect()
    ]
    return ivf_probe_index(
        spark, os.path.join(path, "vectors"), q_emb, probes, k=IVF_K, exclude_ids=(0,)
    )


#: The simulated arriving batch for the incremental-add key: every vec_id
#: ≡ 7 (mod 8) — ~12.5% of the corpus, deterministic on both engines.
INCR_BATCH_MOD = 8


def _ivf_incr_index_path(sf_dir: str, k: int) -> str:
    import os

    return os.path.join(
        os.path.dirname(_ivf_index_path(sf_dir, k)), f"incr_lloyd1_c{k}"
    )


def _incr_marker_fresh(marker: str, sf_dir: str) -> bool:
    """True iff the add-completion marker exists and is newer than every
    source file — the build writes vectors/_SUCCESS BEFORE the incremental
    add runs, so _ivf_index_is_fresh alone would declare a crashed
    build-without-add complete and serve an index missing the batch."""
    import os

    if not os.path.exists(marker):
        return False
    built = os.path.getmtime(marker)
    src = os.path.join(sf_dir, "embeddings.parquet")
    paths = [os.path.join(src, f) for f in os.listdir(src)] if os.path.isdir(src) else [src]
    return all(os.path.getmtime(p) <= built for p in paths if os.path.exists(p))


@register(
    "ann_index_incremental_add",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        base AS (
            SELECT vec_id, emb FROM vecs WHERE vec_id % {INCR_BATCH_MOD} <> {INCR_BATCH_MOD - 1}
        ),
        {_lloyd_chain_sql(src="base")},
        ranked AS (
            SELECT v.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN c1 c
        )
        SELECT vec_id, centroid_id FROM ranked WHERE rn = 1
    """,
    tags=("ext-sim", "opt-partition-pruning"),
)
def ann_index_incremental_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN index maintenance, driver-checked end to end: build
    the materialized IVF index from the BASE slice of the corpus (vec_id ≢
    7 mod 8 — the standing index), then fold the remaining ~12.5% in as an
    arriving batch via ivf_index_incremental_add — assignment against the
    STORED frozen centroids, partition-scoped parquet APPEND that leaves
    every untouched centroid partition byte-identical (asserted in
    tests/test_incremental_ann.py) and shuffles only the batch.

    The returned frame is the full post-add index read back from disk
    (vec_id → centroid_id), and the oracle is the FULL-REBUILD-equivalence
    statement: training on base and assigning everything against those
    frozen centroids must equal the incremental result exactly — the
    property that makes per-batch ingest sound at 100 TB, where a full
    rebuild per embedding batch would dominate the vector surface's cost
    (a rebuild re-shuffles the corpus; the add touches batch-sized data).

    Idempotent per sf_dir: the build+add pair is one materialization,
    gated by source-mtime freshness PLUS an add-completion marker (the
    vectors/_SUCCESS written by the base build alone must not pass for
    the post-add state)."""
    import os

    vecs = _vectors(spark, sf_dir)
    is_batch = F.pmod(F.col("vec_id"), F.lit(INCR_BATCH_MOD)) == INCR_BATCH_MOD - 1
    base = vecs.filter(~is_batch)
    batch = vecs.filter(is_batch)
    n_base = base.count()
    if n_base == 0:
        # no standing corpus → nothing to train, nothing to index (the
        # oracle's empty-c1 chain returns the same zero rows); writing the
        # empty layout would leave an unreadable footerless vectors/ dir
        return spark.createDataFrame([], "vec_id bigint, centroid_id bigint")
    k = auto_centroids(n_base)
    path = _ivf_incr_index_path(sf_dir, k)
    marker = os.path.join(path, "_INCR_SUCCESS")
    if not (_ivf_index_is_fresh(path, sf_dir) and _incr_marker_fresh(marker, sf_dir)):
        ivf_build_index_frame(base, path, n_centroids=k)
        ivf_index_incremental_add(spark, path, batch)
        open(marker, "w").close()
    idx = _layout_read(spark, os.path.join(path, "vectors"), "vectors")
    return idx.select(
        "vec_id", F.col("centroid_id").cast("bigint").alias("centroid_id")
    )


@register(
    "ann_index_compact",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        base AS (
            SELECT vec_id, emb FROM vecs WHERE vec_id % {INCR_BATCH_MOD} <> {INCR_BATCH_MOD - 1}
        ),
        {_lloyd_chain_sql(src="base")},
        ranked AS (
            SELECT v.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN c1 c
        )
        SELECT vec_id, centroid_id FROM ranked WHERE rn = 1
    """,
    tags=("ext-sim", "opt-partition-pruning"),
)
def ann_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third index lifecycle op, driver-checked end to end: build the
    IVF index from the base slice (vec_id ≢ 7 mod 8), fragment it with
    TWO incremental adds (the batch split mod 16 → every touched centroid
    partition gains two append files on top of the build's), then run
    compact_partitions (operators/compaction.py) — fragmented partitions
    are rewritten into right-sized files (maxRecordsPerFile=50000,
    reference parity feeder_hadoop.py:20), healthy ones stay
    byte-identical (asserted in tests/test_compaction.py, along with the
    file-census shrink the oracle can't see).

    The returned frame is the post-compact index read back from disk; the
    oracle is the SAME full-rebuild-equivalence statement as the add key —
    compaction must be a pure physical reorganization, changing file
    boundaries and nothing else. A compact that dropped or duplicated one
    row hash-mismatches here.

    Idempotent per sf_dir via the usual freshness + completion marker."""
    import os

    vecs = _vectors(spark, sf_dir)
    is_batch = F.pmod(F.col("vec_id"), F.lit(INCR_BATCH_MOD)) == INCR_BATCH_MOD - 1
    base = vecs.filter(~is_batch)
    n_base = base.count()
    if n_base == 0:
        return spark.createDataFrame([], "vec_id bigint, centroid_id bigint")
    k = auto_centroids(n_base)
    path = os.path.join(
        os.path.dirname(_ivf_index_path(sf_dir, k)), f"compact_lloyd1_c{k}"
    )
    marker = os.path.join(path, "_COMPACT_SUCCESS")
    if not (_ivf_index_is_fresh(path, sf_dir) and _incr_marker_fresh(marker, sf_dir)):
        from ..operators.compaction import compact_partitions

        ivf_build_index_frame(base, path, n_centroids=k)
        half = F.pmod(F.col("vec_id"), F.lit(2 * INCR_BATCH_MOD))
        batch = vecs.filter(is_batch)
        ivf_index_incremental_add(spark, path, batch.filter(half == INCR_BATCH_MOD - 1))
        ivf_index_incremental_add(
            spark, path, batch.filter(half == 2 * INCR_BATCH_MOD - 1)
        )
        compact_partitions(spark, os.path.join(path, "vectors"))
        open(marker, "w").close()
    idx = _layout_read(spark, os.path.join(path, "vectors"), "vectors")
    return idx.select(
        "vec_id", F.col("centroid_id").cast("bigint").alias("centroid_id")
    )


@register(
    "ann_lookup_compact",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        base AS (
            SELECT vec_id, emb FROM vecs WHERE vec_id % {INCR_BATCH_MOD} <> {INCR_BATCH_MOD - 1}
        ),
        {_lloyd_chain_sql(src="base")},
        ranked AS (
            SELECT v.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN c1 c
        )
        SELECT vec_id, centroid_id FROM ranked WHERE rn = 1
    """,
    tags=("ext-sim", "opt-partition-pruning"),
)
def ann_lookup_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction driver-checked on the LOOKUP layout: the id→centroid
    table is rewritten bucket-wise on every maintenance refresh, and each
    refresh's unclustered shuffle writes one file per task per touched
    bucket — a streamed deployment fragments it exactly like the vectors
    table. Fixture: build from the base slice, fold the add batch in as
    two incremental adds with a lookup-bucket refresh after EACH (the
    fragmenting workload), then compact_lookup (the shared
    compact_partitions keyed on the lookup's hash-bucket column).

    The returned frame is the post-compact LOOKUP read back from disk;
    the oracle is the same full-rebuild-equivalence statement as
    ann_index_compact — compaction must change file boundaries and
    nothing else, AND the lookup must still mirror the index's assignment
    exactly (a compact that dropped a bucket's rows, or a refresh that
    left one stale, hash-mismatches). File-census shrink and healthy-
    bucket byte-identity are pinned in tests/test_compaction.py."""
    import os

    from ..operators.ann_lookup import build_lookup, compact_lookup, refresh_lookup_buckets

    vecs = _vectors(spark, sf_dir)
    is_batch = F.pmod(F.col("vec_id"), F.lit(INCR_BATCH_MOD)) == INCR_BATCH_MOD - 1
    base = vecs.filter(~is_batch)
    n_base = base.count()
    if n_base == 0:
        return spark.createDataFrame([], "vec_id bigint, centroid_id bigint")
    k = auto_centroids(n_base)
    path = os.path.join(
        os.path.dirname(_ivf_index_path(sf_dir, k)), f"lkcompact_lloyd1_c{k}"
    )
    marker = os.path.join(path, "_LKCOMPACT_SUCCESS")
    if not (_ivf_index_is_fresh(path, sf_dir) and _incr_marker_fresh(marker, sf_dir)):
        ivf_build_index_frame(base, path, n_centroids=k)
        build_lookup(spark, path)
        half = F.pmod(F.col("vec_id"), F.lit(2 * INCR_BATCH_MOD))
        batch = vecs.filter(is_batch)
        for rem in (INCR_BATCH_MOD - 1, 2 * INCR_BATCH_MOD - 1):
            piece = batch.filter(half == rem)
            ivf_index_incremental_add(spark, path, piece)
            refresh_lookup_buckets(spark, path, piece.select("vec_id"))
        compact_lookup(spark, path)
        open(marker, "w").close()
    lk = _layout_read(spark, os.path.join(path, "lookup"), "lookup")
    return lk.select(
        "vec_id", F.col("centroid_id").cast("bigint").alias("centroid_id")
    )


@register("ann_ivf_topk_nprobe2", oracle=_ivf_oracle(2), tags=("ext-sim",))
def ann_ivf_topk_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall/cost trade-off's tuning knob, driver-checked at width 2:
    probes the query's two nearest centroids' buckets (~2/N_CENTROIDS of
    the table) before the exact in-bucket top-k. Recall is monotone in
    nprobe (tested); at scale each extra probe is one more pruned
    partition read, nothing else changes."""
    return ivf_topk(spark, sf_dir, nprobe=2)


@register(
    "embedding_quantize",
    oracle="""
        WITH m AS (
            SELECT vec_id, embedding,
                   CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
                       AS maxabs
            FROM embeddings
        )
        SELECT vec_id,
               CAST(i AS INT) AS pos,
               CASE WHEN maxabs > 0
                    THEN CAST(floor(CAST(embedding[i] AS DOUBLE) * 127.0 / maxabs) AS INT)
                    ELSE 0 END AS qv,
               CAST(maxabs / 127.0 AS DOUBLE) AS scale
        FROM m, UNNEST(generate_series(1, len(embedding))) AS t(i)
    """,
    tags=("ext-sim",),
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization per vector — the storage/serve
    form of an embedding index (4× smaller than float32, dot products in
    integer SIMD): qv = floor(x · 127 / max|x|), dequantize ≈ qv · scale.

    Engine-exact by construction: max|x| is a float32 max cast to double
    (no accumulation), and floor over the double product is the same IEEE
    operation in both engines — unlike round(), whose half-way tie rule
    differs across engines. Zero vectors quantize to 0 with scale 0.

    Scale shape: pure per-row Column algebra (transform/array_max/
    posexplode) — no shuffle, no UDF; the quantized table is written
    partitioned exactly like ivf_build_index's buckets in a real serving
    pipeline. Output is exploded to (vec_id, pos, qv) scalars so the
    driver's value-hash sees engine-portable primitives rather than
    engine-specific array renderings."""
    emb = load_table(spark, sf_dir, "embeddings")
    m = emb.select(
        "vec_id",
        "embedding",
        F.array_max(F.transform("embedding", F.abs)).cast("double").alias("maxabs"),
    )
    exploded = m.select(
        "vec_id",
        "maxabs",
        F.posexplode("embedding").alias("pos0", "x"),
    )
    qv = F.when(
        F.col("maxabs") > 0,
        F.floor(F.col("x").cast("double") * 127.0 / F.col("maxabs")).cast("int"),
    ).otherwise(F.lit(0))
    return exploded.select(
        "vec_id",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        qv.alias("qv"),
        (F.col("maxabs") / 127.0).alias("scale"),
    )


@register(
    "filtered_ann_topk",
    oracle=f"""
        WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        gated AS (
            SELECT e.vec_id, e.embedding
            FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
            WHERE e.vec_id <> 0 AND d.lang = 'en' AND d.n_chars >= 200
        )
        SELECT b.vec_id AS vec_id,
               {_COS_SQL.replace('a.embedding', 'q.embedding')} AS sim
        FROM gated b, q
        ORDER BY sim DESC, b.vec_id
        LIMIT 10
    """,
    tags=("ext-sim",),
)
def filtered_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid (metadata-filtered) similarity search: top-k cosine among
    the vectors whose DOCUMENT passes a quality gate (here lang='en' AND
    n_chars ≥ 200 — any corpus predicate slots in). This is the retrieval
    shape RAG/dedup pipelines actually run: filter-then-rank, never
    rank-then-filter (which under-fills k whenever the gate is
    selective).

    Scale shape: the gate is a semi-join of the vector table against the
    pushed-down document predicate — the predicate prunes at the document
    scan, the join carries only ids, and the cosine evaluates ONLY gated
    rows. Top-k is TakeOrderedAndProject (per-partition heaps). With the
    IVF index, the same gate applies inside probed buckets (pre-filtering
    ids before the distance evaluation, the standard filtered-ANN
    design); the brute-force form registered here is its exact oracle."""
    vecs = _vectors(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    gate = docs.filter((F.col("lang") == "en") & (F.col("n_chars") >= 200)).select(
        F.col("doc_id").alias("vec_id")
    )
    gated = vecs.filter(F.col("vec_id") != 0).join(gate, "vec_id", "left_semi")
    q = F.broadcast(vecs.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb")))
    sim = F.round(cosine(F.col("embedding"), F.col("q_emb")), 6)
    return (
        gated.crossJoin(q)
        .select("vec_id", sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(10)
    )


#: Within-cluster similarity floor for semantic_dedup — the harness
#: embeddings put their synthetic near-dup pairs at cosine 0.45–0.6
#: (NEAR_DUP_TAU); production SemDeDup thresholds sit at 0.9+ where
#: clusters are tighter and the within-cluster pair count collapses.
SEMANTIC_TAU = NEAR_DUP_TAU


@register(
    "semantic_dedup",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        centroids AS (
            SELECT vec_id AS centroid_id, emb AS c_emb
            FROM vecs WHERE vec_id < {AUTO_K_SQL}
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
        assigned AS (SELECT vec_id, emb, centroid_id FROM ranked WHERE rn = 1)
        SELECT a.centroid_id AS centroid_id,
               a.vec_id AS a_id, b.vec_id AS b_id,
               round(list_cosine_similarity(a.emb, b.emb), 6) AS sim
        FROM assigned a JOIN assigned b
          ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= {SEMANTIC_TAU}
    """,
    tags=("ext-sim", "ext-dedup"),
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the embedding space,
    then find exact-cosine near-dup pairs ONLY within each cluster — the
    cluster assignment replaces LSH banding as the candidate generator
    (Abbas et al. 2023's recipe for web-scale corpora, built here from the
    engine's own deterministic k-means/IVF assignment).

    Plan: the IVF assignment (broadcast argmax-cosine against the first-N
    deterministic centroids, round-9 + id tie-break) buckets every vector;
    the pair generator is then a self-equi-join ON centroid_id — quadratic
    only within a bucket, never across the corpus — and candidates pay one
    exact cosine with the shared 6-decimal output round. The assigned
    table is persisted so the self-join's two sides read one materialized
    pass instead of re-running the assignment per side.

    At 100 TB: k scales with the corpus (SemDeDup uses k ≈ n/20k, keeping
    buckets ~10⁴ vectors), the assignment stays a broadcast against ≤10⁵
    centroids, and the self-join shuffles on centroid_id with AQE handling
    bucket skew. Pairs crossing a cluster boundary are the documented
    recall trade — the same miss class as LSH band non-collision; raising
    nprobe-style multi-assignment (assign each vector to its 2 nearest
    centroids, dedup pairs) recovers boundary pairs at 2× assignment cost.
    The within-cluster metric is exact, so precision is 1.0 by
    construction."""
    vecs = _vectors(spark, sf_dir)
    return semantic_dedup_pairs(vecs, None, SEMANTIC_TAU)


def semantic_dedup_pairs(
    vecs: DataFrame, n_centroids: int | None, tau: float, nprobe: int = 1
) -> DataFrame:
    """The parameterized SemDeDup core: k IS the scale knob. With k fixed,
    clusters grow with the corpus and the within-cluster pair stage is
    quadratic (measured: 3.35× of 10×-linear at ×10 vectors with k=8 —
    tools/ext_stress.py); scaling k with the corpus (SemDeDup's k ≈ n/20k)
    holds expected cluster size constant and returns the stage to linear
    (also measured there, k×10 at corpus×10). The registered query pins
    k=None — the corpus-derived auto-k (n // IVF_TARGET_BUCKET, the
    SemDeDup k ≈ n/bucket rule made the DEFAULT), which its oracle
    replays via the same derivation (AUTO_K_SQL). The assignment itself
    IS _ivf_ranked — one recipe, not a copy, so the rounding/tie-break
    contract cannot drift between the IVF and SemDeDup paths.

    ``nprobe`` is the boundary-recovery knob: vectors assigned to their
    nprobe nearest centroids, pairs meeting in ANY shared bucket. With
    nprobe > 1 a pair can collide in several buckets, so the per-bucket
    centroid column is dropped and the post-threshold result is
    DISTINCT'd (bounded by true pairs, not candidates)."""
    assigned = (
        _ivf_ranked(vecs, n_centroids)
        .filter(F.col("rn") <= nprobe)
        .select("vec_id", "embedding", "centroid_id")
        .persist()
    )
    assigned.count()  # materialize once; the self-join reads the cache twice
    a, b = assigned.alias("a"), assigned.alias("b")
    sim = F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6)
    pairs = (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.centroid_id").alias("centroid_id"),
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= F.lit(tau))
    )
    if nprobe == 1:
        return pairs
    return pairs.select("a_id", "b_id", "sim").distinct()


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the compression half of an IVFPQ-style index
# ---------------------------------------------------------------------------
#
# Split the embedding into PQ_M contiguous sub-vectors, train a tiny k-means
# codebook per sub-space (first-k deterministic init, like the IVF path), and
# encode every vector as PQ_M small codes. ADC (asymmetric distance
# computation) then answers queries from a per-block lookup table without
# touching the original floats. Distances are squared-L2 computed as the
# same sequential left fold both engines use for the cosine (zip_with +
# aggregate / list_zip + list_reduce), rounded to 9 before every argmin.

PQ_M = 16           # sub-spaces
PQ_SUB = EMB_DIM // PQ_M
PQ_K = 16           # codebook entries per sub-space (4 bits here; 256 in prod)
PQ_TOPK = 5
#: ADC is a SHORTLIST generator, not a ranker: on concentrated synthetic
#: distances the quantization error swamps top-5 margins. (The 2-bit and
#: 6-bit numbers below are from earlier SIZING EXPERIMENTS, not the
#: shipped 4-bit shape: direct ADC top-5 overlap with exact ≈ 0 at 2-bit
#: books, ≤1/5 at 6-bit.) With the shipped 16×16 (4-bit) shape the exact
#: top-5 sits inside the ADC top-50 at 4/5–5/5 across all sf dirs — so
#: the registered query re-ranks the shortlist exactly, which is
#: precisely how production IVFPQ serves.
PQ_SHORTLIST = 50


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance between two array<double> columns — sequential
    left fold, bit-identical to the oracle's list_reduce."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _l2sq_sql(x: str, y: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({x}, {y}), "
        f"p -> (p[1] - p[2]) * (p[1] - p[2])), (a, c) -> a + c)"
    )


def _pq_subvectors(vecs: DataFrame) -> DataFrame:
    """(vec_id, block, sub array<double>) — row-local block split."""
    blocks = F.array(
        *[
            F.struct(
                F.lit(b).alias("block"),
                F.slice("embedding", b * PQ_SUB + 1, PQ_SUB).alias("sub"),
            )
            for b in range(PQ_M)
        ]
    )
    return vecs.select("vec_id", F.explode(blocks).alias("bs")).select(
        "vec_id", F.col("bs.block").alias("block"), F.col("bs.sub").alias("sub")
    )


def _pq_codebook(sub: DataFrame) -> DataFrame:
    """One Lloyd step per sub-space from the first-PQ_K deterministic seed:
    (block, cid, c_sub). The block is part of every key, so all PQ_M
    codebooks train in the SAME two aggregates — no per-block loop."""
    c0 = sub.filter(F.col("vec_id") < PQ_K).select(
        "block", F.col("vec_id").alias("cid"), F.col("sub").alias("c_sub")
    )
    d = F.round(l2sq(F.col("sub"), F.col("c_sub")), 9)
    ranked = (
        sub.join(F.broadcast(c0), "block")
        .select("vec_id", "block", "sub", "cid", d.alias("d"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id", "block").orderBy("d", "cid")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    means = (
        ranked.select("block", "cid", F.posexplode("sub").alias("pos", "val"))
        .groupBy("block", "cid", "pos")
        .agg(
            (F.sum(F.col("val").cast("decimal(38,9)")).cast("double") / F.count("*")).alias("m")
        )
    )
    return (
        means.groupBy("block", "cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("block", "cid", F.transform("pm", lambda s: s["m"]).alias("c_sub"))
    )


def _pq_assign(sub: DataFrame, codebook: DataFrame) -> DataFrame:
    """(vec_id, block, code, qd) — nearest codebook entry per sub-vector,
    with the round-6 quantization distance."""
    d = F.round(l2sq(F.col("sub"), F.col("c_sub")), 9)
    return (
        sub.join(F.broadcast(codebook), "block")
        .select("vec_id", "block", "cid", d.alias("d"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id", "block").orderBy("d", "cid")
            ),
        )
        .filter(F.col("rn") == 1)
        # qd stays at the argmin's own 9-decimal round: re-rounding a
        # rounded double to 6 hits half-way ties where the engines'
        # round() semantics differ (BigDecimal-on-shortest-string vs
        # binary-value) — probed at sf0.1, block 15 vec 1655
        .select("vec_id", "block", F.col("cid").alias("code"), F.col("d").alias("qd"))
    )


def _pq_chain_sql(src: str = "vecs", prefix: str = "") -> str:
    """The PQ trainer+encoder CTE chain — block split of ``src``, one-step
    Lloyd codebook from the first-PQ_K seed, argmin encode — parameterized
    the same way as _lloyd_chain_sql so the incremental-IVFPQ oracle can
    train on the ``base`` slice under namespaced CTEs while the default
    rendering stays byte-identical to the long-green _PQ_CTES text (the
    registered oracles' strings must not drift from a refactor)."""
    p = prefix
    return f"""{p}sub AS (
            SELECT vec_id, bl.block,
                   (emb)[bl.block * {PQ_SUB} + 1 : bl.block * {PQ_SUB} + {PQ_SUB}] AS s
            FROM {src}, (SELECT unnest(range(0, {PQ_M})) AS block) bl
        ),
        {p}c0 AS (
            SELECT block, vec_id AS cid, s AS c_sub FROM {p}sub WHERE vec_id < {PQ_K}
        ),
        {p}a1 AS (
            SELECT vec_id, block, s, cid FROM (
                SELECT {p}sub.vec_id, {p}sub.block, {p}sub.s, {p}c0.cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY {p}sub.vec_id, {p}sub.block
                           ORDER BY round({_l2sq_sql(f'{p}sub.s', f'{p}c0.c_sub')}, 9), {p}c0.cid
                       ) AS rn
                FROM {p}sub JOIN {p}c0 ON {p}sub.block = {p}c0.block
            ) WHERE rn = 1
        ),
        {p}m1 AS (
            SELECT block, cid, pos - 1 AS pos,
                   CAST(SUM(CAST(val AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS m
            FROM (
                SELECT block, cid, unnest(s) AS val, generate_subscripts(s, 1) AS pos
                FROM {p}a1
            )
            GROUP BY block, cid, pos
        ),
        {p}cb AS (
            SELECT block, cid, list(m ORDER BY pos) AS c_sub FROM {p}m1 GROUP BY block, cid
        ),
        {p}codes AS (
            SELECT vec_id, block, cid AS code, d AS qd FROM (
                SELECT {p}sub.vec_id, {p}sub.block, {p}cb.cid,
                       round({_l2sq_sql(f'{p}sub.s', f'{p}cb.c_sub')}, 9) AS d,
                       ROW_NUMBER() OVER (
                           PARTITION BY {p}sub.vec_id, {p}sub.block
                           ORDER BY round({_l2sq_sql(f'{p}sub.s', f'{p}cb.c_sub')}, 9), {p}cb.cid
                       ) AS rn
                FROM {p}sub JOIN {p}cb ON {p}sub.block = {p}cb.block
            ) WHERE rn = 1
        )"""


_PQ_CTES = f"""
        vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        {_pq_chain_sql()}"""


@register(
    "pq_encode",
    oracle=f"""
        WITH {_PQ_CTES}
        SELECT vec_id, block, code, qd FROM codes
    """,
    tags=("ext-sim",),
)
def pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: train PQ_M per-sub-space codebooks
    (one deterministic Lloyd step from the first-PQ_K seed) and emit every
    vector's code per block with its quantization distance — the
    compressed form an IVFPQ index stores (PQ_M small codes per vector
    instead of EMB_DIM floats; PQ_K=16 → 4 bits/block here, 8 in
    production).

    Plan: the block split is a row-local explode (no shuffle); ALL
    sub-space codebooks train in the same two jobs because block is part
    of every key — a broadcast argmin against PQ_M·PQ_K codebook rows
    (WindowGroupLimit keeps one row per (vec, block)) and one
    decimal-exact mean aggregate carrying PQ_M·PQ_K·PQ_SUB rows. Encoding
    is the same broadcast argmin against the trained book. The oracle
    replays seed, fold, round-9 argmin, and decimal means verbatim.

    At 100 TB: codebooks train on a sample (exactly as IVF centroids do),
    the encode pass is scan + broadcast argmin — embarrassingly parallel,
    no shuffle of the vector table — and the output is written alongside
    the IVF partition layout for ADC serving (ann_pq_adc_topk)."""
    vecs = _vectors(spark, sf_dir)
    sub = _pq_subvectors(vecs).persist()
    sub.count()  # codebook + encode both read the split; materialize once
    cb = _pq_codebook(sub)
    return _pq_assign(sub, cb)


@register(
    "ann_pq_adc_topk",
    oracle=f"""
        WITH {_PQ_CTES},
        q AS (SELECT block, s AS q_sub FROM sub WHERE vec_id = 0),
        dtable AS (
            SELECT cb.block, cb.cid,
                   round({_l2sq_sql('q.q_sub', 'cb.c_sub')}, 9) AS d
            FROM cb JOIN q ON cb.block = q.block
        ),
        adc AS (
            SELECT c.vec_id,
                   CAST(SUM(CAST(d.d AS DECIMAL(28,9))) AS DOUBLE) AS adc_dist
            FROM codes c JOIN dtable d ON c.block = d.block AND c.code = d.cid
            WHERE c.vec_id <> 0
            GROUP BY c.vec_id
        ),
        shortlist AS (
            SELECT vec_id FROM adc ORDER BY adc_dist, vec_id LIMIT {PQ_SHORTLIST}
        ),
        qv AS (SELECT emb AS q_emb FROM vecs WHERE vec_id = 0)
        SELECT v.vec_id,
               round({_l2sq_sql('v.emb', 'qv.q_emb')}, 6) AS l2_dist
        FROM vecs v JOIN shortlist s ON v.vec_id = s.vec_id CROSS JOIN qv
        ORDER BY l2_dist, v.vec_id
        LIMIT {PQ_TOPK}
    """,
    tags=("ext-sim",),
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ-style serving: ADC (asymmetric distance computation) builds a
    SHORTLIST from PQ codes alone, then the exact distance re-ranks the
    shortlist — the two-stage recipe every production PQ index uses. The
    query keeps its exact sub-vectors, each codebook entry gets ONE
    precomputed distance per block (a PQ_M×PQ_K lookup table), every
    database vector's approximate distance is the sum of table entries
    selected by its codes, and only the top-PQ_SHORTLIST candidates pay a
    float read.

    ADC is deliberately NOT the final ranker: on this corpus the exact
    top-5 margins are smaller than the quantization error (measured —
    direct ADC top-5 overlap with exact is ~0), but the exact top-5 sits
    inside the ADC top-50 at 4/5–5/5 across every sf dir (recall floor
    pinned in tests). That measurement is the PQ_M/PQ_K sizing rationale
    at PQ_SHORTLIST's definition.

    Plan: distance table = PQ_M·PQ_K rows (broadcast); per-vector ADC =
    one hash aggregate over codes through DECIMAL (order-independent);
    shortlist = TakeOrderedAndProject over |vectors| scalar rows; re-rank
    = semi-join of the float table against 50 ids + exact fold + top-k.
    At 100 TB the same stages run inside probed IVF buckets: codes are
    bytes (PQ_M·log₂PQ_K bits/vector), floats are touched for 50 rows."""
    vecs = _vectors(spark, sf_dir)
    sub = _pq_subvectors(vecs).persist()
    sub.count()
    cb = _pq_codebook(sub).persist()
    cb.count()  # read twice: dtable + encode
    codes = _pq_assign(sub, cb).select("vec_id", "block", "code")
    return _adc_shortlist_rerank(vecs, sub, cb, codes)


def _adc_shortlist_rerank(
    vecs: DataFrame, sub: DataFrame, cb: DataFrame, codes: DataFrame
) -> DataFrame:
    """The ADC serving tail — distance table, fixed-point ADC aggregate,
    shortlist, exact re-rank — over whatever ``codes`` table the caller
    restricts to (the full corpus for ann_pq_adc_topk, the probed IVF
    buckets for ann_ivfpq_topk). ONE implementation: the fixed-point
    scaling and round placements here were each tuned once for
    cross-engine tie bugs (see _pq_assign's qd note), so the two serving
    paths must not carry separate copies."""
    q_sub = sub.filter(F.col("vec_id") == 0).select(
        "block", F.col("sub").alias("q_sub")
    )
    dtable = F.broadcast(
        cb.join(q_sub, "block").select(
            "block",
            "cid",
            F.round(l2sq(F.col("q_sub"), F.col("c_sub")), 9).alias("d"),
        )
    ).alias("d")
    c = codes.alias("c")
    adc = (
        c.filter(F.col("c.vec_id") != 0)
        .join(dtable, (F.col("c.block") == F.col("d.block")) & (F.col("c.code") == F.col("d.cid")))
        .groupBy(F.col("c.vec_id").alias("vec_id"))
        .agg(
            (
                F.sum(F.round(F.col("d.d") * F.lit(10.0**9)).cast("bigint")).cast("double")
                / F.lit(10.0**9)
            ).alias("adc_dist")
        )
    )
    shortlist = adc.orderBy("adc_dist", "vec_id").limit(PQ_SHORTLIST).select("vec_id")
    q_emb = F.broadcast(
        vecs.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    )
    rerank = (
        vecs.join(shortlist, "vec_id", "left_semi")
        .crossJoin(q_emb)
        .select(
            "vec_id", F.round(l2sq(F.col("embedding"), F.col("q_emb")), 6).alias("l2_dist")
        )
    )
    return rerank.orderBy("l2_dist", "vec_id").limit(PQ_TOPK)


#: IVFPQ probe width — 2 of N_CENTROIDS buckets, the same nprobe the
#: plain-IVF nprobe2 key uses, so the two stages' knobs stay comparable.
IVFPQ_NPROBE = 2


#: The IVFPQ probe→ADC→re-rank replay, shared by the in-query composition
#: key (ann_ivfpq_topk) and the materialized-index serving key
#: (ann_ivfpq_index_serve): the index is a PURE materialization of the
#: same deterministic recipe, so the two keys must hash-match the same
#: oracle — one SQL definition keeps that contract honest.
_IVFPQ_ORACLE = f"""
        WITH {_PQ_CTES},
        {_lloyd_chain_sql(prefix="iv")},
        iranked AS (
            SELECT v.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN ivc1 c
        ),
        assigned AS (SELECT vec_id, centroid_id FROM iranked WHERE rn = 1),
        q_probes AS (
            SELECT centroid_id FROM iranked WHERE vec_id = 0 AND rn <= {IVFPQ_NPROBE}
        ),
        bucket AS (
            SELECT a.vec_id FROM assigned a JOIN q_probes p USING (centroid_id)
        ),
        q AS (SELECT block, s AS q_sub FROM sub WHERE vec_id = 0),
        dtable AS (
            SELECT cb.block, cb.cid,
                   round({_l2sq_sql('q.q_sub', 'cb.c_sub')}, 9) AS d
            FROM cb JOIN q ON cb.block = q.block
        ),
        adc AS (
            SELECT c.vec_id,
                   CAST(SUM(CAST(d.d AS DECIMAL(28,9))) AS DOUBLE) AS adc_dist
            FROM codes c
            JOIN bucket bk ON c.vec_id = bk.vec_id
            JOIN dtable d ON c.block = d.block AND c.code = d.cid
            WHERE c.vec_id <> 0
            GROUP BY c.vec_id
        ),
        shortlist AS (
            SELECT vec_id FROM adc ORDER BY adc_dist, vec_id LIMIT {PQ_SHORTLIST}
        ),
        qv AS (SELECT emb AS q_emb FROM vecs WHERE vec_id = 0)
        SELECT v.vec_id,
               round({_l2sq_sql('v.emb', 'qv.q_emb')}, 6) AS l2_dist
        FROM vecs v JOIN shortlist s ON v.vec_id = s.vec_id CROSS JOIN qv
        ORDER BY l2_dist, v.vec_id
        LIMIT {PQ_TOPK}
    """


@register("ann_ivfpq_topk", oracle=_IVFPQ_ORACLE, tags=("ext-sim",))
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMBINED IVF+PQ serving shape — what a production vector index
    actually executes per query: probe the query's IVFPQ_NPROBE nearest
    IVF buckets, run the ADC shortlist over the PQ codes of the probed
    buckets only, re-rank the shortlist with exact distances. Composes
    the two registered halves (`ann_ivf_topk_nprobe2`'s probe,
    `ann_pq_adc_topk`'s ADC) without re-implementing either: the IVF
    assignment is `_ivf_ranked` (the shared recipe), the PQ stages are
    `_pq_subvectors`/`_pq_codebook`/`_pq_assign` verbatim; the codebook
    trains on the full corpus exactly as production IVFPQ trains
    globally and serves per-bucket.

    Scale shape: the assignment and codes are precomputable artifacts
    (ivf_build_index writes the bucket layout partitioned by
    centroid_id; codes are PQ_M·log₂PQ_K bits/vector next to them). A
    query then reads nprobe partitions of CODES (bytes, partition-
    pruned), broadcasts a PQ_M×PQ_K distance table, hash-aggregates ADC,
    and touches floats for PQ_SHORTLIST rows — no full-corpus stage
    anywhere."""
    vecs = _vectors(spark, sf_dir)
    ranked = _ranked_lloyd(vecs)
    assigned = ranked.filter(F.col("rn") == 1).select("vec_id", "centroid_id")
    q_probes = F.broadcast(
        ranked.filter((F.col("vec_id") == 0) & (F.col("rn") <= IVFPQ_NPROBE)).select(
            F.col("centroid_id").alias("q_centroid")
        )
    )
    bucket_ids = assigned.join(
        q_probes, assigned.centroid_id == F.col("q_centroid")
    ).select("vec_id")
    sub = _pq_subvectors(vecs).persist()
    sub.count()
    cb = _pq_codebook(sub).persist()
    cb.count()  # read twice: dtable + encode
    codes = _pq_assign(sub, cb).select("vec_id", "block", "code")
    codes_in = codes.join(bucket_ids, "vec_id", "left_semi")
    return _adc_shortlist_rerank(vecs, sub, cb, codes_in)


def _ivfpq_index_path(sf_dir: str, k: int) -> str:
    """Recipe-tagged IVFPQ index directory (see _ivf_index_path: any
    change to the assignment or codebook constants must mint a NEW
    directory, never silently serve a stale recipe)."""
    import os

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    warehouse = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "spark-warehouse"
    )
    return os.path.join(
        warehouse, f"ivfpq_{tag}", f"index_lloyd1_c{k}_m{PQ_M}_k{PQ_K}"
    )


def ivfpq_build_index(
    spark: SparkSession, sf_dir: str, path: str, n_centroids: int | None = None
) -> None:
    """Materialize the full IVFPQ index — what ann_ivfpq_topk's docstring
    promises is precomputable, written once so serving never trains:

    - ``codebook/``: (block, cid, c_sub) — the trained PQ codebook,
      PQ_M·PQ_K rows (dimension-sized; read whole at serve time).
    - ``centroids/``: the Lloyd-refined coarse quantizer (lloyd_centroids
      — sample seed + one kmeans_step, the recipe ann_recall_lloyd prices)
      — stored so serving AND incremental adds rank against the frozen
      trained frame instead of retraining.
    - ``vectors/``: (vec_id, embedding, codes array<int> in block order),
      written partitionBy(centroid_id) — a probe reads nprobe
      DIRECTORIES via partition pruning. Codes ride NEXT TO the floats in
      the same row so the ADC scan and the shortlist re-rank both come
      from the probed partitions (at 100 TB the codes column is
      PQ_M·log₂PQ_K bits/vector and parquet column pruning means the ADC
      pass never decodes the float column).

    The codebook is written FIRST so an interrupted build can never leave
    a vectors/_SUCCESS without its codebook; freshness is checked on both
    (see _ivfpq_index_is_fresh)."""
    ivfpq_build_index_frame(_vectors(spark, sf_dir), path, n_centroids)


def ivfpq_build_index_frame(
    vecs: DataFrame, path: str, n_centroids: int | None = None
) -> None:
    """ivfpq_build_index over an explicit (vec_id, embedding) frame — the
    incremental-add key builds from its ``base`` slice through this."""
    import os

    spark = vecs.sparkSession
    sub = _pq_subvectors(vecs).persist()
    sub.count()
    cb = _pq_codebook(sub)
    cb.write.mode("overwrite").parquet(os.path.join(path, "codebook"))
    cb_r = _layout_read(spark, os.path.join(path, "codebook"), "codebook")
    codes_arr = (
        _pq_assign(sub, cb_r)
        .groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("block", "code"))).alias("bc"))
        .select("vec_id", F.transform("bc", lambda s: s["code"]).alias("codes"))
    )
    cent = lloyd_centroids(
        vecs, n_centroids if n_centroids is not None else auto_centroids(vecs.count())
    )
    cent.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    cent_r = _layout_read(spark, os.path.join(path, "centroids"), "centroids")
    assigned = _ranked_against(vecs, cent_r).filter(F.col("rn") == 1).select(
        "vec_id", "embedding", "centroid_id"
    )
    assigned.join(codes_arr, "vec_id").write.partitionBy("centroid_id").mode(
        "overwrite"
    ).parquet(os.path.join(path, "vectors"))
    sub.unpersist()


def ivfpq_index_incremental_add(
    spark: SparkSession, path: str, batch: DataFrame, skip_existing: bool = False,
    schema_memo: dict | None = None,
) -> list[int]:
    """Fold an embedding batch into a materialized IVFPQ index with BOTH
    trained artifacts frozen: the batch's PQ codes come from the STORED
    codebook (retraining it would silently re-mean every existing code's
    reconstruction), its coarse assignment from the STORED centroids, and
    the joined rows APPEND to the touched centroid partitions — the
    ivf_index_incremental_add contract extended to the compressed index.
    ``skip_existing`` gives the same replay idempotency (anti-join against
    the touched partitions only). Returns the touched centroid ids."""
    import os

    cb_r = _memo_read(spark, os.path.join(path, "codebook"), schema_memo)
    cent_r = _memo_read(spark, os.path.join(path, "centroids"), schema_memo)
    codes_arr = (
        _pq_assign(_pq_subvectors(batch), cb_r)
        .groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("block", "code"))).alias("bc"))
        .select("vec_id", F.transform("bc", lambda s: s["code"]).alias("codes"))
    )
    # one assignment job feeds every use below (_collect_touched)
    assigned, touched = _collect_touched(
        _ranked_against(batch, cent_r)
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "centroid_id")
        .join(codes_arr, "vec_id"),
        "centroid_id",
    )
    if skip_existing and touched:
        existing = (
            _memo_read(spark, os.path.join(path, "vectors"), schema_memo)
            .filter(F.col("centroid_id").isin(touched))
            .select("vec_id")
        )
        out = assigned.join(existing, "vec_id", "left_anti")
    else:
        out = assigned
    out.write.mode("append").partitionBy("centroid_id").parquet(
        os.path.join(path, "vectors")
    )
    return touched


def _ivfpq_incr_index_path(sf_dir: str, k: int) -> str:
    import os

    return os.path.join(
        os.path.dirname(_ivfpq_index_path(sf_dir, k)),
        f"incr_lloyd1_c{k}_m{PQ_M}_k{PQ_K}",
    )


@register(
    "ann_ivfpq_incremental_add",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        base AS (
            SELECT vec_id, emb FROM vecs WHERE vec_id % {INCR_BATCH_MOD} <> {INCR_BATCH_MOD - 1}
        ),
        {_lloyd_chain_sql(src="base")},
        {_pq_chain_sql(src="base", prefix="p")},
        allsub AS (
            SELECT vec_id, bl.block,
                   (emb)[bl.block * {PQ_SUB} + 1 : bl.block * {PQ_SUB} + {PQ_SUB}] AS s
            FROM vecs, (SELECT unnest(range(0, {PQ_M})) AS block) bl
        ),
        allcodes AS (
            SELECT vec_id, block, cid AS code FROM (
                SELECT allsub.vec_id, allsub.block, pcb.cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY allsub.vec_id, allsub.block
                           ORDER BY round({_l2sq_sql('allsub.s', 'pcb.c_sub')}, 9), pcb.cid
                       ) AS rn
                FROM allsub JOIN pcb ON allsub.block = pcb.block
            ) WHERE rn = 1
        ),
        ranked AS (
            SELECT v.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN c1 c
        ),
        assigned AS (SELECT vec_id, centroid_id FROM ranked WHERE rn = 1)
        SELECT a.vec_id, a.centroid_id, c.block, c.code
        FROM assigned a JOIN allcodes c ON a.vec_id = c.vec_id
    """,
    tags=("ext-sim", "opt-partition-pruning"),
)
def ann_ivfpq_incremental_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance for the COMPRESSED index, driver-checked:
    build the IVFPQ index from the base slice (codebook + coarse
    centroids trained there, both stored), fold the arriving ~12.5% in
    via ivfpq_index_incremental_add — codes from the frozen codebook,
    cells from the frozen centroids, partition-scoped append — and return
    the full post-add index exploded to (vec_id, centroid_id, block,
    code). The oracle is the rebuild-equivalence statement with BOTH
    artifacts frozen: train on base, encode and assign everything against
    those artifacts. At 100 TB this is the difference between re-encoding
    the corpus per embedding batch and touching batch-sized bytes: the PQ
    codes of existing vectors are immutable once written, exactly like
    the float rows.

    Same idempotency recipe as the IVF twin (source-mtime freshness + an
    add-completion marker)."""
    import os

    vecs = _vectors(spark, sf_dir)
    is_batch = F.pmod(F.col("vec_id"), F.lit(INCR_BATCH_MOD)) == INCR_BATCH_MOD - 1
    base = vecs.filter(~is_batch)
    batch = vecs.filter(is_batch)
    n_base = base.count()
    if n_base == 0:
        return spark.createDataFrame(
            [], "vec_id bigint, centroid_id bigint, block bigint, code bigint"
        )
    k = auto_centroids(n_base)
    path = _ivfpq_incr_index_path(sf_dir, k)
    marker = os.path.join(path, "_INCR_SUCCESS")
    if not (_ivfpq_index_is_fresh(path, sf_dir) and _incr_marker_fresh(marker, sf_dir)):
        ivfpq_build_index_frame(base, path, n_centroids=k)
        ivfpq_index_incremental_add(spark, path, batch)
        open(marker, "w").close()
    idx = _layout_read(spark, os.path.join(path, "vectors"), "vectors_ivfpq")
    return idx.select(
        "vec_id",
        F.col("centroid_id").cast("bigint").alias("centroid_id"),
        F.posexplode("codes").alias("block", "code"),
    ).select(
        "vec_id",
        "centroid_id",
        F.col("block").cast("bigint").alias("block"),
        F.col("code").cast("bigint").alias("code"),
    )


def _ivfpq_del_index_path(sf_dir: str, k: int) -> str:
    import os

    return os.path.join(
        os.path.dirname(_ivfpq_index_path(sf_dir, k)),
        f"del_lloyd1_c{k}_m{PQ_M}_k{PQ_K}",
    )


@register(
    "ann_ivfpq_index_delete",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        {_lloyd_chain_sql(src="vecs")},
        {_pq_chain_sql(src="vecs", prefix="p")},
        allsub AS (
            SELECT vec_id, bl.block,
                   (emb)[bl.block * {PQ_SUB} + 1 : bl.block * {PQ_SUB} + {PQ_SUB}] AS s
            FROM vecs, (SELECT unnest(range(0, {PQ_M})) AS block) bl
        ),
        allcodes AS (
            SELECT vec_id, block, cid AS code FROM (
                SELECT allsub.vec_id, allsub.block, pcb.cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY allsub.vec_id, allsub.block
                           ORDER BY round({_l2sq_sql('allsub.s', 'pcb.c_sub')}, 9), pcb.cid
                       ) AS rn
                FROM allsub JOIN pcb ON allsub.block = pcb.block
            ) WHERE rn = 1
        ),
        ranked AS (
            SELECT v.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN c1 c
        ),
        assigned AS (SELECT vec_id, centroid_id FROM ranked WHERE rn = 1)
        SELECT a.vec_id, a.centroid_id, c.block, c.code
        FROM assigned a JOIN allcodes c ON a.vec_id = c.vec_id
        WHERE a.vec_id % {DEL_MOD} <> {DEL_REM}
    """,
    tags=("ext-sim", "opt-partition-pruning"),
)
def ann_ivfpq_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Takedown on the COMPRESSED index, driver-checked: build the full
    IVFPQ index, delete the same mod-class takedown set as
    ann_index_delete through the SAME layout-agnostic ivf_index_delete
    (the codes column rides the partition rewrite unchanged — one delete
    implementation serves both flat layouts), and return the post-delete
    index exploded to (vec_id, centroid_id, block, code). Both trained
    artifacts (codebook + coarse centroids) stay frozen through deletes,
    so the oracle is the full train/encode/assign chain minus the
    deleted ids — the deletion-equivalence twin of the add key's
    rebuild equivalence."""
    import os

    vecs = _vectors(spark, sf_dir)
    n = vecs.count()
    if n == 0:
        return spark.createDataFrame(
            [], "vec_id bigint, centroid_id bigint, block bigint, code bigint"
        )
    k = auto_centroids(n)
    path = _ivfpq_del_index_path(sf_dir, k)
    marker = os.path.join(path, "_DEL_SUCCESS")
    if not (_ivfpq_index_is_fresh(path, sf_dir) and _incr_marker_fresh(marker, sf_dir)):
        ivfpq_build_index_frame(vecs, path, n_centroids=k)
        ivf_index_delete(
            spark,
            path,
            vecs.filter(
                F.pmod(F.col("vec_id"), F.lit(DEL_MOD)) == DEL_REM
            ).select("vec_id"),
        )
        open(marker, "w").close()
    idx = _layout_read(spark, os.path.join(path, "vectors"), "vectors_ivfpq")
    return idx.select(
        "vec_id",
        F.col("centroid_id").cast("bigint").alias("centroid_id"),
        F.posexplode("codes").alias("block", "code"),
    ).select(
        "vec_id",
        "centroid_id",
        F.col("block").cast("bigint").alias("block"),
        F.col("code").cast("bigint").alias("code"),
    )


def _ivfpq_index_is_fresh(path: str, sf_dir: str) -> bool:
    import os

    from ..io import materialization_is_fresh

    src = os.path.join(sf_dir, "embeddings.parquet")
    return (
        materialization_is_fresh(os.path.join(path, "vectors"), src)
        and materialization_is_fresh(os.path.join(path, "codebook"), src)
        and materialization_is_fresh(os.path.join(path, "centroids"), src)
    )


@register(
    "ann_ivfpq_index_serve",
    oracle=_IVFPQ_ORACLE,
    tags=("ext-sim", "opt-partition-pruning"),
)
def ann_ivfpq_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The build-once/probe-cheap IVFPQ path, driver-checked end to end:
    ivfpq_build_index writes the bucket-partitioned codes+floats and the
    trained codebook once per sf_dir (idempotent: _SUCCESS + source-mtime
    freshness + recipe-tagged path); serving then touches NO full-corpus
    stage and trains NOTHING —

    - the probe set is two driver-side control scalars (the query vector
      and its IVFPQ_NPROBE nearest centroids, exactly ivf_index_probe's
      pattern);
    - the isin() filter on the partition column prunes at planning time:
      only the probed centroid DIRECTORIES are read (plan-asserted in
      tests — PartitionFilters on centroid_id feeding the ADC aggregate);
    - the distance table is the stored codebook joined to the query's
      sub-vectors (PQ_M·PQ_K rows, broadcast);
    - ADC explodes the stored block-ordered codes array and
      hash-aggregates; the exact re-rank reads floats for the
      PQ_SHORTLIST survivors from the SAME pruned scan.

    Same deterministic recipe as ann_ivfpq_topk, so the oracle is the
    SAME replay (_IVFPQ_ORACLE) — the driver hash-check proves the
    materialized index serves identical results to the in-query
    composition."""
    import os

    vecs = _vectors(spark, sf_dir)
    # derive auto-k ONCE: path identity, build, and probe assignment all
    # share it (three redundant count jobs otherwise)
    k_auto = auto_centroids(vecs.count())
    path = _ivfpq_index_path(sf_dir, k_auto)
    if not _ivfpq_index_is_fresh(path, sf_dir):
        ivfpq_build_index(spark, sf_dir, path, n_centroids=k_auto)
    q_row = vecs.filter(F.col("vec_id") == 0).select("embedding").head()
    if q_row is None:
        return spark.createDataFrame([], "vec_id bigint, l2_dist double")
    probes = [
        r["centroid_id"]
        for r in _ranked_against(
            vecs.filter(F.col("vec_id") == 0),
            _layout_read(spark, os.path.join(path, "centroids"), "centroids"),
        )
        .filter(F.col("rn") <= IVFPQ_NPROBE)
        .select("centroid_id")
        .collect()
    ]
    idx = _layout_read(spark, os.path.join(path, "vectors"), "vectors_ivfpq").filter(
        F.col("centroid_id").isin(probes)
    )
    cb_r = _layout_read(spark, os.path.join(path, "codebook"), "codebook")
    q_sub = _pq_subvectors(vecs.filter(F.col("vec_id") == 0)).select(
        "block", F.col("sub").alias("q_sub")
    )
    dtable = F.broadcast(
        cb_r.join(q_sub, "block").select(
            "block", "cid", F.round(l2sq(F.col("q_sub"), F.col("c_sub")), 9).alias("d")
        )
    ).alias("d")
    c = (
        idx.filter(F.col("vec_id") != 0)
        .select("vec_id", F.posexplode("codes").alias("block", "code"))
        .alias("c")
    )
    adc = (
        c.join(
            dtable,
            (F.col("c.block") == F.col("d.block")) & (F.col("c.code") == F.col("d.cid")),
        )
        .groupBy(F.col("c.vec_id").alias("vec_id"))
        .agg(
            (
                F.sum(F.round(F.col("d.d") * F.lit(10.0**9)).cast("bigint")).cast("double")
                / F.lit(10.0**9)
            ).alias("adc_dist")
        )
    )
    shortlist = adc.orderBy("adc_dist", "vec_id").limit(PQ_SHORTLIST).select("vec_id")
    q_emb = F.broadcast(
        vecs.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    )
    rerank = (
        idx.join(shortlist, "vec_id", "left_semi")
        .crossJoin(q_emb)
        .select(
            "vec_id",
            F.round(l2sq(F.col("embedding").cast("array<double>"), F.col("q_emb")), 6).alias(
                "l2_dist"
            ),
        )
    )
    return rerank.orderBy("l2_dist", "vec_id").limit(PQ_TOPK)


#: Query-batch width for the batched IVFPQ serving key: the first
#: IVFPQ_BATCH_NQ vec_ids act as the query set (production: a queries
#: table arriving per serving job).
IVFPQ_BATCH_NQ = 16


@register(
    "ann_ivfpq_batch_topk",
    oracle=f"""
        WITH {_PQ_CTES},
        {_lloyd_chain_sql(prefix="iv")},
        iranked AS (
            SELECT v.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN ivc1 c
        ),
        assigned AS (SELECT vec_id, centroid_id FROM iranked WHERE rn = 1),
        q_probes AS (
            SELECT vec_id AS q_id, centroid_id FROM iranked
            WHERE vec_id < {IVFPQ_BATCH_NQ} AND rn <= {IVFPQ_NPROBE}
        ),
        cand AS (
            SELECT p.q_id, a.vec_id
            FROM assigned a JOIN q_probes p USING (centroid_id)
            WHERE a.vec_id <> p.q_id
        ),
        q AS (
            SELECT vec_id AS q_id, block, s AS q_sub FROM sub
            WHERE vec_id < {IVFPQ_BATCH_NQ}
        ),
        dtable AS (
            SELECT q.q_id, cb.block, cb.cid,
                   round({_l2sq_sql('q.q_sub', 'cb.c_sub')}, 9) AS d
            FROM cb JOIN q ON cb.block = q.block
        ),
        adc AS (
            SELECT n.q_id, c.vec_id,
                   CAST(SUM(CAST(d.d AS DECIMAL(28,9))) AS DOUBLE) AS adc_dist
            FROM codes c
            JOIN cand n ON c.vec_id = n.vec_id
            JOIN dtable d ON d.q_id = n.q_id AND d.block = c.block AND d.cid = c.code
            GROUP BY n.q_id, c.vec_id
        ),
        shortlist AS (
            SELECT q_id, vec_id FROM (
                SELECT q_id, vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q_id ORDER BY adc_dist, vec_id
                       ) AS srn
                FROM adc
            ) WHERE srn <= {PQ_SHORTLIST}
        ),
        qv AS (
            SELECT vec_id AS q_id, emb AS q_emb FROM vecs
            WHERE vec_id < {IVFPQ_BATCH_NQ}
        ),
        rr AS (
            SELECT s.q_id, s.vec_id,
                   round({_l2sq_sql('v.emb', 'qv.q_emb')}, 6) AS l2_dist
            FROM shortlist s
            JOIN vecs v ON v.vec_id = s.vec_id
            JOIN qv ON qv.q_id = s.q_id
        )
        SELECT q_id, vec_id, l2_dist FROM (
            SELECT q_id, vec_id, l2_dist,
                   ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY l2_dist, vec_id
                   ) AS rn
            FROM rr
        ) WHERE rn <= {PQ_TOPK}
    """,
    tags=("ext-sim",),
)
def ann_ivfpq_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCHED IVFPQ serving — the shape a production vector index runs
    per job, not per query: top-k for a SET of query vectors (the first
    IVFPQ_BATCH_NQ vec_ids stand in for the arriving queries table) in
    ONE plan. Every per-query stage of ann_ivfpq_topk becomes a keyed
    stage here — no driver-side loop over queries, no per-query Spark
    job:

    - probes: (q_id, centroid_id) — a queries×nprobe table (bounded by
      the batch width, broadcastable by construction);
    - candidates: assigned ⋈ probes on centroid_id — each query sees
      only its probed buckets' members; the query itself is excluded
      per-query (vec_id ≠ q_id), not globally;
    - ADC: ONE hash aggregate for the whole batch, keyed (q_id, vec_id),
      against a broadcast per-query distance table (PQ_M·PQ_K·NQ rows —
      still dimension-sized);
    - shortlist + re-rank: per-query top-k via row_number windows
      PARTITIONED by q_id — WindowGroupLimit prunes map-side, so no
      query's candidates wait on another's.

    At 100 TB with a real queries table the same plan holds: probes come
    from a queries⋈centroids broadcast join, the candidate join is
    partition-pruned per bucket, and batch width only scales the
    broadcast distance table. Plan-guarded in tests: no cartesian
    product, one ADC aggregate, windowed top-k."""
    vecs = _vectors(spark, sf_dir)
    ranked = _ranked_lloyd(vecs)
    assigned = ranked.filter(F.col("rn") == 1).select("vec_id", "centroid_id")
    q_probes = F.broadcast(
        ranked.filter(
            (F.col("vec_id") < IVFPQ_BATCH_NQ) & (F.col("rn") <= IVFPQ_NPROBE)
        ).select(F.col("vec_id").alias("q_id"), "centroid_id")
    )
    cand = (
        assigned.join(q_probes, "centroid_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
    )
    sub = _pq_subvectors(vecs).persist()
    sub.count()
    cb = _pq_codebook(sub).persist()
    cb.count()  # read twice: per-query dtable + encode
    codes = _pq_assign(sub, cb).select("vec_id", "block", "code")
    q_sub = sub.filter(F.col("vec_id") < IVFPQ_BATCH_NQ).select(
        F.col("vec_id").alias("q_id"), "block", F.col("sub").alias("q_sub")
    )
    dtable = F.broadcast(
        cb.join(q_sub, "block").select(
            "q_id",
            "block",
            "cid",
            F.round(l2sq(F.col("q_sub"), F.col("c_sub")), 9).alias("d"),
        )
    ).alias("d")
    c = codes.join(cand, "vec_id").alias("c")
    adc = (
        c.join(
            dtable,
            (F.col("c.q_id") == F.col("d.q_id"))
            & (F.col("c.block") == F.col("d.block"))
            & (F.col("c.code") == F.col("d.cid")),
        )
        .groupBy(F.col("c.q_id").alias("q_id"), F.col("c.vec_id").alias("vec_id"))
        .agg(
            (
                F.sum(F.round(F.col("d.d") * F.lit(10.0**9)).cast("bigint")).cast("double")
                / F.lit(10.0**9)
            ).alias("adc_dist")
        )
    )
    ws = Window.partitionBy("q_id").orderBy("adc_dist", "vec_id")
    shortlist = (
        adc.withColumn("srn", F.row_number().over(ws))
        .filter(F.col("srn") <= PQ_SHORTLIST)
        .select("q_id", "vec_id")
    )
    q_emb = F.broadcast(
        vecs.filter(F.col("vec_id") < IVFPQ_BATCH_NQ).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
    )
    rerank = (
        shortlist.join(vecs, "vec_id")
        .join(q_emb, "q_id")
        .select(
            "q_id",
            "vec_id",
            F.round(l2sq(F.col("embedding"), F.col("q_emb")), 6).alias("l2_dist"),
        )
    )
    wr = Window.partitionBy("q_id").orderBy("l2_dist", "vec_id")
    return (
        rerank.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= PQ_TOPK)
        .select("q_id", "vec_id", "l2_dist")
    )


KNN_GRAPH_K = 3


@register(
    "knn_graph",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        centroids AS (
            SELECT vec_id AS centroid_id, emb AS c_emb
            FROM vecs WHERE vec_id < {AUTO_K_SQL}
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
        nbrs AS (
            SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
                   round(list_cosine_similarity(a.emb, b.emb), 6) AS sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY round(list_cosine_similarity(a.emb, b.emb), 6) DESC,
                                b.vec_id
                   ) AS nrank
            FROM assigned a JOIN assigned b
              ON a.centroid_id = b.centroid_id AND a.vec_id <> b.vec_id
        )
        SELECT src_id, nbr_id, CAST(nrank AS INT) AS nrank, sim
        FROM nbrs WHERE nrank <= {KNN_GRAPH_K}
    """,
    tags=("ext-sim",),
)
def knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch k-NN graph construction: every vector's top-K neighbors
    within its cluster — the directed neighbor lists behind diversity
    sampling, graph-based dedup walk-throughs, and HNSW-style index
    bootstrapping. semantic_dedup answers "who is above τ"; this answers
    "who are my K closest", for every vector at once.

    Plan: the shared deterministic assignment (_ivf_ranked) buckets
    vectors; candidates are the within-cluster directed pairs (an
    equi-join on centroid_id over the persisted assignment — never
    all-pairs); the per-source top-K is a window PARTITIONED by src_id,
    which WindowGroupLimit prunes map-side before the final projection —
    K rows per vector survive the exchange, not the full candidate list.

    Same scale law as semantic_dedup, same knob: with k(clusters) scaled
    to hold bucket size constant (measured — PLANS.md "extension stack at
    10×"), candidates stay linear in the corpus. Cross-cluster neighbors
    are the recall trade; multi-assignment (rn ≤ 2) recovers boundary
    neighbors at 2× candidate cost."""
    vecs = _vectors(spark, sf_dir)
    assigned = (
        _ivf_ranked(vecs)
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "centroid_id")
        .persist()
    )
    assigned.count()
    a, b = assigned.alias("a"), assigned.alias("b")
    sim = F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6)
    w = Window.partitionBy("src_id").orderBy(F.col("sim").desc(), F.col("nbr_id"))
    return (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("src_id"),
            F.col("b.vec_id").alias("nbr_id"),
            sim.alias("sim"),
        )
        .withColumn("nrank", F.row_number().over(w).cast("int"))
        .filter(F.col("nrank") <= KNN_GRAPH_K)
        .select("src_id", "nbr_id", "nrank", "sim")
    )


@register(
    "semantic_dedup_multiprobe",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        centroids AS (
            SELECT vec_id AS centroid_id, emb AS c_emb
            FROM vecs WHERE vec_id < {AUTO_K_SQL}
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
        assigned AS (SELECT vec_id, emb, centroid_id FROM ranked WHERE rn <= 2)
        SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id,
               round(list_cosine_similarity(a.emb, b.emb), 6) AS sim
        FROM assigned a JOIN assigned b
          ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= {SEMANTIC_TAU}
    """,
    tags=("ext-sim", "ext-dedup"),
)
def semantic_dedup_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """semantic_dedup's boundary-recovery variant: every vector is
    assigned to its TWO nearest centroids (rn ≤ 2), so a pair split by a
    cluster boundary still meets wherever their probe sets overlap — the
    multi-assignment remedy the base operator's docstring names, at 2×
    assignment cost and ~2× candidate volume. Recall is monotonically ≥
    the single-probe pair set (tested), precision stays 1.0 (the
    within-bucket metric is exact).

    The pair dedup (a pair can collide in up to 2 shared buckets) is a
    DISTINCT over the POST-threshold result — bounded by the true-pair
    count, not the candidate count, so unlike the pre-verify distinct the
    simhash rewrite removed, this exchange carries only final rows. At
    100 TB the same k-scaling law applies as the base operator's
    (PLANS.md 'extension stack at 10×'); multiprobe doubles the constant,
    not the exponent. The implementation IS semantic_dedup_pairs with
    nprobe=2 — one core, so the assignment/threshold contract cannot
    drift between the probe widths."""
    return semantic_dedup_pairs(
        _vectors(spark, sf_dir), None, SEMANTIC_TAU, nprobe=2
    )


@register(
    "embedding_drift",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb, label,
                   vec_id % 2 AS half
            FROM embeddings
        ),
        cent AS (
            SELECT label, half, pos - 1 AS pos,
                   CAST(SUM(CAST(val AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS m
            FROM (
                SELECT label, half, unnest(emb) AS val,
                       generate_subscripts(emb, 1) AS pos
                FROM vecs
            )
            GROUP BY label, half, pos
        ),
        paired AS (
            SELECT a.label, a.pos, a.m AS m0, b.m AS m1
            FROM cent a JOIN cent b
              ON a.label = b.label AND a.pos = b.pos
             AND a.half = 0 AND b.half = 1
        )
        SELECT label,
               round(sqrt(CAST(SUM(CAST((m1 - m0) * (m1 - m0) AS DECIMAL(38,18)))
                               AS DOUBLE)), 6) AS centroid_shift
        FROM paired GROUP BY label
    """,
    tags=("ext-sim", "ext-profile"),
)
def embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift: per-label centroid shift (L2 distance
    between the label's mean vector in two corpus halves — vec_id parity
    stands in for "last batch vs this batch"). The monitor that catches a
    silently-retrained or re-normalized embedding model before it poisons
    an ANN index: codes and centroids assume the space is stationary, and
    a centroid that moved is the cheapest stationarity test.

    Numeric discipline end to end: per-half means via DECIMAL(38,9)
    partial aggregation (the embedding_centroids block, with `half` added
    to the key); the squared component deltas sum through DECIMAL(38,18)
    — (m1−m0)² is a deterministic double, and the decimal sum makes the
    reduction order-independent — then one IEEE sqrt and the shared
    6-decimal output round.

    At 100 TB: one pass, map-side combined to |labels|×2×dim rows; the
    pairing join and the final aggregate are centroid-sized. In
    production `half` is the ingest-batch column and the alert is a
    threshold on centroid_shift (or its z-score across labels)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val"),
    )
    cent = e.groupBy("label", "half", "pos").agg(
        (F.sum(F.col("val").cast("decimal(38,9)")).cast("double") / F.count("*")).alias("m")
    )
    a = cent.filter(F.col("half") == 0).select("label", "pos", F.col("m").alias("m0"))
    b = cent.filter(F.col("half") == 1).select("label", "pos", F.col("m").alias("m1"))
    d2 = ((F.col("m1") - F.col("m0")) * (F.col("m1") - F.col("m0"))).cast("decimal(38,18)")
    return (
        a.join(b, ["label", "pos"])
        .groupBy("label")
        .agg(F.round(F.sqrt(F.sum(d2).cast("double")), 6).alias("centroid_shift"))
    )


# --- ANN recall report --------------------------------------------------------

#: Query-batch width and probe tiers for the recall report. NQ bounds the
#: brute-force side (NQ × corpus scored rows — this is an offline
#: evaluation job whose cost is the baseline being measured, run per
#: index build, not per serve).
ANN_RECALL_NQ = 8
ANN_RECALL_NPROBES = (1, 2)


@register(
    "ann_recall_report",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        queries AS (
            SELECT vec_id AS q_id, emb AS q_emb FROM vecs WHERE vec_id < {ANN_RECALL_NQ}
        ),
        exact AS (
            SELECT q_id, vec_id FROM (
                SELECT q.q_id, v.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.q_id
                           ORDER BY round(list_cosine_similarity(v.emb, q.q_emb), 6) DESC,
                                    v.vec_id
                       ) AS rn
                FROM vecs v CROSS JOIN queries q WHERE v.vec_id <> q.q_id
            ) WHERE rn <= {IVF_K}
        ),
        {_lloyd_chain_sql()},
        ranked AS (
            SELECT v.vec_id, v.emb, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN c1 c
        ),
        assigned AS (SELECT vec_id, emb, centroid_id FROM ranked WHERE rn = 1),
        probes AS (
            SELECT r.vec_id AS q_id, np.nprobe, r.centroid_id
            FROM ranked r
            CROSS JOIN (SELECT unnest([{", ".join(str(p) for p in ANN_RECALL_NPROBES)}]) AS nprobe) np
            WHERE r.vec_id < {ANN_RECALL_NQ} AND r.rn <= np.nprobe
        ),
        cand AS (
            SELECT p.q_id, p.nprobe, a.vec_id, a.emb
            FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
            WHERE a.vec_id <> p.q_id
        ),
        ivf_top AS (
            SELECT q_id, nprobe, vec_id FROM (
                SELECT c.q_id, c.nprobe, c.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.q_id, c.nprobe
                           ORDER BY round(list_cosine_similarity(c.emb, q.q_emb), 6) DESC,
                                    c.vec_id
                       ) AS rn
                FROM cand c JOIN queries q ON c.q_id = q.q_id
            ) WHERE rn <= {IVF_K}
        ),
        grid AS (SELECT DISTINCT q_id, nprobe FROM probes),
        counts AS (
            SELECT t.q_id, t.nprobe, COUNT(*) AS n_hits
            FROM ivf_top t JOIN exact e ON t.q_id = e.q_id AND t.vec_id = e.vec_id
            GROUP BY t.q_id, t.nprobe
        )
        SELECT g.q_id, g.nprobe, COALESCE(c.n_hits, 0) AS n_hits,
               CAST(COALESCE(c.n_hits, 0) AS DOUBLE) / {IVF_K} AS recall
        FROM grid g LEFT JOIN counts c ON g.q_id = c.q_id AND g.nprobe = c.nprobe
    """,
    tags=("ext-sim", "contract"),
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked ANN accuracy: recall@k of the SERVED index recipe
    (_ranked_lloyd — the Lloyd-refined centroids every serving key builds
    from since r8) against exact brute-force cosine, per query (first
    ANN_RECALL_NQ vec_ids) and per probe width (nprobe ∈
    ANN_RECALL_NPROBES) — the approx_distinct discipline ("the sketch's
    contract is itself a checked query") applied to vector search. This
    key measures exactly what ann_ivf_topk / ivf_index_probe /
    ann_ivfpq_* serve, so an index-recipe change that tanks recall fails
    the driver hash, not just a local test; the refinement's isolated
    value remains pinned by the ann_recall_honest (unrefined) vs
    ann_recall_lloyd (refined) pair on a seed-disjoint query set.

    One plan, no per-query loop:

    - exact side: the query batch is a broadcast (ANN_RECALL_NQ rows,
      bounded constant); scoring is corpus × NQ — LINEAR in the corpus,
      the deliberate cost of an evaluation job (it IS the baseline being
      measured; production runs it per index build on a sampled query
      set, never per serve). Per-query top-k via one WindowGroupLimit —
      map-side pruned, never a global sort.
    - IVF side: probe tiers come from exploding the served _ranked_lloyd
      assignment; candidates are the bucket equi-join, per-(query,
      nprobe) top-k through the same window shape.
    - recall: IVF picks left-semi exact picks, counted per (q_id,
      nprobe) over the probe grid (left join keeps recall=0 rows
      honest). n_hits/IVF_K divides identical doubles on both engines —
      deterministic, hash-safe.

    Candidate-superset monotonicity (recall non-decreasing in nprobe) is
    asserted in tests; the driver hash pins the measured values."""
    vecs = _vectors(spark, sf_dir)
    queries = F.broadcast(
        vecs.filter(F.col("vec_id") < ANN_RECALL_NQ).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
    )
    return _recall_frame(vecs, queries, _ranked_lloyd(vecs), ANN_RECALL_NPROBES)


def _recall_frame(
    vecs: DataFrame, queries: DataFrame, ranked: DataFrame, nprobes: tuple[int, ...]
) -> DataFrame:
    """(q_id, nprobe, n_hits, recall) for any (query set, assignment) pair
    — the shared evaluation plumbing of ann_recall_report (contract seed,
    queries ⊆ seeds) and ann_recall_honest (sample seed, queries disjoint
    from seeds). Exact side: one broadcast query batch × corpus pass with
    per-query WindowGroupLimit top-k; IVF side: probe tiers exploded from
    the shared ranked assignment; recall counted over the probe grid so
    recall=0 rows stay visible."""
    sim = F.round(cosine(F.col("embedding"), F.col("q_emb")), 6)
    scored = (
        vecs.crossJoin(queries)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", sim.alias("sim"))
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    exact = (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= IVF_K)
        .select("q_id", "vec_id")
    )
    assigned = ranked.filter(F.col("rn") == 1).select("vec_id", "embedding", "centroid_id")
    # The broadcast hint goes on the CONSUMING equi-join below, not on the
    # probes definition: probes also feeds the grid as the LEFT side of the
    # final left-outer join, where Spark cannot build the left side — a
    # lineage-level hint there is silently dropped (HintErrorLogger noise on
    # every run) while hinting at the join site broadcasts where it can.
    probes = (
        ranked.join(
            queries.select("q_id"), ranked.vec_id == F.col("q_id"), "inner"
        )
        .select("q_id", "centroid_id", "rn")
        .withColumn("nprobe", F.explode(F.array(*[F.lit(p) for p in nprobes])))
        .filter(F.col("rn") <= F.col("nprobe"))
        .select("q_id", "nprobe", "centroid_id")
    )
    cand = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .join(queries, "q_id")
    )
    wqn = Window.partitionBy("q_id", "nprobe").orderBy(F.col("sim").desc(), F.col("vec_id"))
    ivf_top = (
        cand.select("q_id", "nprobe", "vec_id", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(wqn))
        .filter(F.col("rn") <= IVF_K)
        .select("q_id", "nprobe", "vec_id")
    )
    counts = (
        ivf_top.join(exact, ["q_id", "vec_id"], "left_semi")
        .groupBy("q_id", "nprobe")
        .agg(F.count("*").alias("n_hits"))
    )
    grid = probes.select("q_id", "nprobe").distinct()
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0).cast("long"))
    # counts is NQ×|nprobes| rows post-agg (size unknown to the optimizer):
    # broadcasting the RIGHT side of the left join is legal and spares the
    # grid an exchange.
    return grid.join(F.broadcast(counts), ["q_id", "nprobe"], "left").select(
        "q_id",
        "nprobe",
        n_hits.alias("n_hits"),
        (n_hits.cast("double") / F.lit(float(IVF_K))).alias("recall"),
    )


@register(
    "ann_recall_incremental",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        base AS (
            SELECT vec_id, emb FROM vecs WHERE vec_id % {INCR_BATCH_MOD} <> {INCR_BATCH_MOD - 1}
        ),
        {_lloyd_chain_sql(src="base")},
        queries AS (
            SELECT vec_id AS q_id, emb AS q_emb FROM vecs WHERE vec_id < {ANN_RECALL_NQ}
        ),
        exact AS (
            SELECT q_id, vec_id FROM (
                SELECT q.q_id, v.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.q_id
                           ORDER BY round(list_cosine_similarity(v.emb, q.q_emb), 6) DESC,
                                    v.vec_id
                       ) AS rn
                FROM vecs v CROSS JOIN queries q WHERE v.vec_id <> q.q_id
            ) WHERE rn <= {IVF_K}
        ),
        ranked AS (
            SELECT v.vec_id, v.emb, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN c1 c
        ),
        assigned AS (SELECT vec_id, emb, centroid_id FROM ranked WHERE rn = 1),
        probes AS (
            SELECT r.vec_id AS q_id, np.nprobe, r.centroid_id
            FROM ranked r
            CROSS JOIN (SELECT unnest([{", ".join(str(p) for p in ANN_RECALL_NPROBES)}]) AS nprobe) np
            WHERE r.vec_id < {ANN_RECALL_NQ} AND r.rn <= np.nprobe
        ),
        cand AS (
            SELECT p.q_id, p.nprobe, a.vec_id, a.emb
            FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
            WHERE a.vec_id <> p.q_id
        ),
        ivf_top AS (
            SELECT q_id, nprobe, vec_id FROM (
                SELECT c.q_id, c.nprobe, c.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.q_id, c.nprobe
                           ORDER BY round(list_cosine_similarity(c.emb, q.q_emb), 6) DESC,
                                    c.vec_id
                       ) AS rn
                FROM cand c JOIN queries q ON c.q_id = q.q_id
            ) WHERE rn <= {IVF_K}
        ),
        grid AS (SELECT DISTINCT q_id, nprobe FROM probes),
        counts AS (
            SELECT t.q_id, t.nprobe, COUNT(*) AS n_hits
            FROM ivf_top t JOIN exact e ON t.q_id = e.q_id AND t.vec_id = e.vec_id
            GROUP BY t.q_id, t.nprobe
        )
        SELECT g.q_id, g.nprobe, COALESCE(c.n_hits, 0) AS n_hits,
               CAST(COALESCE(c.n_hits, 0) AS DOUBLE) / {IVF_K} AS recall
        FROM grid g LEFT JOIN counts c ON g.q_id = c.q_id AND g.nprobe = c.nprobe
    """,
    tags=("ext-sim", "contract"),
)
def ann_recall_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STALENESS cost of incremental maintenance, priced: recall@k of
    the incrementally-maintained index — centroids trained on the BASE
    slice only (what ann_index_incremental_add serves after folding the
    batch in against frozen centroids) — over the FULL grown corpus,
    same query battery and probe widths as ann_recall_report. Reading the
    two keys side by side in one artifact gives the retrain decision a
    number: report = 'retrained on everything', incremental = 'trained
    before the last 1/8 arrived'. A widening gap as the un-retrained
    fraction grows is the signal ann_index_drift_report watches per
    centroid; at this corpus's batch share the curves should be close
    (the adds follow the same label clusters the base trained on).

    Same one-plan evaluation shape as every recall key (_recall_frame);
    the exact side is corpus × NQ — the deliberate linear cost of an
    evaluation job, run per index build, never per serve."""
    vecs = _vectors(spark, sf_dir)
    base = vecs.filter(
        F.pmod(F.col("vec_id"), F.lit(INCR_BATCH_MOD)) != INCR_BATCH_MOD - 1
    )
    cent = lloyd_centroids(base, auto_centroids(base.count()))
    queries = F.broadcast(
        vecs.filter(F.col("vec_id") < ANN_RECALL_NQ).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
    )
    return _recall_frame(vecs, queries, _ranked_against(vecs, cent), ANN_RECALL_NPROBES)


@register(
    "ann_index_drift_report",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        base AS (
            SELECT vec_id, emb FROM vecs WHERE vec_id % {INCR_BATCH_MOD} <> {INCR_BATCH_MOD - 1}
        ),
        {_lloyd_chain_sql(src="base")},
        ranked AS (
            SELECT v.vec_id, v.emb, c.centroid_id,
                   round(list_cosine_similarity(v.emb, c.c_emb), 9) AS c_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN c1 c
        ),
        assigned AS (
            SELECT vec_id, centroid_id, c_sim,
                   CAST(vec_id % {INCR_BATCH_MOD} = {INCR_BATCH_MOD - 1} AS INT) AS is_add
            FROM ranked WHERE rn = 1
        )
        SELECT centroid_id,
               COUNT(*) FILTER (WHERE is_add = 0) AS n_base,
               COUNT(*) FILTER (WHERE is_add = 1) AS n_added,
               CASE WHEN COUNT(*) FILTER (WHERE is_add = 0) = 0 THEN NULL
                    ELSE round(CAST(SUM(CAST(c_sim AS DECIMAL(38,9)))
                                   FILTER (WHERE is_add = 0) AS DOUBLE)
                               / COUNT(*) FILTER (WHERE is_add = 0), 6) END
                   AS mean_sim_base,
               CASE WHEN COUNT(*) FILTER (WHERE is_add = 1) = 0 THEN NULL
                    ELSE round(CAST(SUM(CAST(c_sim AS DECIMAL(38,9)))
                                   FILTER (WHERE is_add = 1) AS DOUBLE)
                               / COUNT(*) FILTER (WHERE is_add = 1), 6) END
                   AS mean_sim_added
        FROM assigned
        GROUP BY centroid_id
    """,
    tags=("ext-sim", "contract"),
)
def ann_index_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-centroid RETRAIN TRIGGER for incrementally-maintained
    indexes: after folding adds in against frozen centroids, how well do
    the added vectors still fit the cells they landed in? Per centroid:
    base and added member counts, and the mean assignment cosine of each
    population (decimal-exact means through the kmeans m1 pattern, so
    both engines hash-match). A centroid whose mean_sim_added sits well
    below its mean_sim_base is collecting vectors the base training never
    saw — the distribution moved, and that cell is where recall leaks
    first (ann_recall_incremental prices the aggregate effect). Growth
    skew (n_added outpacing n_base in a few cells) is the other trigger:
    those buckets grow past the design bucket size and probe cost drifts.

    Scale shape: one broadcast assignment over the corpus (the trainer's
    own pass), one hash aggregate carrying |centroids| rows — the report
    is centroid-count sized and ships with every ingest job."""
    vecs = _vectors(spark, sf_dir)
    is_add = F.pmod(F.col("vec_id"), F.lit(INCR_BATCH_MOD)) == INCR_BATCH_MOD - 1
    base = vecs.filter(~is_add)
    cent = lloyd_centroids(base, auto_centroids(base.count()))
    assigned = (
        _ranked_against(vecs, cent)
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_id", "c_sim", is_add.cast("int").alias("is_add"))
    )
    dsim = F.col("c_sim").cast("decimal(38,9)")
    base_n = F.count(F.when(F.col("is_add") == 0, 1))
    add_n = F.count(F.when(F.col("is_add") == 1, 1))
    mean_of = lambda flag, n: F.when(  # noqa: E731 — two aggregate variants of one formula
        n == 0, F.lit(None).cast("double")
    ).otherwise(
        F.round(
            F.sum(F.when(F.col("is_add") == flag, dsim)).cast("double") / n, 6
        )
    )
    return assigned.groupBy("centroid_id").agg(
        base_n.alias("n_base"),
        add_n.alias("n_added"),
        mean_of(0, base_n).alias("mean_sim_base"),
        mean_of(1, add_n).alias("mean_sim_added"),
    )


#: Auto-nprobe: the probe-width ladder the knob chooses from, and the
#: mean-recall floor the chosen width must clear on the evaluation
#: battery. The selection arithmetic is INTEGER (total hits vs
#: ceil(target·|queries|·k)) so the choice hash-matches across engines;
#: 0.5 sits between the pinned lloyd curve's nprobe=1 and nprobe=2 means
#: at the shipped SFs, so the knob exercises a real decision, not a
#: constant.
AUTOPROBE_GRID = (1, 2, 4)
AUTOPROBE_TARGET = 0.5


@register(
    "ann_autoprobe_topk",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        {_lloyd_chain_sql()},
        queries AS (
            SELECT vec_id AS q_id, emb AS q_emb FROM vecs WHERE vec_id < {ANN_RECALL_NQ}
        ),
        exact AS (
            SELECT q_id, vec_id FROM (
                SELECT q.q_id, v.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.q_id
                           ORDER BY round(list_cosine_similarity(v.emb, q.q_emb), 6) DESC,
                                    v.vec_id
                       ) AS rn
                FROM vecs v CROSS JOIN queries q WHERE v.vec_id <> q.q_id
            ) WHERE rn <= {IVF_K}
        ),
        ranked AS (
            SELECT v.vec_id, v.emb, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN c1 c
        ),
        assigned AS (SELECT vec_id, emb, centroid_id FROM ranked WHERE rn = 1),
        probes AS (
            SELECT q.q_id, np.nprobe, r.centroid_id
            FROM ranked r
            JOIN queries q ON r.vec_id = q.q_id
            CROSS JOIN (SELECT unnest([{", ".join(str(p) for p in AUTOPROBE_GRID)}]) AS nprobe) np
            WHERE r.rn <= np.nprobe
        ),
        cand AS (
            SELECT p.q_id, p.nprobe, a.vec_id, a.emb
            FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
            WHERE a.vec_id <> p.q_id
        ),
        ivf_top AS (
            SELECT q_id, nprobe, vec_id FROM (
                SELECT c.q_id, c.nprobe, c.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.q_id, c.nprobe
                           ORDER BY round(list_cosine_similarity(c.emb, q.q_emb), 6) DESC,
                                    c.vec_id
                       ) AS rn
                FROM cand c JOIN queries q ON c.q_id = q.q_id
            ) WHERE rn <= {IVF_K}
        ),
        grid AS (SELECT DISTINCT q_id, nprobe FROM probes),
        counts AS (
            SELECT t.q_id, t.nprobe, COUNT(*) AS n_hits
            FROM ivf_top t JOIN exact e ON t.q_id = e.q_id AND t.vec_id = e.vec_id
            GROUP BY t.q_id, t.nprobe
        ),
        hitsum AS (
            SELECT g.nprobe, SUM(COALESCE(c.n_hits, 0)) AS hits, COUNT(*) AS nq
            FROM grid g LEFT JOIN counts c ON g.q_id = c.q_id AND g.nprobe = c.nprobe
            GROUP BY g.nprobe
        ),
        chosen AS (
            SELECT CAST(COALESCE(
                MIN(CASE WHEN hits >= CEIL({AUTOPROBE_TARGET} * nq * {IVF_K})
                         THEN nprobe END),
                MAX(nprobe)) AS INT) AS np
            FROM hitsum
        ),
        q0 AS (SELECT emb AS q_emb FROM vecs WHERE vec_id = 0),
        probes0 AS (
            SELECT r.centroid_id FROM ranked r CROSS JOIN chosen
            WHERE r.vec_id = 0 AND r.rn <= chosen.np
        )
        SELECT a.vec_id,
               round(list_cosine_similarity(a.emb, q0.q_emb), 6) AS sim,
               chosen.np AS nprobe_used
        FROM assigned a
        JOIN probes0 p ON a.centroid_id = p.centroid_id
        CROSS JOIN q0 CROSS JOIN chosen
        WHERE a.vec_id <> 0
        ORDER BY sim DESC, a.vec_id
        LIMIT {IVF_K}
    """,
    tags=("ext-sim", "pipeline"),
)
def ann_autoprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-aware serving: the nprobe knob chosen BY the engine from
    measured recall instead of hand-set (the r8 roadmap's top candidate).
    One plan: evaluate the serving index's recall over the standard
    query battery at every ladder width (the _recall_frame machinery the
    pinned curves use), pick the SMALLEST nprobe whose total hits clear
    ceil(target·|queries|·k) — integer arithmetic, no float mean to
    drift — falling back to the ladder's max when no width clears, then
    serve the query at that width. The emitted nprobe_used column makes
    the decision itself driver-hash-checked, not just the neighbors.

    This is the operator that turns the recall REPORTS into a serving
    CONTRACT: 'give me ≥ target recall at minimum probe cost'. At scale
    the evaluation half runs per index build (its cost is the brute-force
    baseline, by design); the serve half is the ordinary pruned probe —
    a production system caches the chosen width in the index metadata
    exactly like the stored centroids.

    Scale shape: evaluation = one broadcast query batch × corpus pass +
    the probe-grid join; decision = a |ladder|-row aggregate; serve =
    broadcast probe list against the assignment. Nothing new shuffles."""
    import math

    vecs = _vectors(spark, sf_dir)
    n = vecs.count()
    if n == 0:
        return spark.createDataFrame([], "vec_id bigint, sim double, nprobe_used int")
    k = auto_centroids(n)
    ranked = _ranked_lloyd(vecs, k)
    queries = F.broadcast(
        vecs.filter(F.col("vec_id") < ANN_RECALL_NQ).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
    )
    rec = _recall_frame(vecs, queries, ranked, AUTOPROBE_GRID)
    hitsum = rec.groupBy("nprobe").agg(
        F.sum("n_hits").alias("hits"), F.count("*").alias("nq")
    )
    need = F.ceil(F.lit(AUTOPROBE_TARGET) * F.col("nq") * F.lit(IVF_K))
    chosen = hitsum.agg(
        F.coalesce(
            F.min(F.when(F.col("hits") >= need, F.col("nprobe"))),
            F.max("nprobe"),
        )
        .cast("int")
        .alias("np")
    )
    q0 = F.broadcast(
        vecs.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    )
    probes0 = (
        ranked.filter(F.col("vec_id") == 0)
        .crossJoin(F.broadcast(chosen))
        .filter(F.col("rn") <= F.col("np"))
        .select("centroid_id", "np")
    )
    assigned = ranked.filter(F.col("rn") == 1).select(
        "vec_id", "embedding", "centroid_id"
    )
    sim = F.round(cosine(F.col("embedding"), F.col("q_emb")), 6)
    return (
        assigned.join(F.broadcast(probes0), "centroid_id")
        .filter(F.col("vec_id") != 0)
        .crossJoin(q0)
        .select("vec_id", sim.alias("sim"), F.col("np").alias("nprobe_used"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(IVF_K)
    )


#: Retrain-decision thresholds (ann_retrain_decision). GAP_T: a cell whose
#: added population's mean assignment cosine sits more than this below its
#: base population's is collecting vectors the base training never saw —
#: at the shipped corpus this flags the worst drift cells (measured gaps
#: span 0.006–0.14 at sf0.01; the 0.07 line splits the two leaking cells
#: from the four healthy ones), the per-cell localization of the recall
#: gap ann_recall_incremental prices in aggregate. GROWTH_X: a cell that
#: absorbed more than GROWTH_X× its PROPORTIONAL share of the adds (the
#: batch is 1/(INCR_BATCH_MOD−1) of the base, so proportional means
#: n_added ≈ n_base/(MOD−1)) is outgrowing its design bucket size —
#: probe cost drifts even if fit doesn't. INDEX_GAP_T: the whole-index
#: verdict flips when the adds-weighted mean gap crosses it — "retrain
#: everything" vs "retrain cells".
RETRAIN_GAP_T = 0.07
RETRAIN_GROWTH_X = 2
RETRAIN_INDEX_GAP_T = 0.05


@register(
    "ann_retrain_decision",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        base AS (
            SELECT vec_id, emb FROM vecs WHERE vec_id % {INCR_BATCH_MOD} <> {INCR_BATCH_MOD - 1}
        ),
        {_lloyd_chain_sql(src="base")},
        ranked AS (
            SELECT v.vec_id, v.emb, c.centroid_id,
                   round(list_cosine_similarity(v.emb, c.c_emb), 9) AS c_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN c1 c
        ),
        assigned AS (
            SELECT vec_id, centroid_id, c_sim,
                   CAST(vec_id % {INCR_BATCH_MOD} = {INCR_BATCH_MOD - 1} AS INT) AS is_add
            FROM ranked WHERE rn = 1
        ),
        rep AS (
            SELECT centroid_id,
                   COUNT(*) FILTER (WHERE is_add = 0) AS n_base,
                   COUNT(*) FILTER (WHERE is_add = 1) AS n_added,
                   CASE WHEN COUNT(*) FILTER (WHERE is_add = 0) = 0
                             OR COUNT(*) FILTER (WHERE is_add = 1) = 0 THEN NULL
                        ELSE round(
                            round(CAST(SUM(CAST(c_sim AS DECIMAL(38,9)))
                                      FILTER (WHERE is_add = 0) AS DOUBLE)
                                  / COUNT(*) FILTER (WHERE is_add = 0), 6)
                          - round(CAST(SUM(CAST(c_sim AS DECIMAL(38,9)))
                                      FILTER (WHERE is_add = 1) AS DOUBLE)
                                  / COUNT(*) FILTER (WHERE is_add = 1), 6), 6) END
                       AS sim_gap
            FROM assigned
            GROUP BY centroid_id
        ),
        dec AS (
            SELECT centroid_id, n_base, n_added, sim_gap,
                   CASE WHEN n_base = 0 THEN NULL
                        ELSE round(CAST(n_added AS DOUBLE) / n_base, 6) END AS growth,
                   ROW_NUMBER() OVER (
                       ORDER BY sim_gap DESC NULLS LAST, centroid_id
                   ) AS gap_rank,
                   COALESCE(sim_gap > {RETRAIN_GAP_T}, FALSE) AS drift_flag,
                   n_added * {INCR_BATCH_MOD - 1} > {RETRAIN_GROWTH_X} * n_base
                       AS growth_flag
            FROM rep
        )
        SELECT centroid_id, n_base, n_added, sim_gap, growth, gap_rank,
               drift_flag, growth_flag,
               (drift_flag OR growth_flag) AS cell_retrain,
               round(CAST(SUM(CASE WHEN sim_gap IS NULL THEN 0
                                   ELSE CAST(round(sim_gap * 1e6) AS BIGINT) * n_added
                              END) OVER () AS DOUBLE) / 1e6
                     / SUM(CASE WHEN sim_gap IS NULL THEN 0 ELSE n_added END)
                           OVER (), 6) AS index_mean_gap,
               round(CAST(SUM(CASE WHEN sim_gap IS NULL THEN 0
                                   ELSE CAST(round(sim_gap * 1e6) AS BIGINT) * n_added
                              END) OVER () AS DOUBLE) / 1e6
                     / SUM(CASE WHEN sim_gap IS NULL THEN 0 ELSE n_added END)
                           OVER (), 6) > {RETRAIN_INDEX_GAP_T} AS index_retrain
        FROM dec
    """,
    tags=("ext-sim", "pipeline"),
)
def ann_retrain_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operator every ingest job runs LAST (r8 verdict item 5): the
    drift report's per-centroid stats composed into the retrain DECISION
    — which cells cross the threshold, and whether the whole index does.
    Per centroid: member counts, the base-vs-added fit gap (sim_gap),
    growth relative to the cell's proportional share of the adds, the
    gap rank, the three verdict booleans (drift_flag / growth_flag /
    cell_retrain), and the index-level verdict (adds-weighted mean gap
    vs RETRAIN_INDEX_GAP_T — identical on every row by construction).
    The ingredients are exactly ann_index_drift_report's aggregates;
    what this key adds is one rank window and the threshold algebra —
    the line between "report someone must read at 3am" and "decision a
    scheduler consumes".

    Hash discipline: the gap is a subtraction of two already-rounded
    doubles re-rounded to 6; growth is an int/int double division; the
    growth flag is PURE INTEGER arithmetic (n_added·(MOD−1) > X·n_base —
    no division to drift); the index mean goes through the fixed-point
    form (round(gap·1e6)·n_added summed as BIGINT) so the adds-weighted
    mean is order-independent.

    Scale shape: the drift aggregate's |centroids|-row output plus one
    whole-frame window over centroid-count rows — the decision costs
    nothing beyond the report it reads."""
    rep = ann_index_drift_report(spark, sf_dir)
    gap = F.round(F.col("mean_sim_base") - F.col("mean_sim_added"), 6)
    dec = rep.select(
        "centroid_id",
        "n_base",
        "n_added",
        gap.alias("sim_gap"),
        F.when(
            F.col("n_base") == 0, F.lit(None).cast("double")
        ).otherwise(
            F.round(F.col("n_added").cast("double") / F.col("n_base"), 6)
        ).alias("growth"),
    )
    w_rank = Window.orderBy(F.col("sim_gap").desc_nulls_last(), "centroid_id")
    dec = dec.withColumn("gap_rank", F.row_number().over(w_rank)).withColumn(
        "drift_flag",
        F.coalesce(F.col("sim_gap") > RETRAIN_GAP_T, F.lit(False)),
    ).withColumn(
        "growth_flag",
        F.col("n_added") * (INCR_BATCH_MOD - 1) > RETRAIN_GROWTH_X * F.col("n_base"),
    ).withColumn(
        "cell_retrain", F.col("drift_flag") | F.col("growth_flag")
    )
    w_all = Window.partitionBy()  # centroid-count rows — bounded by design
    fx = F.when(F.col("sim_gap").isNull(), F.lit(0).cast("bigint")).otherwise(
        F.round(F.col("sim_gap") * 1e6).cast("bigint") * F.col("n_added")
    )
    den = F.when(F.col("sim_gap").isNull(), F.lit(0)).otherwise(F.col("n_added"))
    index_mean = F.round(
        F.sum(fx).over(w_all).cast("double") / 1e6 / F.sum(den).over(w_all), 6
    )
    return dec.withColumn("index_mean_gap", index_mean).withColumn(
        "index_retrain", F.col("index_mean_gap") > RETRAIN_INDEX_GAP_T
    )


def ivf_global_retrain(
    spark: SparkSession, index_path: str, decision: DataFrame
) -> bool:
    """The CONSUMER of ann_retrain_decision's whole-index verdict — the
    final lifecycle op: build → serve → add → drift/decide → (cell split |
    GLOBAL RETRAIN) → delete/compact. ann_cell_split_retrain acts on the
    per-cell verdict; this executes the "retrain everything" branch that
    previously had no executor: when any decision row carries
    ``index_retrain = true``, train fresh centroids on the index's CURRENT
    vectors (the deterministic md5-sample Lloyd trainer — the same recipe
    as the original build, so the oracle can replay it), rebuild into a
    staging directory, atomically swap it in, and rebuild the id→centroid
    lookup beside it if one is maintained (every assignment may move under
    new centroids, so a bucket-scoped refresh has no advantage — the
    rebuild IS the changeset). Returns True iff the retrain ran.

    Swap sequence and crash states (directory rename is the atomic
    publish primitive on HDFS; operators/fsutil.rename):

      1. build ``<index>__rebuild``   (crash → stale staging; next run
         deletes and rebuilds it — the live index never stopped serving)
      2. rename <index> → <index>__retired   (crash → no live index, but
         both complete states exist; the next run DETECTS that state —
         live missing, __rebuild/__retired present — and completes the
         interrupted publish by renaming a survivor back into place
         (fsutil.recover_swap) BEFORE any sweep; sweeping first would
         delete the only complete copies — never a half state)
      3. rename __rebuild → <index>          (the publish — one rename)
      4. delete __retired                    (crash → harmless leftover,
         swept at the next retrain's start, AFTER recovery has verified
         the live index exists)

    Single-writer: like every read-then-publish op here, run it under the
    index's maintenance lease (operators/ixlock.py) when any other
    maintenance loop may be live; the resident streams take that lease
    per fold, so a leased retrain serializes against them.

    At 100 TB the retrain is the one deliberately corpus-scale op in the
    lifecycle (one training sample pass + one full re-assignment scan +
    one full rewrite) — exactly the cost ann_retrain_decision exists to
    price BEFORE paying: the decision gates it on measured drift, and
    everything cheaper (add/delete/compact/split) has already been tried
    by the time the verdict flips."""
    import os

    from ..operators import fsutil
    from ..operators.ann_lookup import build_lookup

    staging, retired = f"{index_path}__rebuild", f"{index_path}__retired"
    # heal a crashed prior swap FIRST: with no live index, __rebuild /
    # __retired are the only complete copies — the sweep below would
    # destroy them (total index loss) if it ran before recovery
    fsutil.recover_swap(spark, index_path, staging, retired)
    row = decision.select("index_retrain").first()
    if row is None or not row["index_retrain"]:
        return False
    fsutil.delete_dir(spark, staging, if_exists=True)
    fsutil.delete_dir(spark, retired, if_exists=True)
    cur = (
        _layout_read(spark, os.path.join(index_path, "vectors"), "vectors")
        .select("vec_id", "embedding")
        .localCheckpoint(eager=True)  # lineage must not point at dirs the swap moves
    )
    ivf_build_index_frame(cur, staging, n_centroids=auto_centroids(cur.count()))
    if fsutil.exists(spark, os.path.join(index_path, "lookup")):
        build_lookup(spark, staging)
    fsutil.rename(spark, index_path, retired)
    fsutil.rename(spark, staging, index_path)
    fsutil.delete_dir(spark, retired)
    return True


@register(
    "ann_global_retrain",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        base AS (
            SELECT vec_id, emb FROM vecs WHERE vec_id % {INCR_BATCH_MOD} <> {INCR_BATCH_MOD - 1}
        ),
        {_lloyd_chain_sql(src="base")},
        ranked AS (
            SELECT v.vec_id, c.centroid_id,
                   round(list_cosine_similarity(v.emb, c.c_emb), 9) AS c_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN c1 c
        ),
        assigned AS (
            SELECT vec_id, centroid_id, c_sim,
                   CAST(vec_id % {INCR_BATCH_MOD} = {INCR_BATCH_MOD - 1} AS INT) AS is_add
            FROM ranked WHERE rn = 1
        ),
        rep AS (
            SELECT centroid_id,
                   COUNT(*) FILTER (WHERE is_add = 1) AS n_added,
                   CASE WHEN COUNT(*) FILTER (WHERE is_add = 0) = 0
                             OR COUNT(*) FILTER (WHERE is_add = 1) = 0 THEN NULL
                        ELSE round(
                            round(CAST(SUM(CAST(c_sim AS DECIMAL(38,9)))
                                      FILTER (WHERE is_add = 0) AS DOUBLE)
                                  / COUNT(*) FILTER (WHERE is_add = 0), 6)
                          - round(CAST(SUM(CAST(c_sim AS DECIMAL(38,9)))
                                      FILTER (WHERE is_add = 1) AS DOUBLE)
                                  / COUNT(*) FILTER (WHERE is_add = 1), 6), 6) END
                       AS sim_gap
            FROM assigned
            GROUP BY centroid_id
        ),
        verdict AS (
            SELECT round(CAST(SUM(CASE WHEN sim_gap IS NULL THEN 0
                                       ELSE CAST(round(sim_gap * 1e6) AS BIGINT) * n_added
                                  END) AS DOUBLE) / 1e6
                         / SUM(CASE WHEN sim_gap IS NULL THEN 0 ELSE n_added END),
                         6) > {RETRAIN_INDEX_GAP_T} AS g
            FROM rep
        ),
        {_lloyd_chain_sql(prefix="r", src="vecs")},
        ranked_new AS (
            SELECT v.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN rc1 c
        )
        SELECT vec_id, centroid_id FROM ranked_new
        WHERE rn = 1 AND (SELECT g FROM verdict)
        UNION ALL
        SELECT vec_id, centroid_id FROM assigned
        WHERE NOT (SELECT g FROM verdict)
    """,
    tags=("ext-sim", "pipeline"),
)
def ann_global_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole-index retrain branch, driver-checked end to end: build
    the index from the base slice, fold the add batch in against frozen
    centroids (the drift fixture every decision key shares), compute the
    REAL registered decision (ann_retrain_decision — not a synthetic
    verdict), and hand it to ivf_global_retrain, which executes whichever
    branch the measured drift dictates: retrain-on-current-content +
    atomic swap + lookup rebuild when the verdict fired, provable no-op
    when it didn't. At the shipped corpora the verdict IS true (the adds-
    weighted mean gap clears RETRAIN_INDEX_GAP_T at sf0.001 and sf0.01),
    so the driver exercises the swap path; the no-op branch and the
    crash-state recovery are pinned in tests/test_global_retrain.py.

    The oracle replays the whole composition conditionally: the base-
    trained chain and its drift verdict, then EITHER the re-trained
    assignment (Lloyd chain over the index's current = full content)
    or the pre-retrain assignment — so a consumer that ignored the
    verdict, retrained on the wrong slice, or swapped in a stale build
    hash-mismatches. The post-swap index must equal a from-scratch build
    of the current content exactly (rebuild equivalence — same trainer,
    same auto-k)."""
    import os

    vecs = _vectors(spark, sf_dir)
    is_add = F.pmod(F.col("vec_id"), F.lit(INCR_BATCH_MOD)) == INCR_BATCH_MOD - 1
    base = vecs.filter(~is_add)
    n_base = base.count()
    if n_base == 0:
        return spark.createDataFrame([], "vec_id bigint, centroid_id bigint")
    k = auto_centroids(n_base)
    path = os.path.join(
        os.path.dirname(_ivf_index_path(sf_dir, k)), f"gretrain_lloyd1_c{k}"
    )
    marker = os.path.join(path, "_GR_SUCCESS")
    if not (_ivf_index_is_fresh(path, sf_dir) and _incr_marker_fresh(marker, sf_dir)):
        from ..operators.ann_lookup import build_lookup

        ivf_build_index_frame(base, path, n_centroids=k)
        ivf_index_incremental_add(spark, path, vecs.filter(is_add))
        build_lookup(spark, path)
        ivf_global_retrain(spark, path, ann_retrain_decision(spark, sf_dir))
        open(marker, "w").close()
    idx = _layout_read(spark, os.path.join(path, "vectors"), "vectors")
    return idx.select(
        "vec_id", F.col("centroid_id").cast("bigint").alias("centroid_id")
    )


@register(
    "ann_retrain_serve_topk",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        base AS (
            SELECT vec_id, emb FROM vecs WHERE vec_id % {INCR_BATCH_MOD} <> {INCR_BATCH_MOD - 1}
        ),
        {_lloyd_chain_sql(src="base")},
        ranked AS (
            SELECT v.vec_id, c.centroid_id,
                   round(list_cosine_similarity(v.emb, c.c_emb), 9) AS c_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN c1 c
        ),
        assigned AS (
            SELECT vec_id, centroid_id, c_sim,
                   CAST(vec_id % {INCR_BATCH_MOD} = {INCR_BATCH_MOD - 1} AS INT) AS is_add
            FROM ranked WHERE rn = 1
        ),
        rep AS (
            SELECT centroid_id,
                   COUNT(*) FILTER (WHERE is_add = 1) AS n_added,
                   CASE WHEN COUNT(*) FILTER (WHERE is_add = 0) = 0
                             OR COUNT(*) FILTER (WHERE is_add = 1) = 0 THEN NULL
                        ELSE round(
                            round(CAST(SUM(CAST(c_sim AS DECIMAL(38,9)))
                                      FILTER (WHERE is_add = 0) AS DOUBLE)
                                  / COUNT(*) FILTER (WHERE is_add = 0), 6)
                          - round(CAST(SUM(CAST(c_sim AS DECIMAL(38,9)))
                                      FILTER (WHERE is_add = 1) AS DOUBLE)
                                  / COUNT(*) FILTER (WHERE is_add = 1), 6), 6) END
                       AS sim_gap
            FROM assigned
            GROUP BY centroid_id
        ),
        verdict AS (
            SELECT round(CAST(SUM(CASE WHEN sim_gap IS NULL THEN 0
                                       ELSE CAST(round(sim_gap * 1e6) AS BIGINT) * n_added
                                  END) AS DOUBLE) / 1e6
                         / SUM(CASE WHEN sim_gap IS NULL THEN 0 ELSE n_added END),
                         6) > {RETRAIN_INDEX_GAP_T} AS g
            FROM rep
        ),
        {_lloyd_chain_sql(prefix="r", src="vecs")},
        ranked_new AS (
            SELECT v.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN rc1 c
        ),
        eff AS (
            SELECT vec_id, centroid_id FROM ranked_new
            WHERE rn = 1 AND (SELECT g FROM verdict)
            UNION ALL
            SELECT vec_id, centroid_id FROM assigned
            WHERE NOT (SELECT g FROM verdict)
        ),
        effc AS (
            SELECT centroid_id, c_emb FROM rc1 WHERE (SELECT g FROM verdict)
            UNION ALL
            SELECT centroid_id, c_emb FROM c1 WHERE NOT (SELECT g FROM verdict)
        ),
        q AS (SELECT emb AS q_emb FROM vecs WHERE vec_id = 0),
        probe AS (
            SELECT centroid_id FROM (
                SELECT c.centroid_id,
                       ROW_NUMBER() OVER (
                           ORDER BY round(list_cosine_similarity(c.c_emb, q.q_emb), 9) DESC,
                                    c.centroid_id
                       ) AS prn
                FROM effc c CROSS JOIN q
            ) WHERE prn = 1
        )
        SELECT vec_id, sim FROM (
            SELECT v.vec_id,
                   round(list_cosine_similarity(v.emb, q.q_emb), 6) AS sim,
                   ROW_NUMBER() OVER (
                       ORDER BY round(list_cosine_similarity(v.emb, q.q_emb), 6) DESC,
                                v.vec_id
                   ) AS rn
            FROM vecs v
            JOIN eff e ON v.vec_id = e.vec_id
            CROSS JOIN q
            WHERE e.centroid_id = (SELECT centroid_id FROM probe)
              AND v.vec_id <> 0
        ) WHERE rn <= {IVF_K}
    """,
    tags=("ext-sim", "pipeline", "opt-partition-pruning"),
)
def ann_retrain_serve_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SERVE through the retrained index — the chain the lifecycle ends
    on: decision → global retrain → swap → answer queries from the
    published index. The fixture is ann_global_retrain's (idempotent —
    after its marker this key pays one partition-pruned probe, nothing
    else); serving is TRAIN-FREE and reads ONLY the stored artifacts the
    swap published: the query ranks against the swapped ``centroids/``
    table (centroid-count rows), its nprobe=1 bucket is read under a
    planning-time partition filter, exact top-k inside.

    The oracle replays the WHOLE chain conditionally — drift verdict,
    the branch's effective centroids AND assignment, the probe argmax,
    the in-bucket top-k — so a serve that read a stale (pre-swap) index,
    a half-published staging dir, or an unrefreshed assignment
    hash-mismatches. With ann_global_retrain hashing the swapped index
    itself, the pair proves publish + serve agree end to end."""
    import os

    vecs = _vectors(spark, sf_dir)
    is_add = F.pmod(F.col("vec_id"), F.lit(INCR_BATCH_MOD)) == INCR_BATCH_MOD - 1
    n_base = vecs.filter(~is_add).count()
    if n_base == 0:
        return spark.createDataFrame([], "vec_id bigint, sim double")
    # ensure the decision->retrain->swap fixture (idempotent per sf_dir)
    ann_global_retrain(spark, sf_dir)
    k = auto_centroids(n_base)
    path = os.path.join(
        os.path.dirname(_ivf_index_path(sf_dir, k)), f"gretrain_lloyd1_c{k}"
    )
    q_row = vecs.filter(F.col("vec_id") == 0).select("embedding").head()
    if q_row is None:
        return spark.createDataFrame([], "vec_id bigint, sim double")
    cent_r = _layout_read(spark, os.path.join(path, "centroids"), "centroids")
    q = F.broadcast(
        vecs.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    )
    probe = [
        r["centroid_id"]
        for r in cent_r.crossJoin(q)
        .select(
            "centroid_id",
            F.round(cosine(F.col("c_emb"), F.col("q_emb")), 9).alias("s"),
        )
        .orderBy(F.col("s").desc(), "centroid_id")
        .limit(1)
        .collect()
    ]
    q_emb = q_row[0]
    qc = F.array(*[F.lit(float(x)) for x in q_emb])
    idx = (
        _layout_read(spark, os.path.join(path, "vectors"), "vectors")
        .filter(F.col("centroid_id").isin(probe))
        .filter(F.col("vec_id") != 0)
    )
    sim = F.round(cosine(F.col("embedding").cast("array<double>"), qc), 6)
    return (
        idx.select("vec_id", sim.alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(IVF_K)
    )


def _split_ctes(where: str = "TRUE") -> str:
    """The selective-split CTE chain (decision -> flagged -> per-cell
    2-means -> split_final), shared verbatim by ann_cell_split_retrain,
    the materialized split-index serve oracle, and the split-layout
    add/delete oracles so none can drift. Spliced as
    ``WITH {_split_ctes()}``; exposes vecs0 (the UNFILTERED corpus, for
    callers that hold a slice out of the build) plus
    vecs/assigned/flagged/sc1/split_final over the ``where``-filtered
    corpus."""
    return f"""vecs0 AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        vecs AS (
            SELECT vec_id, emb FROM vecs0 WHERE {where}
        ),
        base AS (
            SELECT vec_id, emb FROM vecs WHERE vec_id % {INCR_BATCH_MOD} <> {INCR_BATCH_MOD - 1}
        ),
        {_lloyd_chain_sql(src="base")},
        ranked AS (
            SELECT v.vec_id, v.emb, c.centroid_id,
                   round(list_cosine_similarity(v.emb, c.c_emb), 9) AS c_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN c1 c
        ),
        assigned AS (
            SELECT vec_id, emb, centroid_id, c_sim,
                   CAST(vec_id % {INCR_BATCH_MOD} = {INCR_BATCH_MOD - 1} AS INT) AS is_add
            FROM ranked WHERE rn = 1
        ),
        rep AS (
            SELECT centroid_id,
                   COUNT(*) FILTER (WHERE is_add = 0) AS n_base,
                   COUNT(*) FILTER (WHERE is_add = 1) AS n_added,
                   CASE WHEN COUNT(*) FILTER (WHERE is_add = 0) = 0
                             OR COUNT(*) FILTER (WHERE is_add = 1) = 0 THEN NULL
                        ELSE round(
                            round(CAST(SUM(CAST(c_sim AS DECIMAL(38,9)))
                                      FILTER (WHERE is_add = 0) AS DOUBLE)
                                  / COUNT(*) FILTER (WHERE is_add = 0), 6)
                          - round(CAST(SUM(CAST(c_sim AS DECIMAL(38,9)))
                                      FILTER (WHERE is_add = 1) AS DOUBLE)
                                  / COUNT(*) FILTER (WHERE is_add = 1), 6), 6) END
                       AS sim_gap
            FROM assigned GROUP BY centroid_id
        ),
        flagged AS (
            SELECT centroid_id FROM rep
            WHERE COALESCE(sim_gap > {RETRAIN_GAP_T}, FALSE)
               OR n_added * {INCR_BATCH_MOD - 1} > {RETRAIN_GROWTH_X} * n_base
        ),
        members AS (
            SELECT a.vec_id, a.emb, a.centroid_id
            FROM assigned a JOIN flagged f USING (centroid_id)
        ),
        s2 AS (
            SELECT centroid_id, vec_id, srn - 1 AS sub_id FROM (
                SELECT centroid_id, vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY centroid_id
                           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                       ) AS srn
                FROM members
            ) WHERE srn <= 2
        ),
        sc0 AS (
            SELECT s2.centroid_id, s2.sub_id, m.emb AS s_emb
            FROM s2 JOIN members m
              ON s2.vec_id = m.vec_id AND s2.centroid_id = m.centroid_id
        ),
        sa1 AS (
            SELECT vec_id, centroid_id, sub_id, emb FROM (
                SELECT m.vec_id, m.centroid_id, c.sub_id, m.emb,
                       ROW_NUMBER() OVER (
                           PARTITION BY m.centroid_id, m.vec_id
                           ORDER BY round(list_cosine_similarity(m.emb, c.s_emb), 9) DESC,
                                    c.sub_id
                       ) AS rn
                FROM members m JOIN sc0 c ON m.centroid_id = c.centroid_id
            ) WHERE rn = 1
        ),
        sm1 AS (
            SELECT centroid_id, sub_id, pos - 1 AS pos,
                   CAST(SUM(CAST(val AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS m
            FROM (
                SELECT centroid_id, sub_id, unnest(emb) AS val,
                       generate_subscripts(emb, 1) AS pos
                FROM sa1
            )
            GROUP BY centroid_id, sub_id, pos
        ),
        sc1 AS (
            SELECT centroid_id, sub_id, list(m ORDER BY pos) AS s_emb
            FROM sm1 GROUP BY centroid_id, sub_id
        ),
        split_final AS (
            SELECT vec_id, centroid_id, sub_id FROM (
                SELECT m.vec_id, m.centroid_id, c.sub_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY m.centroid_id, m.vec_id
                           ORDER BY round(list_cosine_similarity(m.emb, c.s_emb), 9) DESC,
                                    c.sub_id
                       ) AS rn
                FROM members m JOIN sc1 c ON m.centroid_id = c.centroid_id
            ) WHERE rn = 1
        )"""


@register(
    "ann_cell_split_retrain",
    oracle=f"""
        WITH {_split_ctes()}
        SELECT a.vec_id, a.centroid_id,
               CAST(COALESCE(sf.sub_id, 0) AS INT) AS sub_id,
               (fl.centroid_id IS NOT NULL) AS was_split
        FROM assigned a
        LEFT JOIN flagged fl ON a.centroid_id = fl.centroid_id
        LEFT JOIN split_final sf
          ON a.vec_id = sf.vec_id AND a.centroid_id = sf.centroid_id
    """,
    tags=("ext-sim", "pipeline"),
)
def ann_cell_split_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retrain decision's ACTION half — selective cell splitting, the
    maintenance move FAISS-style systems make when a cell degrades: every
    cell ann_retrain_decision flags is re-clustered LOCALLY into two
    sub-cells (per-cell deterministic md5 sample seed + one Lloyd step —
    the serving trainer's exact recipe scoped to the cell's members),
    while every healthy cell's assignment is byte-for-byte untouched.
    Output is the full post-maintenance assignment (vec_id, centroid_id,
    sub_id, was_split): flagged cells carry their members' sub-cell, the
    rest sub_id 0 — the layout a serving probe reads as (centroid_id,
    sub_id) nested partitions after the split materializes.

    Why this beats a global retrain at 100 TB: the drift report says
    WHICH cells degraded; re-clustering only those touches the flagged
    fraction of the corpus (here 2 of 6 cells at the driver scale), and
    every unflagged cell's partition — and any PQ codes or cached probes
    over it — stays valid. A global retrain moves every centroid and
    invalidates the entire layout for a problem localized to a few cells.

    Scale shape: decision = the drift aggregate (|centroids| rows);
    split = the flagged members re-ranked against 2·|flagged| broadcast
    sub-seeds plus one decimal-exact mean over (cell, sub, dim) groups —
    all changeset-fraction-sized; the unflagged corpus is never
    reshuffled (left joins against centroid-count frames)."""
    state = _split_state(spark, sf_dir)
    if state is None:
        return spark.createDataFrame(
            [], "vec_id bigint, centroid_id bigint, sub_id int, was_split boolean"
        )
    _cent, assigned, flagged, _sc1, split_final = state
    flagged_mark = flagged.withColumn("was_split", F.lit(True))
    return (
        assigned.join(F.broadcast(flagged_mark), "centroid_id", "left")
        .join(split_final, ["vec_id", "centroid_id"], "left")
        .select(
            "vec_id",
            "centroid_id",
            F.coalesce(F.col("sub_id"), F.lit(0)).cast("int").alias("sub_id"),
            F.coalesce(F.col("was_split"), F.lit(False)).alias("was_split"),
        )
    )


def _split_state(spark: SparkSession, sf_dir: str, vec_pred=None):
    """The selective-split computation shared by ann_cell_split_retrain
    and the materialized split-index build: (cent base-trained centroids,
    assigned, flagged, sc1 refined sub-centroids, split_final
    sub-assignment), or None on an empty corpus. ``assigned`` is
    persisted (decision + members + the callers' stitches all read
    it). ``vec_pred`` (a Column predicate) restricts the corpus the
    state is computed over — the split-layout add key holds a slice out
    of the build this way (oracle twin: _split_ctes(where=...))."""
    vecs = _vectors(spark, sf_dir)
    if vec_pred is not None:
        vecs = vecs.filter(vec_pred)
    is_add = F.pmod(F.col("vec_id"), F.lit(INCR_BATCH_MOD)) == INCR_BATCH_MOD - 1
    base = vecs.filter(~is_add)
    n_base = base.count()
    if n_base == 0:
        return None
    cent = lloyd_centroids(base, auto_centroids(n_base))
    assigned = (
        _ranked_against(vecs, cent)
        .filter(F.col("rn") == 1)
        .select(
            "vec_id", "embedding", "centroid_id", "c_sim",
            is_add.cast("int").alias("is_add"),
        )
        .persist()
    )
    assigned.count()  # decision + members + final stitch all read it
    dsim = F.col("c_sim").cast("decimal(38,9)")
    base_n = F.count(F.when(F.col("is_add") == 0, 1))
    add_n = F.count(F.when(F.col("is_add") == 1, 1))
    mean_of = lambda flag, cnt: F.when(  # noqa: E731 — the drift report's formula
        cnt == 0, F.lit(None).cast("double")
    ).otherwise(
        F.round(F.sum(F.when(F.col("is_add") == flag, dsim)).cast("double") / cnt, 6)
    )
    rep = assigned.groupBy("centroid_id").agg(
        base_n.alias("n_base"),
        add_n.alias("n_added"),
        F.round(mean_of(0, base_n) - mean_of(1, add_n), 6).alias("sim_gap"),
    )
    flagged = rep.filter(
        F.coalesce(F.col("sim_gap") > RETRAIN_GAP_T, F.lit(False))
        | (F.col("n_added") * (INCR_BATCH_MOD - 1) > RETRAIN_GROWTH_X * F.col("n_base"))
    ).select("centroid_id")
    members = assigned.join(F.broadcast(flagged), "centroid_id", "left_semi").select(
        "vec_id", "embedding", "centroid_id"
    )
    w_seed = Window.partitionBy("centroid_id").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    sc0 = (
        members.withColumn("srn", F.row_number().over(w_seed))
        .filter(F.col("srn") <= 2)
        .select(
            "centroid_id",
            (F.col("srn") - 1).cast("int").alias("sub_id"),
            F.col("embedding").alias("s_emb"),
        )
    )
    sim9 = F.round(cosine(F.col("embedding"), F.col("s_emb")), 9)
    w_cell = Window.partitionBy("centroid_id", "vec_id").orderBy(
        F.col("s_sim").desc(), F.col("sub_id")
    )

    def _argmax_sub(seed_frame: DataFrame) -> DataFrame:
        return (
            members.join(F.broadcast(seed_frame), "centroid_id")
            .select("vec_id", "centroid_id", "embedding", "sub_id", sim9.alias("s_sim"))
            .withColumn("rn", F.row_number().over(w_cell))
            .filter(F.col("rn") == 1)
        )

    sa1 = _argmax_sub(sc0).select("vec_id", "centroid_id", "sub_id", "embedding")
    sc1 = (
        sa1.select("centroid_id", "sub_id", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("centroid_id", "sub_id", "pos")
        .agg(
            (F.sum(F.col("val").cast("decimal(38,9)")).cast("double") / F.count("*")).alias("m")
        )
        .groupBy("centroid_id", "sub_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("centroid_id", "sub_id", F.transform("pm", lambda s: s["m"]).alias("s_emb"))
    )
    split_final = _argmax_sub(sc1).select("vec_id", "centroid_id", "sub_id")
    return cent, assigned, flagged, sc1, split_final


def _split_index_path(sf_dir: str, k: int) -> str:
    import os

    return os.path.join(
        os.path.dirname(_ivf_index_path(sf_dir, k)), f"split_lloyd1_c{k}"
    )


def split_build_index(spark: SparkSession, sf_dir: str, path: str, vec_pred=None) -> None:
    """Materialize the post-split layout ann_cell_split_retrain computes:

    - ``centroids/``: the base-trained coarse centroids (probe level 1);
    - ``sub_centroids/``: the refined per-cell sub-centroids of the split
      cells only (probe level 2 — empty-of-a-cell means the cell was
      healthy and serves whole);
    - ``vectors/``: every vector written partitionBy(centroid_id, sub_id)
      — healthy cells land in sub_id=0, split cells in their sub-cell —
      so a probe prunes to ONE (cell, sub-cell) directory.

    Quantizer tables write FIRST (the codebook-first rationale).
    ``vec_pred`` restricts the indexed corpus (see _split_state)."""
    import os

    state = _split_state(spark, sf_dir, vec_pred)
    if state is None:
        raise ValueError("empty corpus: nothing to index")
    cent, assigned, _flagged, sc1, split_final = state
    cent.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    sc1.write.mode("overwrite").parquet(os.path.join(path, "sub_centroids"))
    post = (
        assigned.join(split_final, ["vec_id", "centroid_id"], "left")
        .select(
            "vec_id",
            "embedding",
            "centroid_id",
            F.coalesce(F.col("sub_id"), F.lit(0)).cast("int").alias("sub_id"),
        )
    )
    post.write.partitionBy("centroid_id", "sub_id").mode("overwrite").parquet(
        os.path.join(path, "vectors")
    )
    # every consumer of the persisted assignment materialized in the
    # three writes above — holding the cache past the build is the same
    # leak class the tfidf dispatch fix closed (the retrain KEY keeps its
    # cache because its consumers materialize after it returns)
    assigned.unpersist()


@register(
    "ann_split_index_serve",
    oracle=f"""
        WITH {_split_ctes()},
        q0 AS (SELECT emb AS q_emb FROM vecs WHERE vec_id = 0),
        cstar AS (SELECT centroid_id FROM ranked WHERE vec_id = 0 AND rn = 1),
        subrank AS (
            SELECT c.sub_id,
                   ROW_NUMBER() OVER (
                       ORDER BY round(list_cosine_similarity(q0.q_emb, c.s_emb), 9) DESC,
                                c.sub_id
                   ) AS rn
            FROM sc1 c JOIN cstar ON c.centroid_id = cstar.centroid_id
            CROSS JOIN q0
        ),
        substar AS (
            SELECT COALESCE((SELECT sub_id FROM subrank WHERE rn = 1), 0) AS sub_id
        ),
        post AS (
            SELECT a.vec_id, a.centroid_id, COALESCE(sf.sub_id, 0) AS sub_id
            FROM assigned a
            LEFT JOIN split_final sf
              ON a.vec_id = sf.vec_id AND a.centroid_id = sf.centroid_id
        )
        SELECT p.vec_id,
               round(list_cosine_similarity(v.emb, q0.q_emb), 6) AS sim
        FROM post p
        JOIN vecs v ON p.vec_id = v.vec_id
        CROSS JOIN q0 CROSS JOIN cstar CROSS JOIN substar
        WHERE p.centroid_id = cstar.centroid_id
          AND p.sub_id = substar.sub_id
          AND p.vec_id <> 0
        ORDER BY sim DESC, p.vec_id
        LIMIT {IVF_K}
    """,
    tags=("ext-sim", "opt-partition-pruning"),
)
def ann_split_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving THROUGH the split (the round's lifecycle, closed at the
    probe): split_build_index materializes ann_cell_split_retrain's
    layout — vectors partitioned by (centroid_id, sub_id), the base
    centroids and the split cells' refined sub-centroids stored beside
    them — and the probe cascades: rank the query against the stored
    coarse table, then (iff its cell was split) against that cell's two
    stored sub-centroids, then read exactly ONE (cell, sub-cell)
    directory via planning-time pruning on BOTH partition columns. A
    split cell therefore costs a probe HALF the bucket it used to scan
    — the read-side payoff the split exists to buy — while healthy
    cells serve whole, unchanged.

    Train-free serving like every *_index_serve key: the probe touches
    centroid-count tables plus one pruned directory; the oracle replays
    the full split chain and states the served result equals the
    in-memory cascade exactly."""
    import os

    vecs = _vectors(spark, sf_dir)
    n = vecs.count()
    if n == 0:
        return spark.createDataFrame([], "vec_id bigint, sim double")
    is_add = F.pmod(F.col("vec_id"), F.lit(INCR_BATCH_MOD)) == INCR_BATCH_MOD - 1
    k = auto_centroids(vecs.filter(~is_add).count())
    path = _split_index_path(sf_dir, k)
    src = os.path.join(sf_dir, "embeddings.parquet")
    from ..io import materialization_is_fresh

    if not all(
        materialization_is_fresh(os.path.join(path, d), src)
        for d in ("vectors", "centroids", "sub_centroids")
    ):
        split_build_index(spark, sf_dir, path)
    q_row = vecs.filter(F.col("vec_id") == 0).select("embedding").head()
    if q_row is None:
        return spark.createDataFrame([], "vec_id bigint, sim double")
    q_emb = list(q_row[0])
    q_frame = vecs.filter(F.col("vec_id") == 0)
    cent_r = _layout_read(spark, os.path.join(path, "centroids"), "centroids")
    c_star = (
        _ranked_against(q_frame, cent_r)
        .filter(F.col("rn") <= 1)
        .select("centroid_id")
        .collect()[0]["centroid_id"]
    )
    # level 2: only the probed cell's sub-centroids are read (two rows at
    # most — a split cell has exactly two sub-cells, a healthy cell none)
    sub_r = _layout_read(spark, os.path.join(path, "sub_centroids"), "sub_centroids").filter(
        F.col("centroid_id") == c_star
    )
    sub_rows = (
        _ranked_against(
            q_frame,
            sub_r.select(F.col("sub_id").alias("centroid_id"), F.col("s_emb").alias("c_emb")),
        )
        .filter(F.col("rn") <= 1)
        .select("centroid_id")
        .collect()
    )
    s_star = sub_rows[0]["centroid_id"] if sub_rows else 0
    idx = _layout_read(spark, os.path.join(path, "vectors"), "vectors_split").filter(
        (F.col("centroid_id") == c_star) & (F.col("sub_id") == s_star)
    )
    q = F.array(*[F.lit(float(x)) for x in q_emb])
    sim = F.round(cosine(F.col("embedding").cast("array<double>"), q), 6)
    return (
        idx.filter(F.col("vec_id") != 0)
        .select("vec_id", sim.alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(IVF_K)
    )


def split_index_incremental_add(
    spark: SparkSession, path: str, batch: DataFrame, skip_existing: bool = False,
    schema_memo: dict | None = None,
) -> list[tuple]:
    """Fold an arriving embedding batch into the materialized SPLIT
    layout — the add path ann_cell_split_retrain's output was missing
    (without it the split index is build-once/serve-only and every batch
    after a split forces a rebuild). Two-stage assignment against BOTH
    stored frozen quantizer levels:

    - stage 1: nearest stored coarse centroid (``centroids/`` — same
      frozen-quantizer invariant as every add here);
    - stage 2: iff that cell was split (has rows in ``sub_centroids/``),
      nearest of its two stored sub-centroids — tie-broken exactly like
      the serve cascade (s_sim desc, sub_id); healthy cells take
      sub_id=0.

    The assigned batch APPENDS into ``vectors/`` partitioned by
    (centroid_id, sub_id): only partitions receiving batch rows gain
    files, everything else stays byte-identical (tested), and the job
    shuffles the BATCH, never the index. ``skip_existing`` replays
    idempotently by anti-joining the touched partitions' vec_ids (the
    foreachBatch retry contract, same as the flat add). Returns the
    touched (centroid_id, sub_id) keys."""
    import os

    cent_r = _memo_read(spark, os.path.join(path, "centroids"), schema_memo)
    sub_r = _memo_read(spark, os.path.join(path, "sub_centroids"), schema_memo)
    a1 = (
        _ranked_against(batch, cent_r)
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "centroid_id")
    )
    s_sim = F.round(cosine(F.col("embedding"), F.col("s_emb")), 9)
    w_vec = Window.partitionBy("vec_id").orderBy(
        F.col("s_sim").desc_nulls_last(), F.col("sub_id")
    )
    # one assignment job feeds every use below (_collect_touched)
    assigned, touched = _collect_touched(
        a1.join(F.broadcast(sub_r), "centroid_id", "left")
        .select("vec_id", "embedding", "centroid_id", "sub_id", s_sim.alias("s_sim"))
        .withColumn("rn2", F.row_number().over(w_vec))
        .filter(F.col("rn2") == 1)
        .select(
            "vec_id",
            "embedding",
            "centroid_id",
            F.coalesce(F.col("sub_id"), F.lit(0)).cast("int").alias("sub_id"),
        ),
        "centroid_id",
        "sub_id",
    )
    if skip_existing and touched:
        from ..operators.compaction import keys_filter

        existing = (
            _memo_read(spark, os.path.join(path, "vectors"), schema_memo)
            .filter(keys_filter(("centroid_id", "sub_id"), touched))
            .select("vec_id")
        )
        out = assigned.join(existing, "vec_id", "left_anti")
    else:
        out = assigned
    out.write.mode("append").partitionBy("centroid_id", "sub_id").parquet(
        os.path.join(path, "vectors")
    )
    return touched


#: The split-add key's holdout slice: vec_id ≡ 11 (mod 16) — disjoint
#: from the split state's internal base/add classes (7, 15 mod 16) and
#: from the delete keys' takedown class (5 mod 16).
SPLIT_ADD_MOD = 16
SPLIT_ADD_REM = 11

#: Two-stage batch assignment against the frozen split quantizers — the
#: SQL twin of split_index_incremental_add, spliced after _split_ctes().
_SPLIT_BATCH_ASSIGN_SQL = f"""
        b1 AS (
            SELECT vec_id, emb, centroid_id FROM (
                SELECT v.vec_id, v.emb, c.centroid_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                    c.centroid_id
                       ) AS rn
                FROM vecs0 v CROSS JOIN c1 c
                WHERE v.vec_id % {SPLIT_ADD_MOD} = {SPLIT_ADD_REM}
            ) WHERE rn = 1
        ),
        b2 AS (
            SELECT vec_id, sub_id FROM (
                SELECT b.vec_id, s.sub_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY b.vec_id
                           ORDER BY round(list_cosine_similarity(b.emb, s.s_emb), 9) DESC,
                                    s.sub_id
                       ) AS rn
                FROM b1 b JOIN sc1 s ON b.centroid_id = s.centroid_id
            ) WHERE rn = 1
        ),
        badd AS (
            SELECT b.vec_id, b.centroid_id,
                   CAST(COALESCE(b2.sub_id, 0) AS BIGINT) AS sub_id
            FROM b1 b LEFT JOIN b2 ON b.vec_id = b2.vec_id
        ),
        post AS (
            SELECT a.vec_id, a.centroid_id,
                   CAST(COALESCE(sf.sub_id, 0) AS BIGINT) AS sub_id
            FROM assigned a
            LEFT JOIN split_final sf
              ON a.vec_id = sf.vec_id AND a.centroid_id = sf.centroid_id
        )"""


@register(
    "ann_split_incremental_add",
    oracle=f"""
        WITH {_split_ctes(where=f"vec_id % {SPLIT_ADD_MOD} <> {SPLIT_ADD_REM}")},
        {_SPLIT_BATCH_ASSIGN_SQL}
        SELECT vec_id, centroid_id, sub_id FROM post
        UNION ALL
        SELECT vec_id, centroid_id, sub_id FROM badd
    """,
    tags=("ext-sim", "opt-partition-pruning"),
)
def ann_split_incremental_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental add ON THE SPLIT LAYOUT, driver-checked end to end:
    build the split index holding out vec_id ≡ 11 (mod 16), then fold
    the holdout in via split_index_incremental_add — two-stage
    assignment against the stored frozen coarse + sub-centroid tables,
    partition-scoped append into (centroid_id, sub_id) directories.

    The returned frame is the post-add index read back from disk; the
    oracle replays the held-out build's split chain and states the add
    equals the standing layout UNION the batch's two-stage assignment
    against those frozen quantizers — the rebuild-equivalence property,
    now on the richest layout (it holds only because BOTH quantizer
    levels freeze through adds)."""
    import os

    vecs = _vectors(spark, sf_dir)
    hold = F.pmod(F.col("vec_id"), F.lit(SPLIT_ADD_MOD)) == SPLIT_ADD_REM
    standing = vecs.filter(~hold)
    is_add = F.pmod(F.col("vec_id"), F.lit(INCR_BATCH_MOD)) == INCR_BATCH_MOD - 1
    n_base = standing.filter(~is_add).count()
    if n_base == 0:
        return spark.createDataFrame(
            [], "vec_id bigint, centroid_id bigint, sub_id bigint"
        )
    k = auto_centroids(n_base)
    path = os.path.join(
        os.path.dirname(_ivf_index_path(sf_dir, k)), f"splitincr_lloyd1_c{k}"
    )
    marker = os.path.join(path, "_INCR_SUCCESS")
    src = os.path.join(sf_dir, "embeddings.parquet")
    from ..io import materialization_is_fresh

    if not (
        all(
            materialization_is_fresh(os.path.join(path, d), src)
            for d in ("vectors", "centroids", "sub_centroids")
        )
        and _incr_marker_fresh(marker, sf_dir)
    ):
        split_build_index(spark, sf_dir, path, vec_pred=~hold)
        split_index_incremental_add(spark, path, vecs.filter(hold))
        open(marker, "w").close()
    idx = _layout_read(spark, os.path.join(path, "vectors"), "vectors_split")
    return idx.select(
        "vec_id",
        F.col("centroid_id").cast("bigint").alias("centroid_id"),
        F.col("sub_id").cast("bigint").alias("sub_id"),
    )


@register(
    "ann_split_index_delete",
    oracle=f"""
        WITH {_split_ctes()},
        post AS (
            SELECT a.vec_id, a.centroid_id,
                   CAST(COALESCE(sf.sub_id, 0) AS BIGINT) AS sub_id
            FROM assigned a
            LEFT JOIN split_final sf
              ON a.vec_id = sf.vec_id AND a.centroid_id = sf.centroid_id
        )
        SELECT vec_id, centroid_id, sub_id FROM post
        WHERE vec_id % {DEL_MOD} <> {DEL_REM}
    """,
    tags=("ext-sim", "opt-partition-pruning"),
)
def ann_split_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Takedown ON THE SPLIT LAYOUT — the last cell of the deletion
    matrix (flat IVF / IVFPQ / two-level / split): the SAME generic
    ivf_index_delete drives it with partition_cols=("centroid_id",
    "sub_id"), locating victims under the two-column keys, rewriting
    only those nested directories, sweeping emptied leaves with their
    hollowed parents through the Hadoop FS helpers. Both quantizer
    levels stay frozen; the oracle is the full split chain minus the
    deleted ids (vec_id ≡ 5 mod 16 — the shared takedown class)."""
    import os

    vecs = _vectors(spark, sf_dir)
    n = vecs.count()
    if n == 0:
        return spark.createDataFrame(
            [], "vec_id bigint, centroid_id bigint, sub_id bigint"
        )
    is_add = F.pmod(F.col("vec_id"), F.lit(INCR_BATCH_MOD)) == INCR_BATCH_MOD - 1
    k = auto_centroids(vecs.filter(~is_add).count())
    path = os.path.join(
        os.path.dirname(_ivf_index_path(sf_dir, k)), f"splitdel_lloyd1_c{k}"
    )
    marker = os.path.join(path, "_DEL_SUCCESS")
    src = os.path.join(sf_dir, "embeddings.parquet")
    from ..io import materialization_is_fresh

    if not (
        all(
            materialization_is_fresh(os.path.join(path, d), src)
            for d in ("vectors", "centroids", "sub_centroids")
        )
        and _incr_marker_fresh(marker, sf_dir)
    ):
        split_build_index(spark, sf_dir, path)
        ivf_index_delete(
            spark,
            path,
            vecs.filter(F.pmod(F.col("vec_id"), F.lit(DEL_MOD)) == DEL_REM).select(
                "vec_id"
            ),
            partition_cols=("centroid_id", "sub_id"),
        )
        open(marker, "w").close()
    idx = _layout_read(spark, os.path.join(path, "vectors"), "vectors_split")
    return idx.select(
        "vec_id",
        F.col("centroid_id").cast("bigint").alias("centroid_id"),
        F.col("sub_id").cast("bigint").alias("sub_id"),
    )


@register(
    "ann_split_index_delete_lookup",
    oracle=f"""
        WITH {_split_ctes()},
        post AS (
            SELECT a.vec_id, a.centroid_id,
                   CAST(COALESCE(sf.sub_id, 0) AS BIGINT) AS sub_id
            FROM assigned a
            LEFT JOIN split_final sf
              ON a.vec_id = sf.vec_id AND a.centroid_id = sf.centroid_id
        )
        SELECT vec_id, centroid_id, sub_id FROM post
        WHERE vec_id % {DEL_MOD} <> {DEL_REM}
    """,
    tags=("ext-sim", "opt-partition-pruning"),
)
def ann_split_index_delete_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-index-read takedown on the SPLIT layout — with this the
    lookup-driven locate serves every materialized shape (flat r10,
    two-level + split r11): the lookup rows carry (centroid_id, sub_id),
    locate is a bucket-pruned point read yielding complete nested victim
    tuples, ivf_index_delete consumes them via ``touched=`` with no index
    scan, and the refresh rebuilds only the deleted ids' hash buckets.
    The returned frame is the post-delete LOOKUP read back from disk,
    hashed against the split chain minus the takedown class — consistency
    of the derived table with the richest layout, driver-checked."""
    import os

    from ..io import materialization_is_fresh
    from ..operators.ann_lookup import build_lookup, locate, refresh_lookup_buckets

    cols = ("centroid_id", "sub_id")
    vecs = _vectors(spark, sf_dir)
    n = vecs.count()
    if n == 0:
        return spark.createDataFrame(
            [], "vec_id bigint, centroid_id bigint, sub_id bigint"
        )
    is_add = F.pmod(F.col("vec_id"), F.lit(INCR_BATCH_MOD)) == INCR_BATCH_MOD - 1
    k = auto_centroids(vecs.filter(~is_add).count())
    path = os.path.join(
        os.path.dirname(_ivf_index_path(sf_dir, k)), f"splitdellk_lloyd1_c{k}"
    )
    marker = os.path.join(path, "_DELLK_SUCCESS")
    src = os.path.join(sf_dir, "embeddings.parquet")
    if not (
        all(
            materialization_is_fresh(os.path.join(path, d), src)
            for d in ("vectors", "centroids", "sub_centroids")
        )
        and _incr_marker_fresh(marker, sf_dir)
    ):
        split_build_index(spark, sf_dir, path)
        build_lookup(spark, path, partition_cols=cols)
        dels = vecs.filter(
            F.pmod(F.col("vec_id"), F.lit(DEL_MOD)) == DEL_REM
        ).select("vec_id")
        touched = sorted(
            (r["centroid_id"], r["sub_id"])
            for r in locate(spark, path, dels, partition_cols=cols)
            .select(*cols)
            .distinct()
            .collect()
        )
        ivf_index_delete(
            spark, path, dels, partition_cols=cols, touched=touched
        )
        refresh_lookup_buckets(spark, path, dels, partition_cols=cols)
        open(marker, "w").close()
    lk = _layout_read(spark, os.path.join(path, "lookup"), "lookup_split")
    return lk.select(
        "vec_id",
        F.col("centroid_id").cast("bigint").alias("centroid_id"),
        F.col("sub_id").cast("bigint").alias("sub_id"),
    )


# --- Embedding/PQ quality metrics --------------------------------------------

#: Outliers reported per label: the top-N vectors most distant from their
#: label centroid — rank-based (no distributional threshold), so the
#: report is non-empty and deterministic on any corpus.
OUTLIER_TOP_N = 3


@register(
    "embedding_outliers",
    oracle=f"""
        WITH e AS (
            SELECT label, vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
                   unnest(embedding::DOUBLE[]) AS val
            FROM embeddings
        ),
        m AS (
            SELECT label, pos,
                   CAST(SUM(CAST(val AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS m
            FROM e GROUP BY label, pos
        ),
        d AS (
            SELECT e.label, e.vec_id,
                   sqrt(CAST(SUM(CAST(round((e.val - m.m) * (e.val - m.m) * 1e9)
                                      AS BIGINT)) AS DOUBLE) / 1e9) AS dist
            FROM e JOIN m ON e.label = m.label AND e.pos = m.pos
            GROUP BY e.label, e.vec_id
        )
        SELECT label, vec_id, round(dist, 6) AS dist
        FROM (
            SELECT label, vec_id, dist,
                   ROW_NUMBER() OVER (PARTITION BY label
                                      ORDER BY dist DESC, vec_id) AS rn
            FROM d
        ) WHERE rn <= {OUTLIER_TOP_N}
    """,
    tags=("ext-sim", "pipeline"),
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding outliers: the OUTLIER_TOP_N vectors farthest
    (L2) from their own label's centroid — the mislabeled/noisy-vector
    report a curation pass reviews before trusting label metadata (the
    embedding-space dual of lang_confusion_matrix's claim-vs-content
    audit, and the pruning signal SemDeDup-style pipelines apply inside
    clusters).

    Plan: the centroid is the decimal-exact per-(label, pos) mean the
    drift/centroid keys already own (label-count-bounded aggregate); the
    distance pass joins each vector component to its centroid component
    — the join's build side is |labels|·dim rows, broadcastable at any
    corpus scale — and sums squared residuals through the fixed-point
    form (round(x·1e9) longs), so the per-vector reduction is
    order-independent and the sqrt/round-6 output hash-matches exactly.
    Per-label top-N rides one WindowGroupLimit window. One vector-table
    pass, no pair joins."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "label", "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val"),
    )
    m = e.groupBy("label", "pos").agg(
        (F.sum(F.col("val").cast("decimal(38,9)")).cast("double") / F.count("*")).alias("m")
    )
    resid2 = (F.col("val") - F.col("m")) * (F.col("val") - F.col("m"))
    d = (
        e.join(m, ["label", "pos"])
        .groupBy("label", "vec_id")
        .agg(
            F.sqrt(
                F.sum(F.round(resid2 * F.lit(1e9)).cast("bigint")).cast("double") / F.lit(1e9)
            ).alias("dist")
        )
    )
    w = Window.partitionBy("label").orderBy(F.col("dist").desc(), "vec_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= OUTLIER_TOP_N)
        .select("label", "vec_id", F.round("dist", 6).alias("dist"))
    )


@register(
    "pq_reconstruction_error",
    oracle=f"""
        WITH {_PQ_CTES}
        SELECT block, COUNT(*) AS n_vecs,
               CAST(SUM(CAST(round(qd * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS total_qd,
               (CAST(SUM(CAST(round(qd * 1e9) AS BIGINT)) AS DOUBLE) / 1e9)
                   / COUNT(*) AS mean_qd
        FROM codes GROUP BY block
    """,
    tags=("ext-sim", "contract"),
)
def pq_reconstruction_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codebook quality as a checked query: per sub-space, the total
    and mean quantization distance (each vector's L2² to its assigned
    codebook entry — the qd the encoder already computes). This is THE
    number a PQ deployment tunes PQ_K/PQ_M against (reconstruction error
    ⇒ ADC ranking error), reported from the same deterministic
    codebook-training replay the pq_encode oracle pins — so a codebook
    regression shows up as a driver hash diff on PQ_M aggregate rows,
    the sketch-contract pattern with an exact (not bounded) metric.

    Plan: _pq_subvectors → one-step Lloyd codebook → broadcast argmin
    assignment (the registered encoder's plan, unchanged), then ONE
    map-combined aggregate to PQ_M rows. The qd sums go through the
    fixed-point form, so the totals are order-independent and
    hash-exact; mean divides identical doubles."""
    vecs = _vectors(spark, sf_dir)
    sub = _pq_subvectors(vecs).persist()
    sub.count()  # codebook training + assignment both read it
    cb = _pq_codebook(sub)
    codes = _pq_assign(sub, cb)
    total = F.sum(F.round(F.col("qd") * F.lit(1e9)).cast("bigint")).cast("double") / F.lit(1e9)
    return codes.groupBy("block").agg(
        F.count("*").alias("n_vecs"),
        total.alias("total_qd"),
        (total / F.count("*")).alias("mean_qd"),
    )


#: The honest curve sweeps the widths serving actually tunes over.
ANN_HONEST_NPROBES = (1, 2, 3, 4)


@register(
    "ann_recall_honest",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        seeds AS (
            SELECT vec_id FROM (
                SELECT vec_id,
                       ROW_NUMBER() OVER (
                           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                       ) AS srn
                FROM vecs
            ) WHERE srn <= {AUTO_K_SQL}
        ),
        centroids AS (
            SELECT v.vec_id AS centroid_id, v.emb AS c_emb
            FROM vecs v JOIN seeds s ON v.vec_id = s.vec_id
        ),
        queries AS (
            SELECT vec_id AS q_id, emb AS q_emb FROM (
                SELECT v.vec_id, v.emb,
                       ROW_NUMBER() OVER (ORDER BY v.vec_id) AS qrn
                FROM vecs v LEFT JOIN seeds s ON v.vec_id = s.vec_id
                WHERE s.vec_id IS NULL
            ) WHERE qrn <= {ANN_RECALL_NQ}
        ),
        exact AS (
            SELECT q_id, vec_id FROM (
                SELECT q.q_id, v.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.q_id
                           ORDER BY round(list_cosine_similarity(v.emb, q.q_emb), 6) DESC,
                                    v.vec_id
                       ) AS rn
                FROM vecs v CROSS JOIN queries q WHERE v.vec_id <> q.q_id
            ) WHERE rn <= {IVF_K}
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
        probes AS (
            SELECT q.q_id, np.nprobe, r.centroid_id
            FROM ranked r
            JOIN queries q ON r.vec_id = q.q_id
            CROSS JOIN (SELECT unnest([{", ".join(str(p) for p in ANN_HONEST_NPROBES)}]) AS nprobe) np
            WHERE r.rn <= np.nprobe
        ),
        cand AS (
            SELECT p.q_id, p.nprobe, a.vec_id, a.emb
            FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
            WHERE a.vec_id <> p.q_id
        ),
        ivf_top AS (
            SELECT q_id, nprobe, vec_id FROM (
                SELECT c.q_id, c.nprobe, c.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.q_id, c.nprobe
                           ORDER BY round(list_cosine_similarity(c.emb, q.q_emb), 6) DESC,
                                    c.vec_id
                       ) AS rn
                FROM cand c JOIN queries q ON c.q_id = q.q_id
            ) WHERE rn <= {IVF_K}
        ),
        grid AS (SELECT DISTINCT q_id, nprobe FROM probes),
        counts AS (
            SELECT t.q_id, t.nprobe, COUNT(*) AS n_hits
            FROM ivf_top t JOIN exact e ON t.q_id = e.q_id AND t.vec_id = e.vec_id
            GROUP BY t.q_id, t.nprobe
        )
        SELECT g.q_id, g.nprobe, COALESCE(c.n_hits, 0) AS n_hits,
               CAST(COALESCE(c.n_hits, 0) AS DOUBLE) / {IVF_K} AS recall
        FROM grid g LEFT JOIN counts c ON g.q_id = c.q_id AND g.nprobe = c.nprobe
    """,
    tags=("ext-sim", "contract"),
)
def ann_recall_honest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HONEST ANN recall curve — the number serving guidance must rest
    on. ann_recall_report measures the registered contract recipe, whose
    nprobe=1 recall is partly an evaluation coincidence: its query set
    (vec_ids 0..NQ) IS the first-k seed set, so every query's
    neighborhood starts centered on the query (kmeans_train's docstring
    carries the r5 measurement: first-k 0.875 vs independent seeds
    0.325-0.375 at nprobe=1, climbing to ~0.70 by nprobe=4). This key
    removes both thumbs from the scale:

    - centroids come from the SAMPLE seed (rank by md5(vec_id) — the
      production trainer's id-order-independent draw, deterministic so
      DuckDB replays it exactly), auto-k sized;
    - the query set is DISJOINT from the seed set (the lowest non-seed
      vec_ids), so no query is its own centroid;
    - the curve sweeps nprobe 1..4 — the boundary-loss floor and its
      recovery rate, per query, hash-pinned in the driver artifact.

    Same evaluation plumbing as ann_recall_report (_recall_frame — one
    definition of exact-side truth and probe-tier counting); only the
    seed and query-set policy differ, which is exactly the variable the
    honest curve isolates. Seeding-only (no Lloyd steps), mirroring the
    registered serving recipe; kmeans_iterate covers the Lloyd path."""
    vecs = _vectors(spark, sf_dir)
    k = auto_centroids(vecs.count())
    seeds = (
        vecs.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(k)
        .select("vec_id")
    )
    centroids = vecs.join(seeds, "vec_id", "left_semi").select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )
    queries = F.broadcast(
        vecs.join(seeds, "vec_id", "left_anti")
        .orderBy("vec_id")
        .limit(ANN_RECALL_NQ)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    )
    return _recall_frame(vecs, queries, _ranked_against(vecs, centroids), ANN_HONEST_NPROBES)


@register(
    "ann_recall_lloyd",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        {_lloyd_chain_sql()},
        queries AS (
            SELECT vec_id AS q_id, emb AS q_emb FROM (
                SELECT v.vec_id, v.emb,
                       ROW_NUMBER() OVER (ORDER BY v.vec_id) AS qrn
                FROM vecs v LEFT JOIN seeds s ON v.vec_id = s.vec_id
                WHERE s.vec_id IS NULL
            ) WHERE qrn <= {ANN_RECALL_NQ}
        ),
        exact AS (
            SELECT q_id, vec_id FROM (
                SELECT q.q_id, v.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.q_id
                           ORDER BY round(list_cosine_similarity(v.emb, q.q_emb), 6) DESC,
                                    v.vec_id
                       ) AS rn
                FROM vecs v CROSS JOIN queries q WHERE v.vec_id <> q.q_id
            ) WHERE rn <= {IVF_K}
        ),
        ranked AS (
            SELECT v.vec_id, v.emb, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN c1 c
        ),
        assigned AS (SELECT vec_id, emb, centroid_id FROM ranked WHERE rn = 1),
        probes AS (
            SELECT q.q_id, np.nprobe, r.centroid_id
            FROM ranked r
            JOIN queries q ON r.vec_id = q.q_id
            CROSS JOIN (SELECT unnest([{", ".join(str(p) for p in ANN_HONEST_NPROBES)}]) AS nprobe) np
            WHERE r.rn <= np.nprobe
        ),
        cand AS (
            SELECT p.q_id, p.nprobe, a.vec_id, a.emb
            FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
            WHERE a.vec_id <> p.q_id
        ),
        ivf_top AS (
            SELECT q_id, nprobe, vec_id FROM (
                SELECT c.q_id, c.nprobe, c.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.q_id, c.nprobe
                           ORDER BY round(list_cosine_similarity(c.emb, q.q_emb), 6) DESC,
                                    c.vec_id
                       ) AS rn
                FROM cand c JOIN queries q ON c.q_id = q.q_id
            ) WHERE rn <= {IVF_K}
        ),
        grid AS (SELECT DISTINCT q_id, nprobe FROM probes),
        counts AS (
            SELECT t.q_id, t.nprobe, COUNT(*) AS n_hits
            FROM ivf_top t JOIN exact e ON t.q_id = e.q_id AND t.vec_id = e.vec_id
            GROUP BY t.q_id, t.nprobe
        )
        SELECT g.q_id, g.nprobe, COALESCE(c.n_hits, 0) AS n_hits,
               CAST(COALESCE(c.n_hits, 0) AS DOUBLE) / {IVF_K} AS recall
        FROM grid g LEFT JOIN counts c ON g.q_id = c.q_id AND g.nprobe = c.nprobe
    """,
    tags=("ext-sim", "contract"),
)
def ann_recall_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does ONE Lloyd step buy recall at fixed nprobe? — the trainer
    question ann_recall_honest leaves open, as a driver-hash-pinned
    number instead of a claim. Identical evaluation policy to the honest
    curve (sample seed, auto-k, query set disjoint from the seeds,
    nprobe 1..4 via _recall_frame); the ONLY change is one deterministic
    Lloyd refinement (kmeans_step: round-9 argmax assignment →
    DECIMAL(38,9)-exact element-wise means) between seeding and index
    assignment. Comparing this curve against ann_recall_honest's in the
    same artifact isolates the refinement's recall value: training moved
    centroids toward cluster modes, so boundary loss at small nprobe
    should drop — by how much is now a recorded number, not a belief.

    At 100 TB the step is the trainer's cost story (kmeans_iterate): one
    broadcast assignment pass with no fact-side shuffle plus a
    |centroids|×dim mean aggregate — paying it once per index build is
    cheap insurance if (and only if) this curve says it buys recall."""
    vecs = _vectors(spark, sf_dir)
    k = auto_centroids(vecs.count())
    seeds = (
        vecs.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(k)
        .select("vec_id")
    )
    centroids = kmeans_train(vecs, k=k, n_iters=1, init="sample")
    queries = F.broadcast(
        vecs.join(seeds, "vec_id", "left_anti")
        .orderBy("vec_id")
        .limit(ANN_RECALL_NQ)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    )
    return _recall_frame(vecs, queries, _ranked_against(vecs, centroids), ANN_HONEST_NPROBES)


@register(
    "ann_recall_lloyd2",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        {_lloyd_chain_sql(n_iters=2)},
        queries AS (
            SELECT vec_id AS q_id, emb AS q_emb FROM (
                SELECT v.vec_id, v.emb,
                       ROW_NUMBER() OVER (ORDER BY v.vec_id) AS qrn
                FROM vecs v LEFT JOIN seeds s ON v.vec_id = s.vec_id
                WHERE s.vec_id IS NULL
            ) WHERE qrn <= {ANN_RECALL_NQ}
        ),
        exact AS (
            SELECT q_id, vec_id FROM (
                SELECT q.q_id, v.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.q_id
                           ORDER BY round(list_cosine_similarity(v.emb, q.q_emb), 6) DESC,
                                    v.vec_id
                       ) AS rn
                FROM vecs v CROSS JOIN queries q WHERE v.vec_id <> q.q_id
            ) WHERE rn <= {IVF_K}
        ),
        ranked AS (
            SELECT v.vec_id, v.emb, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN c2 c
        ),
        assigned AS (SELECT vec_id, emb, centroid_id FROM ranked WHERE rn = 1),
        probes AS (
            SELECT q.q_id, np.nprobe, r.centroid_id
            FROM ranked r
            JOIN queries q ON r.vec_id = q.q_id
            CROSS JOIN (SELECT unnest([{", ".join(str(p) for p in ANN_HONEST_NPROBES)}]) AS nprobe) np
            WHERE r.rn <= np.nprobe
        ),
        cand AS (
            SELECT p.q_id, p.nprobe, a.vec_id, a.emb
            FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
            WHERE a.vec_id <> p.q_id
        ),
        ivf_top AS (
            SELECT q_id, nprobe, vec_id FROM (
                SELECT c.q_id, c.nprobe, c.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.q_id, c.nprobe
                           ORDER BY round(list_cosine_similarity(c.emb, q.q_emb), 6) DESC,
                                    c.vec_id
                       ) AS rn
                FROM cand c JOIN queries q ON c.q_id = q.q_id
            ) WHERE rn <= {IVF_K}
        ),
        grid AS (SELECT DISTINCT q_id, nprobe FROM probes),
        counts AS (
            SELECT t.q_id, t.nprobe, COUNT(*) AS n_hits
            FROM ivf_top t JOIN exact e ON t.q_id = e.q_id AND t.vec_id = e.vec_id
            GROUP BY t.q_id, t.nprobe
        )
        SELECT g.q_id, g.nprobe, COALESCE(c.n_hits, 0) AS n_hits,
               CAST(COALESCE(c.n_hits, 0) AS DOUBLE) / {IVF_K} AS recall
        FROM grid g LEFT JOIN counts c ON g.q_id = c.q_id AND g.nprobe = c.nprobe
    """,
    tags=("ext-sim", "contract"),
)
def ann_recall_lloyd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the SECOND Lloyd step worth a second trainer pass? — the
    question the 1-step serving recipe leaves open, answered the same way
    the first step's value was (ann_recall_honest vs ann_recall_lloyd):
    identical evaluation policy (sample seed, auto-k, seed-disjoint
    queries, nprobe 1..4), the ONLY change being kmeans_train(n_iters=2).
    Reading lloyd vs lloyd2 row-for-row in one artifact prices the
    marginal step. MEASURED at sf0.01 (mean recall@5, nprobe 1..4):
    1 step 0.20/0.525/0.775/0.875 → 2 steps 0.175/0.475/0.775/0.85 —
    the second pass buys NOTHING (slightly worse at narrow probes: the
    means drift toward cluster interiors and the boundary queries this
    battery stresses lose their cells). The serving recipe's single step
    is therefore a measured stopping rule, not a guess. Each extra step
    costs one broadcast assignment pass plus a |centroids|×dim mean
    aggregate at build time (kmeans_iterate's cost shape) and nothing at
    serve time."""
    vecs = _vectors(spark, sf_dir)
    k = auto_centroids(vecs.count())
    seeds = (
        vecs.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(k)
        .select("vec_id")
    )
    centroids = kmeans_train(vecs, k=k, n_iters=2, init="sample")
    queries = F.broadcast(
        vecs.join(seeds, "vec_id", "left_anti")
        .orderBy("vec_id")
        .limit(ANN_RECALL_NQ)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    )
    return _recall_frame(vecs, queries, _ranked_against(vecs, centroids), ANN_HONEST_NPROBES)


#: Two-level IVF: fine centroids per coarse cell. The one-level design's
#: ceiling is the centroid BROADCAST (IVF_MAX_K ≈ 65k — see the auto-k
#: block): past it, a query ranking against every fine centroid stops
#: scaling. The coarse quantizer cuts the query's centroid scan from k to
#: k_c + nprobe_c · (k / k_c) comparisons (√k-balanced at
#: k_c ≈ √k; the fixed per-cell bucket keeps k_c ∝ k here, matching the
#: corpus-∝ auto-k), and gives the index a two-level partition layout
#: (coarse=…/fine=…) so a probe prunes whole coarse directories first.
IVF2_COARSE_BUCKET = 64
IVF2_MIN_KC, IVF2_MAX_KC = 2, 1024
IVF2_NPROBE_C = 2
IVF2_NPROBE_F = 2

def _kc_sql(src: str = "vecs") -> str:
    """The coarse count in the oracles' dialect (nested over the src's
    auto-k so both engines derive it from the identical table — the
    incremental key derives it from ``base``)."""
    return (
        f"(SELECT LEAST({IVF2_MAX_KC}, GREATEST({IVF2_MIN_KC}, "
        f"{_auto_k_sql(src)} // {IVF2_COARSE_BUCKET})))"
    )


#: The common whole-corpus form.
KC_SQL = _kc_sql()


def coarse_centroid_count(k: int) -> int:
    """Coarse-cell count for k fine centroids (see constants above)."""
    return min(IVF2_MAX_KC, max(IVF2_MIN_KC, k // IVF2_COARSE_BUCKET))


def ivf2_centroids(vecs: DataFrame, k: int, kc: int) -> tuple[DataFrame, DataFrame]:
    """(fine, coarse) for the two-level index, BOTH Lloyd-trained (r8):
    fine = lloyd_centroids over the corpus; coarse = lloyd_centroids over
    the fine centroid TABLE (centroids re-labeled as vectors — the coarse
    quantizer summarizes the fine one, which is the quantity it prunes).
    Returns (centroid_id, c_emb) and (coarse_id, g_emb) frames; the
    oracles replay both trainings as two spliced _lloyd_chain_sql chains."""
    fine = lloyd_centroids(vecs, k)
    fine_as_vecs = fine.select(
        F.col("centroid_id").alias("vec_id"), F.col("c_emb").alias("embedding")
    )
    coarse = lloyd_centroids(fine_as_vecs, kc).select(
        F.col("centroid_id").alias("coarse_id"), F.col("c_emb").alias("g_emb")
    )
    return fine, coarse


def _ivf2_chain_sql(src: str = "vecs", prefix: str = "") -> str:
    """The coarse trainer's source CTE + chain, spliced by every ivf2
    oracle AFTER a _lloyd_chain_sql over ``src`` (fine = its c1): fine
    re-labeled as vectors, then the SAME trainer at the src-derived kc.
    ``prefix`` namespaces the whole chain (fine/cfv/coarse and the inner
    g-chain) where one query needs TWO two-level trainings — the nested
    global-retrain oracle replays the base-trained chain AND the
    retrained-on-everything chain side by side. The default produces
    byte-identical SQL to the historical un-prefixed form."""
    p = prefix
    return f"""
        {p}fine AS (SELECT centroid_id, c_emb FROM {p}c1),
        {p}cfv AS (SELECT centroid_id AS vec_id, c_emb AS emb FROM {p}c1),
        {_lloyd_chain_sql(k_sql=_kc_sql(src), prefix=f"{p}g", src=f"{p}cfv")},
        {p}coarse AS (SELECT centroid_id AS coarse_id, c_emb AS g_emb FROM {p}gc1)"""


#: The common whole-corpus form.
_IVF2_CHAIN_SQL = _ivf2_chain_sql()


#: The full two-level cascade replay — shared by ann_ivf2_topk (in-query)
#: and ann_ivf2_index_serve (materialized layout), the same oracle-reuse
#: pattern as _ivf_oracle for ivf_index_probe: identical results from
#: either physical shape is exactly what the second registration proves.
_IVF2_ORACLE = f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        {_lloyd_chain_sql()},
        {_IVF2_CHAIN_SQL},
        f2c AS (
            SELECT centroid_id, coarse_id FROM (
                SELECT f.centroid_id, g.coarse_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY f.centroid_id
                           ORDER BY round(list_cosine_similarity(f.c_emb, g.g_emb), 9) DESC,
                                    g.coarse_id
                       ) AS rn
                FROM fine f CROSS JOIN coarse g
            ) WHERE rn = 1
        ),
        q AS (SELECT emb AS q_emb FROM vecs WHERE vec_id = 0),
        probes_c AS (
            SELECT coarse_id FROM coarse g CROSS JOIN q
            ORDER BY round(list_cosine_similarity(g.g_emb, q.q_emb), 9) DESC, coarse_id
            LIMIT {IVF2_NPROBE_C}
        ),
        probes_f AS (
            SELECT f.centroid_id
            FROM fine f JOIN f2c USING (centroid_id)
            JOIN probes_c USING (coarse_id) CROSS JOIN q
            ORDER BY round(list_cosine_similarity(f.c_emb, q.q_emb), 9) DESC, f.centroid_id
            LIMIT {IVF2_NPROBE_F}
        ),
        ranked AS (
            SELECT v.vec_id, v.emb, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN fine c
        ),
        assigned AS (SELECT vec_id, emb, centroid_id FROM ranked WHERE rn = 1)
        SELECT a.vec_id AS vec_id,
               round(list_cosine_similarity(a.emb, q.q_emb), 6) AS sim
        FROM assigned a JOIN probes_f p ON a.centroid_id = p.centroid_id CROSS JOIN q
        WHERE a.vec_id <> 0
        ORDER BY sim DESC, a.vec_id
        LIMIT {IVF_K}
    """


@register("ann_ivf2_topk", oracle=_IVF2_ORACLE, tags=("ext-sim",))
def ann_ivf2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level IVF serving — the documented design past the one-level
    broadcast ceiling (see the auto-k block: at k > IVF_MAX_K the answer
    is 'coarse centroids over centroid groups, not a bigger broadcast'),
    now a driver-checked key instead of a docstring promise. The probe
    cascade: rank the query against k_c COARSE cells (tiny), open the
    top IVF2_NPROBE_C cells, rank only THEIR fine centroids (≈nprobe_c ·
    k/k_c instead of all k), open the top IVF2_NPROBE_F fine buckets,
    exact top-k inside. Every stage deterministic (the Lloyd trainer at
    BOTH levels since r8 — fine over the corpus, coarse over the fine
    centroid table; round-9 argmax, id tie-breaks), so DuckDB replays the
    whole cascade, both trainings included, and the driver hash-checks it.

    The in-query build keeps the one-pass broadcast assignment to fine
    centroids (the thing being demonstrated is the QUERY cascade and the
    two-level layout); a materialized variant writes
    partitionBy(coarse_id, centroid_id) so a probe prunes whole coarse
    directories before fine ones — at 100 TB with k = 65k fine cells in
    1024 coarse groups, a query ranks 1024 + 2·64 centroids instead of
    65k, and the scan still reads only nprobe fine directories."""
    vecs = _vectors(spark, sf_dir)
    k = auto_centroids(vecs.count())
    kc = coarse_centroid_count(k)
    fine, coarse = ivf2_centroids(vecs, k, kc)
    wf = Window.partitionBy("centroid_id").orderBy(F.col("cs").desc(), F.col("coarse_id"))
    f2c = (
        fine.crossJoin(F.broadcast(coarse))
        .select(
            "centroid_id",
            "c_emb",
            "coarse_id",
            F.round(cosine(F.col("c_emb"), F.col("g_emb")), 9).alias("cs"),
        )
        .withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") == 1)
        .select("centroid_id", "c_emb", "coarse_id")
    )
    q = F.broadcast(vecs.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb")))
    probes_c = F.broadcast(
        coarse.crossJoin(q)
        .select("coarse_id", F.round(cosine(F.col("g_emb"), F.col("q_emb")), 9).alias("s"))
        .orderBy(F.col("s").desc(), "coarse_id")
        .limit(IVF2_NPROBE_C)
        .select("coarse_id")
    )
    probes_f = F.broadcast(
        f2c.join(probes_c, "coarse_id")
        .crossJoin(q)
        .select("centroid_id", F.round(cosine(F.col("c_emb"), F.col("q_emb")), 9).alias("s"))
        .orderBy(F.col("s").desc(), "centroid_id")
        .limit(IVF2_NPROBE_F)
        .select("centroid_id")
    )
    assigned = (
        _ranked_against(vecs, fine)
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "centroid_id")
    )
    sim = F.round(cosine(F.col("embedding"), F.col("q_emb")), 6)
    return (
        assigned.join(probes_f, "centroid_id")
        .crossJoin(q)
        .filter(F.col("vec_id") != 0)
        .select("vec_id", sim.alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(IVF_K)
    )


def _ivf2_index_path(sf_dir: str, k: int, kc: int) -> str:
    import os

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    warehouse = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "spark-warehouse"
    )
    # recipe-tagged (the _ivf_index_path identity rule): both level sizes
    # AND the trainer are part of the layout; either changing must produce
    # a new index (lloyd1 minted by the r8 trainer flip)
    return os.path.join(warehouse, f"ivf2_{tag}", f"index_lloyd1_c{k}_g{kc}")


def ivf2_build_index(
    spark: SparkSession, sf_dir: str, path: str, k: int, kc: int
) -> None:
    """Materialize the two-level index:

    - ``fine/``: the Lloyd-trained fine centroids WITH their coarse cell
      (centroid_id, c_emb, coarse_id) — stored so serving ranks the query
      against centroid-count tables instead of retraining (the one-level
      centroids/ pattern, plus the f2c mapping folded in);
    - ``coarse/``: the Lloyd-trained coarse quantizer (trained on the fine
      table — see ivf2_centroids);
    - ``vectors/``: every vector with its fine cell AND its fine cell's
      coarse cell, written partitionBy(coarse_id, centroid_id) — the
      nested directory layout where a probe prunes whole coarse trees
      before fine ones.

    Levels write FIRST so an interrupted build can't leave vectors/ with
    no quantizer tables (the codebook-first rationale)."""
    ivf2_build_index_frame(_vectors(spark, sf_dir), path, k, kc)


def ivf2_build_index_frame(
    vecs: DataFrame, path: str, k: int, kc: int, schema_memo: dict | None = None
) -> None:
    """ivf2_build_index over an explicit (vec_id, embedding) frame — the
    incremental-add key builds from its ``base`` slice through this.
    ``schema_memo`` (see _memo_read) lets a caller that will keep folding
    into this index reuse the read-backs' inferred schemas."""
    import os

    spark = vecs.sparkSession
    fine, coarse = ivf2_centroids(vecs, k, kc)
    coarse.write.mode("overwrite").parquet(os.path.join(path, "coarse"))
    coarse_r = _memo_read(spark, os.path.join(path, "coarse"), schema_memo)
    wf = Window.partitionBy("centroid_id").orderBy(F.col("cs").desc(), F.col("coarse_id"))
    f2c = (
        fine.crossJoin(F.broadcast(coarse_r))
        .select(
            "centroid_id",
            "c_emb",
            "coarse_id",
            F.round(cosine(F.col("c_emb"), F.col("g_emb")), 9).alias("cs"),
        )
        .withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") == 1)
        .select("centroid_id", "c_emb", "coarse_id")
    )
    f2c.write.mode("overwrite").parquet(os.path.join(path, "fine"))
    fine_r = _memo_read(spark, os.path.join(path, "fine"), schema_memo)
    assigned = (
        _ranked_against(vecs, fine_r.select("centroid_id", "c_emb"))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "centroid_id")
    )
    (
        assigned.join(
            F.broadcast(fine_r.select("centroid_id", "coarse_id")), "centroid_id"
        )
        .write.partitionBy("coarse_id", "centroid_id")
        .mode("overwrite")
        .parquet(os.path.join(path, "vectors"))
    )


def ivf2_index_incremental_add(
    spark: SparkSession, path: str, batch: DataFrame, skip_existing: bool = False,
    schema_memo: dict | None = None,
) -> list[int]:
    """Fold an embedding batch into a materialized TWO-LEVEL index: assign
    the batch against the STORED fine centroids (the stored fine/ table
    already carries each fine cell's coarse_id, so the nested partition
    key comes for free — no coarse-level work at all), append to the
    touched (coarse_id, centroid_id) directories. Same frozen-artifact /
    byte-identical-untouched-partitions / replay-idempotency contract as
    the one-level and IVFPQ adds. Returns touched fine centroid ids."""
    import os

    fine_r = _memo_read(spark, os.path.join(path, "fine"), schema_memo)
    # one assignment job feeds every use below (_collect_touched)
    assigned, touched = _collect_touched(
        _ranked_against(batch, fine_r.select("centroid_id", "c_emb"))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "centroid_id")
        .join(F.broadcast(fine_r.select("centroid_id", "coarse_id")), "centroid_id"),
        "centroid_id",
    )
    if skip_existing and touched:
        existing = (
            _memo_read(spark, os.path.join(path, "vectors"), schema_memo)
            .filter(F.col("centroid_id").isin(touched))
            .select("vec_id")
        )
        out = assigned.join(existing, "vec_id", "left_anti")
    else:
        out = assigned
    out.write.mode("append").partitionBy("coarse_id", "centroid_id").parquet(
        os.path.join(path, "vectors")
    )
    return touched


def _ivf2_incr_index_path(sf_dir: str, k: int, kc: int) -> str:
    import os

    return os.path.join(
        os.path.dirname(_ivf2_index_path(sf_dir, k, kc)), f"incr_lloyd1_c{k}_g{kc}"
    )


@register(
    "ann_ivf2_incremental_add",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        base AS (
            SELECT vec_id, emb FROM vecs WHERE vec_id % {INCR_BATCH_MOD} <> {INCR_BATCH_MOD - 1}
        ),
        {_lloyd_chain_sql(src="base")},
        {_ivf2_chain_sql(src="base")},
        f2c AS (
            SELECT centroid_id, coarse_id FROM (
                SELECT f.centroid_id, g.coarse_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY f.centroid_id
                           ORDER BY round(list_cosine_similarity(f.c_emb, g.g_emb), 9) DESC,
                                    g.coarse_id
                       ) AS rn
                FROM fine f CROSS JOIN coarse g
            ) WHERE rn = 1
        ),
        ranked AS (
            SELECT v.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN fine c
        ),
        assigned AS (SELECT vec_id, centroid_id FROM ranked WHERE rn = 1)
        SELECT a.vec_id, a.centroid_id, f.coarse_id
        FROM assigned a JOIN f2c f ON a.centroid_id = f.centroid_id
    """,
    tags=("ext-sim", "opt-partition-pruning"),
)
def ann_ivf2_incremental_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance for the TWO-LEVEL index, driver-checked:
    build the nested layout from the base slice (both quantizer levels
    Lloyd-trained there and stored), fold the arriving ~12.5% in via
    ivf2_index_incremental_add — the stored fine/ table carries each fine
    cell's coarse_id, so the add is ONE broadcast assignment against the
    fine centroids plus a partition-scoped append into the nested
    directories; the coarse level does zero work per batch. Returns the
    full post-add index as (vec_id, centroid_id, coarse_id); the oracle
    replays both base trainings and states rebuild equivalence with
    frozen artifacts, exactly like the one-level and IVFPQ twins.

    This closes the maintenance matrix: every materialized vector layout
    the engine serves (flat IVF, IVFPQ, two-level IVF) now has a
    batch-shaped add, so rebuild-on-stale is a quality policy everywhere
    (ann_index_drift_report's call), never a correctness requirement."""
    import os

    from ..io import materialization_is_fresh

    vecs = _vectors(spark, sf_dir)
    is_batch = F.pmod(F.col("vec_id"), F.lit(INCR_BATCH_MOD)) == INCR_BATCH_MOD - 1
    base = vecs.filter(~is_batch)
    batch = vecs.filter(is_batch)
    n_base = base.count()
    if n_base == 0:
        return spark.createDataFrame(
            [], "vec_id bigint, centroid_id bigint, coarse_id bigint"
        )
    k = auto_centroids(n_base)
    kc = coarse_centroid_count(k)
    path = _ivf2_incr_index_path(sf_dir, k, kc)
    marker = os.path.join(path, "_INCR_SUCCESS")
    src = os.path.join(sf_dir, "embeddings.parquet")
    fresh = all(
        materialization_is_fresh(os.path.join(path, d), src)
        for d in ("vectors", "fine", "coarse")
    ) and _incr_marker_fresh(marker, sf_dir)
    if not fresh:
        ivf2_build_index_frame(base, path, k, kc)
        ivf2_index_incremental_add(spark, path, batch)
        open(marker, "w").close()
    idx = _layout_read(spark, os.path.join(path, "vectors"), "vectors_ivf2")
    return idx.select(
        "vec_id",
        F.col("centroid_id").cast("bigint").alias("centroid_id"),
        F.col("coarse_id").cast("bigint").alias("coarse_id"),
    )


@register(
    "ann_ivf2_index_compact",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        base AS (
            SELECT vec_id, emb FROM vecs WHERE vec_id % {INCR_BATCH_MOD} <> {INCR_BATCH_MOD - 1}
        ),
        {_lloyd_chain_sql(src="base")},
        {_ivf2_chain_sql(src="base")},
        f2c AS (
            SELECT centroid_id, coarse_id FROM (
                SELECT f.centroid_id, g.coarse_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY f.centroid_id
                           ORDER BY round(list_cosine_similarity(f.c_emb, g.g_emb), 9) DESC,
                                    g.coarse_id
                       ) AS rn
                FROM fine f CROSS JOIN coarse g
            ) WHERE rn = 1
        ),
        ranked AS (
            SELECT v.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN fine c
        ),
        assigned AS (SELECT vec_id, centroid_id FROM ranked WHERE rn = 1)
        SELECT a.vec_id, a.centroid_id, f.coarse_id
        FROM assigned a JOIN f2c f ON a.centroid_id = f.centroid_id
    """,
    tags=("ext-sim", "opt-partition-pruning"),
)
def ann_ivf2_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction over the NESTED two-level layout — closes the lifecycle
    matrix the way the delete matrix closed: every served partitioned
    layout (flat IVF via ann_index_compact, two-level here, split via
    pytest) now has build → add → delete → COMPACT. Fixture: build from
    the base slice, fragment with TWO incremental adds (the batch split
    mod 16, each touched (coarse_id, centroid_id) leaf gaining two
    append files), compact over the two-column partition keys — the
    generic compact_partitions walks the nested directories, rewrites
    only over-filed leaves, leaves healthy ones byte-identical
    (tests/test_compaction.py pins the two-column mechanics on the split
    layout). Oracle = the ivf2 rebuild-equivalence chain: compaction
    must change file boundaries and nothing else."""
    import os

    from ..io import materialization_is_fresh

    vecs = _vectors(spark, sf_dir)
    is_batch = F.pmod(F.col("vec_id"), F.lit(INCR_BATCH_MOD)) == INCR_BATCH_MOD - 1
    base = vecs.filter(~is_batch)
    n_base = base.count()
    if n_base == 0:
        return spark.createDataFrame(
            [], "vec_id bigint, centroid_id bigint, coarse_id bigint"
        )
    k = auto_centroids(n_base)
    kc = coarse_centroid_count(k)
    path = os.path.join(
        os.path.dirname(_ivf2_index_path(sf_dir, k, kc)),
        f"compact_lloyd1_c{k}_g{kc}",
    )
    marker = os.path.join(path, "_COMPACT_SUCCESS")
    src = os.path.join(sf_dir, "embeddings.parquet")
    fresh = all(
        materialization_is_fresh(os.path.join(path, d), src)
        for d in ("vectors", "fine", "coarse")
    ) and _incr_marker_fresh(marker, sf_dir)
    if not fresh:
        from ..operators.compaction import compact_partitions

        ivf2_build_index_frame(base, path, k, kc)
        half = F.pmod(F.col("vec_id"), F.lit(2 * INCR_BATCH_MOD))
        batch = vecs.filter(is_batch)
        ivf2_index_incremental_add(
            spark, path, batch.filter(half == INCR_BATCH_MOD - 1)
        )
        ivf2_index_incremental_add(
            spark, path, batch.filter(half == 2 * INCR_BATCH_MOD - 1)
        )
        compact_partitions(
            spark,
            os.path.join(path, "vectors"),
            ("coarse_id", "centroid_id"),
        )
        open(marker, "w").close()
    idx = _layout_read(spark, os.path.join(path, "vectors"), "vectors_ivf2")
    return idx.select(
        "vec_id",
        F.col("centroid_id").cast("bigint").alias("centroid_id"),
        F.col("coarse_id").cast("bigint").alias("coarse_id"),
    )


def _ivf2_del_index_path(sf_dir: str, k: int, kc: int) -> str:
    import os

    return os.path.join(
        os.path.dirname(_ivf2_index_path(sf_dir, k, kc)), f"del_lloyd1_c{k}_g{kc}"
    )


@register(
    "ann_ivf2_index_delete",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        {_lloyd_chain_sql(src="vecs")},
        {_ivf2_chain_sql(src="vecs")},
        f2c AS (
            SELECT centroid_id, coarse_id FROM (
                SELECT f.centroid_id, g.coarse_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY f.centroid_id
                           ORDER BY round(list_cosine_similarity(f.c_emb, g.g_emb), 9) DESC,
                                    g.coarse_id
                       ) AS rn
                FROM fine f CROSS JOIN coarse g
            ) WHERE rn = 1
        ),
        ranked AS (
            SELECT v.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN fine c
        ),
        assigned AS (SELECT vec_id, centroid_id FROM ranked WHERE rn = 1)
        SELECT a.vec_id, a.centroid_id, f.coarse_id
        FROM assigned a JOIN f2c f ON a.centroid_id = f.centroid_id
        WHERE a.vec_id % {DEL_MOD} <> {DEL_REM}
    """,
    tags=("ext-sim", "opt-partition-pruning"),
)
def ann_ivf2_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Takedown on the TWO-LEVEL index — completing the deletion matrix
    the way ann_ivf2_incremental_add completed the add matrix: every
    materialized vector layout the engine serves (flat IVF, IVFPQ,
    two-level IVF) now has an id-keyed delete, so takedown is a
    changeset-cost operation everywhere, never a rebuild. The nested
    layout exercises the delete's multi-column path: victims located
    under (coarse_id, centroid_id) keys, only those nested directories
    rewritten, fully-emptied leaves swept WITH their emptied parent
    trees. Both quantizer levels stay frozen; the oracle is the full
    two-level train/assign chain minus the deleted ids."""
    import os

    from ..io import materialization_is_fresh

    vecs = _vectors(spark, sf_dir)
    n = vecs.count()
    if n == 0:
        return spark.createDataFrame(
            [], "vec_id bigint, centroid_id bigint, coarse_id bigint"
        )
    k = auto_centroids(n)
    kc = coarse_centroid_count(k)
    path = _ivf2_del_index_path(sf_dir, k, kc)
    marker = os.path.join(path, "_DEL_SUCCESS")
    src = os.path.join(sf_dir, "embeddings.parquet")
    fresh = all(
        materialization_is_fresh(os.path.join(path, d), src)
        for d in ("vectors", "fine", "coarse")
    ) and _incr_marker_fresh(marker, sf_dir)
    if not fresh:
        ivf2_build_index_frame(vecs, path, k, kc)
        ivf_index_delete(
            spark,
            path,
            vecs.filter(
                F.pmod(F.col("vec_id"), F.lit(DEL_MOD)) == DEL_REM
            ).select("vec_id"),
            partition_cols=("coarse_id", "centroid_id"),
        )
        open(marker, "w").close()
    idx = _layout_read(spark, os.path.join(path, "vectors"), "vectors_ivf2")
    return idx.select(
        "vec_id",
        F.col("centroid_id").cast("bigint").alias("centroid_id"),
        F.col("coarse_id").cast("bigint").alias("coarse_id"),
    )


@register(
    "ann_ivf2_index_delete_lookup",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        {_lloyd_chain_sql(src="vecs")},
        {_ivf2_chain_sql(src="vecs")},
        f2c AS (
            SELECT centroid_id, coarse_id FROM (
                SELECT f.centroid_id, g.coarse_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY f.centroid_id
                           ORDER BY round(list_cosine_similarity(f.c_emb, g.g_emb), 9) DESC,
                                    g.coarse_id
                       ) AS rn
                FROM fine f CROSS JOIN coarse g
            ) WHERE rn = 1
        ),
        ranked AS (
            SELECT v.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN fine c
        ),
        assigned AS (SELECT vec_id, centroid_id FROM ranked WHERE rn = 1)
        SELECT a.vec_id, a.centroid_id, f.coarse_id
        FROM assigned a JOIN f2c f ON a.centroid_id = f.centroid_id
        WHERE a.vec_id % {DEL_MOD} <> {DEL_REM}
    """,
    tags=("ext-sim", "opt-partition-pruning"),
)
def ann_ivf2_index_delete_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-index-read takedown on the TWO-LEVEL layout — the nested twin
    of ann_index_delete_lookup, closing the gap that the lookup-driven
    locate previously served only the flat layout (the nested layouts are
    the ones actually served at scale). The lookup rows carry the
    layout's FULL partition key (coarse_id, centroid_id), so LOCATE is a
    bucket-pruned point read that yields complete nested victim keys;
    ivf_index_delete consumes them via ``touched=`` and never scans the
    index; the refresh rebuilds only the deleted ids' hash buckets.

    The returned frame is the post-delete LOOKUP read back from disk —
    hashing it against the two-level assignment-minus-deleted oracle
    proves the derived table stayed exactly consistent with the nested
    index through locate → delete → refresh (a lookup missing coarse_id,
    or a stale/over-swept bucket, hash-mismatches here)."""
    import os

    from ..io import materialization_is_fresh
    from ..operators.ann_lookup import build_lookup, locate, refresh_lookup_buckets

    cols = ("coarse_id", "centroid_id")
    vecs = _vectors(spark, sf_dir)
    n = vecs.count()
    if n == 0:
        return spark.createDataFrame(
            [], "vec_id bigint, centroid_id bigint, coarse_id bigint"
        )
    k = auto_centroids(n)
    kc = coarse_centroid_count(k)
    path = os.path.join(
        os.path.dirname(_ivf2_index_path(sf_dir, k, kc)), f"dellk_lloyd1_c{k}_g{kc}"
    )
    marker = os.path.join(path, "_DELLK_SUCCESS")
    src = os.path.join(sf_dir, "embeddings.parquet")
    fresh = all(
        materialization_is_fresh(os.path.join(path, d), src)
        for d in ("vectors", "fine", "coarse")
    ) and _incr_marker_fresh(marker, sf_dir)
    if not fresh:
        ivf2_build_index_frame(vecs, path, k, kc)
        build_lookup(spark, path, partition_cols=cols)
        dels = vecs.filter(
            F.pmod(F.col("vec_id"), F.lit(DEL_MOD)) == DEL_REM
        ).select("vec_id")
        touched = sorted(
            (r["coarse_id"], r["centroid_id"])
            for r in locate(spark, path, dels, partition_cols=cols)
            .select(*cols)
            .distinct()
            .collect()
        )
        ivf_index_delete(
            spark, path, dels, partition_cols=cols, touched=touched
        )
        refresh_lookup_buckets(spark, path, dels, partition_cols=cols)
        open(marker, "w").close()
    lk = _layout_read(spark, os.path.join(path, "lookup"), "lookup_ivf2")
    return lk.select(
        "vec_id",
        F.col("centroid_id").cast("bigint").alias("centroid_id"),
        F.col("coarse_id").cast("bigint").alias("coarse_id"),
    )


def ivf2_global_retrain(
    spark: SparkSession, index_path: str, decision: DataFrame
) -> bool:
    """The TWO-LEVEL twin of ivf_global_retrain: when the whole-index
    verdict fires, BOTH quantizer levels retrain on the index's current
    content (fine = the deterministic Lloyd trainer over the corpus,
    coarse = the same trainer over the new fine table — exactly the
    build's recipe, so the oracle can replay it), staged rebuild, atomic
    rename swap, and the id→partition lookup rebuilt with the nested key
    if one is maintained. Same swap sequence and crash-state contract as
    the flat consumer (every intermediate is a recoverable directory);
    same single-writer expectation (run under the maintenance lease when
    any other loop may be live). Returns True iff the retrain ran."""
    import os

    from ..operators import fsutil
    from ..operators.ann_lookup import build_lookup

    staging, retired = f"{index_path}__rebuild", f"{index_path}__retired"
    # same crash-state contract as the flat consumer: complete an
    # interrupted swap before sweeping, or the sweep deletes the only
    # surviving complete copies
    fsutil.recover_swap(spark, index_path, staging, retired)
    row = decision.select("index_retrain").first()
    if row is None or not row["index_retrain"]:
        return False
    fsutil.delete_dir(spark, staging, if_exists=True)
    fsutil.delete_dir(spark, retired, if_exists=True)
    cur = (
        _layout_read(spark, os.path.join(index_path, "vectors"), "vectors_ivf2")
        .select("vec_id", "embedding")
        .localCheckpoint(eager=True)
    )
    k = auto_centroids(cur.count())
    ivf2_build_index_frame(cur, staging, k, coarse_centroid_count(k))
    if fsutil.exists(spark, os.path.join(index_path, "lookup")):
        build_lookup(spark, staging, partition_cols=("coarse_id", "centroid_id"))
    fsutil.rename(spark, index_path, retired)
    fsutil.rename(spark, staging, index_path)
    fsutil.delete_dir(spark, retired)
    return True


@register(
    "ann_ivf2_global_retrain",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        base AS (
            SELECT vec_id, emb FROM vecs WHERE vec_id % {INCR_BATCH_MOD} <> {INCR_BATCH_MOD - 1}
        ),
        {_lloyd_chain_sql(src="base")},
        {_ivf2_chain_sql(src="base")},
        f2c AS (
            SELECT centroid_id, coarse_id FROM (
                SELECT f.centroid_id, g.coarse_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY f.centroid_id
                           ORDER BY round(list_cosine_similarity(f.c_emb, g.g_emb), 9) DESC,
                                    g.coarse_id
                       ) AS rn
                FROM fine f CROSS JOIN coarse g
            ) WHERE rn = 1
        ),
        ranked AS (
            SELECT v.vec_id, c.centroid_id,
                   round(list_cosine_similarity(v.emb, c.c_emb), 9) AS c_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN fine c
        ),
        assigned AS (
            SELECT vec_id, centroid_id, c_sim,
                   CAST(vec_id % {INCR_BATCH_MOD} = {INCR_BATCH_MOD - 1} AS INT) AS is_add
            FROM ranked WHERE rn = 1
        ),
        rep AS (
            SELECT centroid_id,
                   COUNT(*) FILTER (WHERE is_add = 1) AS n_added,
                   CASE WHEN COUNT(*) FILTER (WHERE is_add = 0) = 0
                             OR COUNT(*) FILTER (WHERE is_add = 1) = 0 THEN NULL
                        ELSE round(
                            round(CAST(SUM(CAST(c_sim AS DECIMAL(38,9)))
                                      FILTER (WHERE is_add = 0) AS DOUBLE)
                                  / COUNT(*) FILTER (WHERE is_add = 0), 6)
                          - round(CAST(SUM(CAST(c_sim AS DECIMAL(38,9)))
                                      FILTER (WHERE is_add = 1) AS DOUBLE)
                                  / COUNT(*) FILTER (WHERE is_add = 1), 6), 6) END
                       AS sim_gap
            FROM assigned
            GROUP BY centroid_id
        ),
        verdict AS (
            SELECT round(CAST(SUM(CASE WHEN sim_gap IS NULL THEN 0
                                       ELSE CAST(round(sim_gap * 1e6) AS BIGINT) * n_added
                                  END) AS DOUBLE) / 1e6
                         / SUM(CASE WHEN sim_gap IS NULL THEN 0 ELSE n_added END),
                         6) > {RETRAIN_INDEX_GAP_T} AS g
            FROM rep
        ),
        {_lloyd_chain_sql(prefix="r", src="vecs")},
        {_ivf2_chain_sql(src="vecs", prefix="r")},
        rf2c AS (
            SELECT centroid_id, coarse_id FROM (
                SELECT f.centroid_id, g.coarse_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY f.centroid_id
                           ORDER BY round(list_cosine_similarity(f.c_emb, g.g_emb), 9) DESC,
                                    g.coarse_id
                       ) AS rn
                FROM rfine f CROSS JOIN rcoarse g
            ) WHERE rn = 1
        ),
        ranked_new AS (
            SELECT v.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN rfine c
        ),
        assigned_new AS (SELECT vec_id, centroid_id FROM ranked_new WHERE rn = 1)
        SELECT a.vec_id, a.centroid_id, f.coarse_id
        FROM assigned_new a JOIN rf2c f ON a.centroid_id = f.centroid_id
        WHERE (SELECT g FROM verdict)
        UNION ALL
        SELECT a.vec_id, a.centroid_id, f.coarse_id
        FROM assigned a JOIN f2c f ON a.centroid_id = f.centroid_id
        WHERE NOT (SELECT g FROM verdict)
    """,
    tags=("ext-sim", "pipeline"),
)
def ann_ivf2_global_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole-index retrain executed on the NESTED layout — the
    lifecycle's corpus-scale op now serves both served shapes: build the
    two-level index from the base slice, fold the add batch in against
    the frozen fine table (the shared drift fixture — and the fine level
    IS the flat chain's c1, so ann_retrain_decision's measured verdict
    prices this index's fit exactly), then hand the decision to
    ivf2_global_retrain: both quantizer levels retrained on current
    content, staged rebuild, atomic swap. The returned frame is the
    post-swap nested index; the oracle replays BOTH two-level chains
    (base-trained and retrained-on-everything) and the drift verdict, and
    selects the branch the verdict dictates — a consumer that retrained
    only one level, ignored the verdict, or published a stale build
    hash-mismatches on either the fine or the coarse key."""
    import os

    from ..io import materialization_is_fresh

    vecs = _vectors(spark, sf_dir)
    is_add = F.pmod(F.col("vec_id"), F.lit(INCR_BATCH_MOD)) == INCR_BATCH_MOD - 1
    base = vecs.filter(~is_add)
    n_base = base.count()
    if n_base == 0:
        return spark.createDataFrame(
            [], "vec_id bigint, centroid_id bigint, coarse_id bigint"
        )
    k = auto_centroids(n_base)
    kc = coarse_centroid_count(k)
    path = os.path.join(
        os.path.dirname(_ivf2_index_path(sf_dir, k, kc)), f"gretrain_lloyd1_c{k}_g{kc}"
    )
    marker = os.path.join(path, "_GR_SUCCESS")
    src = os.path.join(sf_dir, "embeddings.parquet")
    fresh = all(
        materialization_is_fresh(os.path.join(path, d), src)
        for d in ("vectors", "fine", "coarse")
    ) and _incr_marker_fresh(marker, sf_dir)
    if not fresh:
        ivf2_build_index_frame(base, path, k, kc)
        ivf2_index_incremental_add(spark, path, vecs.filter(is_add))
        ivf2_global_retrain(spark, path, ann_retrain_decision(spark, sf_dir))
        open(marker, "w").close()
    idx = _layout_read(spark, os.path.join(path, "vectors"), "vectors_ivf2")
    return idx.select(
        "vec_id",
        F.col("centroid_id").cast("bigint").alias("centroid_id"),
        F.col("coarse_id").cast("bigint").alias("coarse_id"),
    )


@register(
    "ann_ivf2_index_serve",
    oracle=_IVF2_ORACLE,
    tags=("ext-sim", "opt-partition-pruning"),
)
def ann_ivf2_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The build-once/probe-cheap half of the two-level design: the index
    from ivf2_build_index (partitionBy(coarse_id, centroid_id)), probed
    by the same deterministic cascade as ann_ivf2_topk — so the oracle is
    the SAME replay, and the driver hash proves the materialized layout
    serves identical results. The probe's isin() filters sit on BOTH
    partition columns: planning-time pruning opens only the probed fine
    directories inside the probed coarse trees
    (tests/test_similarity.py asserts the PartitionFilters). Serving is
    TRAIN-FREE: both shortlists rank the query against the STORED
    coarse/ and fine/ tables — centroid-count rows, no corpus stage."""
    import os

    from ..io import materialization_is_fresh

    vecs = _vectors(spark, sf_dir)
    k = auto_centroids(vecs.count())
    kc = coarse_centroid_count(k)
    path = _ivf2_index_path(sf_dir, k, kc)
    src = os.path.join(sf_dir, "embeddings.parquet")
    if not all(
        materialization_is_fresh(os.path.join(path, d), src)
        for d in ("vectors", "fine", "coarse")
    ):
        ivf2_build_index(spark, sf_dir, path, k, kc)
    q_row = vecs.filter(F.col("vec_id") == 0).select("embedding").head()
    if q_row is None:
        return spark.createDataFrame([], "vec_id bigint, sim double")
    coarse_r = _layout_read(spark, os.path.join(path, "coarse"), "coarse")
    fine_r = _layout_read(spark, os.path.join(path, "fine"), "fine")
    q = F.broadcast(vecs.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb")))
    # the cascade's two shortlists are control-plane scalars (≤ a few ids)
    probes_c = [
        r["coarse_id"]
        for r in coarse_r.crossJoin(q)
        .select("coarse_id", F.round(cosine(F.col("g_emb"), F.col("q_emb")), 9).alias("s"))
        .orderBy(F.col("s").desc(), "coarse_id")
        .limit(IVF2_NPROBE_C)
        .collect()
    ]
    probes_f = [
        r["centroid_id"]
        for r in fine_r.filter(F.col("coarse_id").isin(probes_c))
        .crossJoin(q)
        .select("centroid_id", F.round(cosine(F.col("c_emb"), F.col("q_emb")), 9).alias("s"))
        .orderBy(F.col("s").desc(), "centroid_id")
        .limit(IVF2_NPROBE_F)
        .collect()
    ]
    q_emb = q_row[0]
    qc = F.array(*[F.lit(float(x)) for x in q_emb])
    idx = (
        _layout_read(spark, os.path.join(path, "vectors"), "vectors_ivf2")
        .filter(F.col("coarse_id").isin(probes_c) & F.col("centroid_id").isin(probes_f))
        .filter(F.col("vec_id") != 0)
    )
    sim = F.round(cosine(F.col("embedding").cast("array<double>"), qc), 6)
    return (
        idx.select("vec_id", sim.alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(IVF_K)
    )


#: Fine-probe tiers for the two-level recall report (coarse width fixed
#: at the registered IVF2_NPROBE_C).
IVF2_RECALL_NPROBES_F = (1, 2, 3, 4)


@register(
    "ann_recall_ivf2",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        {_lloyd_chain_sql()},
        {_IVF2_CHAIN_SQL},
        f2c AS (
            SELECT centroid_id, c_emb, coarse_id FROM (
                SELECT f.centroid_id, f.c_emb, g.coarse_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY f.centroid_id
                           ORDER BY round(list_cosine_similarity(f.c_emb, g.g_emb), 9) DESC,
                                    g.coarse_id
                       ) AS rn
                FROM fine f CROSS JOIN coarse g
            ) WHERE rn = 1
        ),
        queries AS (
            SELECT vec_id AS q_id, emb AS q_emb FROM vecs WHERE vec_id < {ANN_RECALL_NQ}
        ),
        qc AS (
            SELECT q_id, coarse_id FROM (
                SELECT q.q_id, g.coarse_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.q_id
                           ORDER BY round(list_cosine_similarity(g.g_emb, q.q_emb), 9) DESC,
                                    g.coarse_id
                       ) AS rn
                FROM coarse g CROSS JOIN queries q
            ) WHERE rn <= {IVF2_NPROBE_C}
        ),
        qf AS (
            SELECT q_id, centroid_id, rn_f FROM (
                SELECT c.q_id, f.centroid_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.q_id
                           ORDER BY round(list_cosine_similarity(f.c_emb, q.q_emb), 9) DESC,
                                    f.centroid_id
                       ) AS rn_f
                FROM f2c f JOIN qc c ON f.coarse_id = c.coarse_id
                JOIN queries q ON q.q_id = c.q_id
            )
        ),
        probes AS (
            SELECT qf.q_id, np.nprobe, qf.centroid_id
            FROM qf CROSS JOIN (
                SELECT unnest([{", ".join(str(p) for p in IVF2_RECALL_NPROBES_F)}]) AS nprobe
            ) np
            WHERE qf.rn_f <= np.nprobe
        ),
        ranked AS (
            SELECT v.vec_id, v.emb, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN fine c
        ),
        assigned AS (SELECT vec_id, emb, centroid_id FROM ranked WHERE rn = 1),
        exact AS (
            SELECT q_id, vec_id FROM (
                SELECT q.q_id, v.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.q_id
                           ORDER BY round(list_cosine_similarity(v.emb, q.q_emb), 6) DESC,
                                    v.vec_id
                       ) AS rn
                FROM vecs v CROSS JOIN queries q WHERE v.vec_id <> q.q_id
            ) WHERE rn <= {IVF_K}
        ),
        cand AS (
            SELECT p.q_id, p.nprobe, a.vec_id, a.emb
            FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
            WHERE a.vec_id <> p.q_id
        ),
        ivf_top AS (
            SELECT q_id, nprobe, vec_id FROM (
                SELECT c.q_id, c.nprobe, c.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.q_id, c.nprobe
                           ORDER BY round(list_cosine_similarity(c.emb, q.q_emb), 6) DESC,
                                    c.vec_id
                       ) AS rn
                FROM cand c JOIN queries q ON c.q_id = q.q_id
            ) WHERE rn <= {IVF_K}
        ),
        grid AS (SELECT DISTINCT q_id, nprobe FROM probes),
        counts AS (
            SELECT t.q_id, t.nprobe, COUNT(*) AS n_hits
            FROM ivf_top t JOIN exact e ON t.q_id = e.q_id AND t.vec_id = e.vec_id
            GROUP BY t.q_id, t.nprobe
        )
        SELECT g.q_id, g.nprobe, COALESCE(c.n_hits, 0) AS n_hits,
               CAST(COALESCE(c.n_hits, 0) AS DOUBLE) / {IVF_K} AS recall
        FROM grid g LEFT JOIN counts c ON g.q_id = c.q_id AND g.nprobe = c.nprobe
    """,
    tags=("ext-sim", "contract"),
)
def ann_recall_ivf2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the TWO-LEVEL cascade — the coarse quantizer's accuracy
    bill, priced next to ann_recall_report in the same artifact. Same
    contract query set (vec_ids 0..NQ) and fine tier as the one-level
    report, coarse width fixed at the registered IVF2_NPROBE_C; the fine
    probe sweeps 1..4 WITHIN the probed coarse cells. Where the
    one-level report's nprobe=n opens the query's n nearest fine buckets
    globally, this curve can only open fine buckets the coarse stage
    kept — the recall gap between the two curves at equal nprobe IS the
    coarse-pruning loss, now a hash-pinned number per round (measured at
    sf0.01: equal recall at every tier — the coarse stage prunes nothing
    the fine probe would have kept at this scale, i.e. the 2-of-k_c
    coarse shortlist still contains every fine bucket the one-level
    probe opens).

    At 100 TB this is the evaluation that says whether k_c/nprobe_c are
    sized right: a widening gap means the coarse tier is starving the
    fine probe, the same way the honest curve says how to size nprobe."""
    vecs = _vectors(spark, sf_dir)
    k = auto_centroids(vecs.count())
    kc = coarse_centroid_count(k)
    fine, coarse = ivf2_centroids(vecs, k, kc)
    wf = Window.partitionBy("centroid_id").orderBy(F.col("cs").desc(), F.col("coarse_id"))
    f2c = (
        fine.crossJoin(F.broadcast(coarse))
        .select(
            "centroid_id",
            "c_emb",
            "coarse_id",
            F.round(cosine(F.col("c_emb"), F.col("g_emb")), 9).alias("cs"),
        )
        .withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") == 1)
        .select("centroid_id", "c_emb", "coarse_id")
    )
    queries = F.broadcast(
        vecs.filter(F.col("vec_id") < ANN_RECALL_NQ).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
    )
    wqc = Window.partitionBy("q_id").orderBy(F.col("s").desc(), F.col("coarse_id"))
    qc = (
        coarse.crossJoin(queries)
        .select(
            "q_id", "coarse_id", F.round(cosine(F.col("g_emb"), F.col("q_emb")), 9).alias("s")
        )
        .withColumn("rn", F.row_number().over(wqc))
        .filter(F.col("rn") <= IVF2_NPROBE_C)
        .select("q_id", "coarse_id")
    )
    wqf = Window.partitionBy("q_id").orderBy(F.col("s").desc(), F.col("centroid_id"))
    qf = (
        f2c.join(F.broadcast(qc), "coarse_id")
        .join(queries, "q_id")
        .select(
            "q_id",
            "centroid_id",
            F.round(cosine(F.col("c_emb"), F.col("q_emb")), 9).alias("s"),
        )
        .withColumn("rn_f", F.row_number().over(wqf))
    )
    # Hint at the consuming join site, not here: probes also feeds the grid
    # (left side of the final left-outer join, not buildable) — see
    # _recall_frame's twin comment.
    probes = (
        qf.withColumn(
            "nprobe", F.explode(F.array(*[F.lit(p) for p in IVF2_RECALL_NPROBES_F]))
        )
        .filter(F.col("rn_f") <= F.col("nprobe"))
        .select("q_id", "nprobe", "centroid_id")
    )
    assigned = (
        _ranked_against(vecs, fine)
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "centroid_id")
    )
    sim = F.round(cosine(F.col("embedding"), F.col("q_emb")), 6)
    scored = (
        vecs.crossJoin(queries)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", sim.alias("sim"))
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    exact = (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= IVF_K)
        .select("q_id", "vec_id")
    )
    cand = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .join(queries, "q_id")
    )
    wqn = Window.partitionBy("q_id", "nprobe").orderBy(F.col("sim").desc(), F.col("vec_id"))
    ivf_top = (
        cand.select("q_id", "nprobe", "vec_id", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(wqn))
        .filter(F.col("rn") <= IVF_K)
        .select("q_id", "nprobe", "vec_id")
    )
    counts = (
        ivf_top.join(exact, ["q_id", "vec_id"], "left_semi")
        .groupBy("q_id", "nprobe")
        .agg(F.count("*").alias("n_hits"))
    )
    grid = probes.select("q_id", "nprobe").distinct()
    return grid.join(F.broadcast(counts), ["q_id", "nprobe"], "left").select(
        "q_id",
        "nprobe",
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        (F.coalesce(F.col("n_hits"), F.lit(0)).cast("double") / IVF_K).alias("recall"),
    )


#: The two-level autoprobe ladder: (ordinal, coarse width, fine width),
#: cost-ordered — each step widens the cheaper knob first (an extra coarse
#: probe only grows the FINE-CENTROID ranking set; an extra fine probe
#: opens another whole data partition, which is the expensive move).
IVF2_AUTOPROBE_GRID = ((1, 1, 1), (2, 2, 1), (3, 2, 2), (4, 2, 4))
IVF2_AUTOPROBE_TARGET = AUTOPROBE_TARGET


def _ivf2_pairs(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(IVF2_AUTOPROBE_GRID), "ord int, nc int, nf int"
    )


def _ivf2_pair_hits(spark: SparkSession, sf_dir: str):
    """(hitsum per ladder ordinal, plus the frames the serve half reuses)
    — the two-width evaluation behind ann_ivf2_autoprobe_topk, split out
    so the bench's sweep can read the measured curve directly."""
    vecs = _vectors(spark, sf_dir)
    k = auto_centroids(vecs.count())
    kc = coarse_centroid_count(k)
    fine, coarse = ivf2_centroids(vecs, k, kc)
    wf = Window.partitionBy("centroid_id").orderBy(F.col("cs").desc(), F.col("coarse_id"))
    f2c = (
        fine.crossJoin(F.broadcast(coarse))
        .select(
            "centroid_id",
            "c_emb",
            "coarse_id",
            F.round(cosine(F.col("c_emb"), F.col("g_emb")), 9).alias("cs"),
        )
        .withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") == 1)
        .select("centroid_id", "c_emb", "coarse_id")
    )
    queries = F.broadcast(
        vecs.filter(F.col("vec_id") < ANN_RECALL_NQ).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
    )
    pairs = F.broadcast(_ivf2_pairs(spark))
    wqc = Window.partitionBy("q_id").orderBy(F.col("s").desc(), F.col("coarse_id"))
    qc = (
        coarse.crossJoin(queries)
        .select(
            "q_id", "coarse_id", F.round(cosine(F.col("g_emb"), F.col("q_emb")), 9).alias("s")
        )
        .withColumn("rn_c", F.row_number().over(wqc))
    )
    # the fine ranking is PER LADDER RUNG: which fine centroids are even
    # rankable depends on the rung's probed coarse set
    wqf = Window.partitionBy("q_id", "ord").orderBy(F.col("s").desc(), F.col("centroid_id"))
    probes = (
        qc.join(pairs, qc.rn_c <= F.col("nc"))
        .select("q_id", "ord", "nf", "coarse_id")
        .join(f2c, "coarse_id")
        .join(queries, "q_id")
        .select(
            "q_id",
            "ord",
            "nf",
            "centroid_id",
            F.round(cosine(F.col("c_emb"), F.col("q_emb")), 9).alias("s"),
        )
        .withColumn("rn_f", F.row_number().over(wqf))
        .filter(F.col("rn_f") <= F.col("nf"))
        .select("q_id", "ord", "centroid_id")
    )
    assigned = (
        _ranked_against(vecs, fine)
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "centroid_id")
    )
    sim = F.round(cosine(F.col("embedding"), F.col("q_emb")), 6)
    scored = (
        vecs.crossJoin(queries)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", sim.alias("sim"))
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    exact = (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= IVF_K)
        .select("q_id", "vec_id")
    )
    cand = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .join(queries, "q_id")
    )
    wqn = Window.partitionBy("q_id", "ord").orderBy(F.col("sim").desc(), F.col("vec_id"))
    ivf_top = (
        cand.select("q_id", "ord", "vec_id", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(wqn))
        .filter(F.col("rn") <= IVF_K)
        .select("q_id", "ord", "vec_id")
    )
    counts = (
        ivf_top.join(exact, ["q_id", "vec_id"], "left_semi")
        .groupBy("q_id", "ord")
        .agg(F.count("*").alias("n_hits"))
    )
    grid = probes.select("q_id", "ord").distinct()
    hitsum = (
        grid.join(F.broadcast(counts), ["q_id", "ord"], "left")
        .groupBy("ord")
        .agg(
            F.sum(F.coalesce(F.col("n_hits"), F.lit(0))).alias("hits"),
            F.count("*").alias("nq"),
        )
    )
    return hitsum, vecs, coarse, f2c, assigned, pairs


@register(
    "ann_ivf2_autoprobe_topk",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        {_lloyd_chain_sql()},
        {_IVF2_CHAIN_SQL},
        f2c AS (
            SELECT centroid_id, c_emb, coarse_id FROM (
                SELECT f.centroid_id, f.c_emb, g.coarse_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY f.centroid_id
                           ORDER BY round(list_cosine_similarity(f.c_emb, g.g_emb), 9) DESC,
                                    g.coarse_id
                       ) AS rn
                FROM fine f CROSS JOIN coarse g
            ) WHERE rn = 1
        ),
        pairs AS (
            SELECT * FROM (VALUES {", ".join(f"({o}, {nc}, {nf})" for o, nc, nf in IVF2_AUTOPROBE_GRID)})
                AS t(ord, nc, nf)
        ),
        queries AS (
            SELECT vec_id AS q_id, emb AS q_emb FROM vecs WHERE vec_id < {ANN_RECALL_NQ}
        ),
        qc AS (
            SELECT q.q_id, g.coarse_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.q_id
                       ORDER BY round(list_cosine_similarity(g.g_emb, q.q_emb), 9) DESC,
                                g.coarse_id
                   ) AS rn_c
            FROM coarse g CROSS JOIN queries q
        ),
        probes AS (
            SELECT q_id, ord, centroid_id FROM (
                SELECT c.q_id, p.ord, p.nf, f.centroid_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.q_id, p.ord
                           ORDER BY round(list_cosine_similarity(f.c_emb, q.q_emb), 9) DESC,
                                    f.centroid_id
                       ) AS rn_f
                FROM qc c JOIN pairs p ON c.rn_c <= p.nc
                JOIN f2c f ON f.coarse_id = c.coarse_id
                JOIN queries q ON q.q_id = c.q_id
            ) WHERE rn_f <= nf
        ),
        ranked AS (
            SELECT v.vec_id, v.emb, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN fine c
        ),
        assigned AS (SELECT vec_id, emb, centroid_id FROM ranked WHERE rn = 1),
        exact AS (
            SELECT q_id, vec_id FROM (
                SELECT q.q_id, v.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.q_id
                           ORDER BY round(list_cosine_similarity(v.emb, q.q_emb), 6) DESC,
                                    v.vec_id
                       ) AS rn
                FROM vecs v CROSS JOIN queries q WHERE v.vec_id <> q.q_id
            ) WHERE rn <= {IVF_K}
        ),
        cand AS (
            SELECT p.q_id, p.ord, a.vec_id, a.emb
            FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
            WHERE a.vec_id <> p.q_id
        ),
        ivf_top AS (
            SELECT q_id, ord, vec_id FROM (
                SELECT c.q_id, c.ord, c.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.q_id, c.ord
                           ORDER BY round(list_cosine_similarity(c.emb, q.q_emb), 6) DESC,
                                    c.vec_id
                       ) AS rn
                FROM cand c JOIN queries q ON c.q_id = q.q_id
            ) WHERE rn <= {IVF_K}
        ),
        grid AS (SELECT DISTINCT q_id, ord FROM probes),
        counts AS (
            SELECT t.q_id, t.ord, COUNT(*) AS n_hits
            FROM ivf_top t JOIN exact e ON t.q_id = e.q_id AND t.vec_id = e.vec_id
            GROUP BY t.q_id, t.ord
        ),
        hitsum AS (
            SELECT g.ord, SUM(COALESCE(c.n_hits, 0)) AS hits, COUNT(*) AS nq
            FROM grid g LEFT JOIN counts c ON g.q_id = c.q_id AND g.ord = c.ord
            GROUP BY g.ord
        ),
        chosen AS (
            SELECT CAST(COALESCE(
                MIN(CASE WHEN hits >= CEIL({IVF2_AUTOPROBE_TARGET} * nq * {IVF_K})
                         THEN ord END),
                MAX(ord)) AS INT) AS ord
            FROM hitsum
        ),
        cp AS (SELECT p.nc, p.nf FROM pairs p JOIN chosen ON p.ord = chosen.ord),
        q0 AS (SELECT emb AS q_emb FROM vecs WHERE vec_id = 0),
        pc0 AS (
            SELECT coarse_id FROM (
                SELECT g.coarse_id,
                       ROW_NUMBER() OVER (
                           ORDER BY round(list_cosine_similarity(g.g_emb, q0.q_emb), 9) DESC,
                                    g.coarse_id
                       ) AS rn
                FROM coarse g CROSS JOIN q0
            ), cp WHERE rn <= cp.nc
        ),
        pf0 AS (
            SELECT centroid_id FROM (
                SELECT f.centroid_id,
                       ROW_NUMBER() OVER (
                           ORDER BY round(list_cosine_similarity(f.c_emb, q0.q_emb), 9) DESC,
                                    f.centroid_id
                       ) AS rn
                FROM f2c f JOIN pc0 USING (coarse_id) CROSS JOIN q0
            ), cp WHERE rn <= cp.nf
        )
        SELECT a.vec_id,
               round(list_cosine_similarity(a.emb, q0.q_emb), 6) AS sim,
               cp.nc AS nprobe_c_used, cp.nf AS nprobe_f_used
        FROM assigned a JOIN pf0 ON a.centroid_id = pf0.centroid_id
        CROSS JOIN q0 CROSS JOIN cp
        WHERE a.vec_id <> 0
        ORDER BY sim DESC, a.vec_id
        LIMIT {IVF_K}
    """,
    tags=("ext-sim", "pipeline"),
)
def ann_ivf2_autoprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-aware serving for the TWO-LEVEL cascade — ann_autoprobe's
    one-knob rule lifted to the (coarse width × fine width) ladder, the
    decision that matters past the one-level broadcast ceiling (the
    ROADMAP's named follow-up). The ladder is cost-ordered (widen the
    coarse shortlist before opening another data partition: an extra
    coarse probe only grows the fine-centroid RANKING set, an extra fine
    probe reads a whole extra bucket); evaluation ranks the standard
    query battery through the cascade at every rung — the fine ranking
    recomputed per rung because which fine centroids are rankable
    depends on that rung's probed coarse set — and the engine picks the
    FIRST rung whose total hits clear ceil(target·|queries|·k), falling
    back to the deepest. Integer selection, like the one-level key: no
    float mean to drift across engines.

    The served result carries BOTH chosen widths (nprobe_c_used,
    nprobe_f_used), so the two-dimensional decision itself is
    driver-hash-checked, not just the neighbors it returns.

    Scale shape: evaluation = the recall battery's cost (per index
    build, by design — the exact side IS the brute-force baseline);
    decision = a |ladder|-row aggregate; serve = the ordinary cascade
    with planning-time pruning. Nothing new shuffles."""
    hitsum, vecs, coarse, f2c, assigned, pairs = _ivf2_pair_hits(spark, sf_dir)
    if vecs.limit(1).count() == 0:
        return spark.createDataFrame(
            [], "vec_id bigint, sim double, nprobe_c_used int, nprobe_f_used int"
        )
    need = F.ceil(F.lit(IVF2_AUTOPROBE_TARGET) * F.col("nq") * F.lit(IVF_K))
    # the decision is a 1-row control scalar (same driver-sized-metadata
    # class as the touched-partition lists): localizing it lets the serve
    # half use the stock orderBy+limit cascade ann_ivf2_topk uses instead
    # of an unpartitioned row_number window (the engine's banned
    # WindowExec-without-partition shape)
    c_ord = hitsum.agg(
        F.coalesce(
            F.min(F.when(F.col("hits") >= need, F.col("ord"))), F.max("ord")
        )
        .cast("int")
        .alias("c_ord")
    ).collect()[0]["c_ord"]
    nc, nf = {o: (a, b) for o, a, b in IVF2_AUTOPROBE_GRID}[c_ord]
    q0 = F.broadcast(
        vecs.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    )
    pc0 = F.broadcast(
        coarse.crossJoin(q0)
        .select("coarse_id", F.round(cosine(F.col("g_emb"), F.col("q_emb")), 9).alias("s"))
        .orderBy(F.col("s").desc(), "coarse_id")
        .limit(nc)
        .select("coarse_id")
    )
    pf0 = F.broadcast(
        f2c.join(pc0, "coarse_id")
        .crossJoin(q0)
        .select(
            "centroid_id", F.round(cosine(F.col("c_emb"), F.col("q_emb")), 9).alias("s")
        )
        .orderBy(F.col("s").desc(), "centroid_id")
        .limit(nf)
        .select("centroid_id")
    )
    sim = F.round(cosine(F.col("embedding"), F.col("q_emb")), 6)
    return (
        assigned.join(pf0, "centroid_id")
        .crossJoin(q0)
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            sim.alias("sim"),
            F.lit(nc).cast("int").alias("nprobe_c_used"),
            F.lit(nf).cast("int").alias("nprobe_f_used"),
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(IVF_K)
    )


# ---------------------------------------------------------------------------
# Residual product quantization — encode (vector − assigned IVF centroid)
# instead of the raw vector. Residuals concentrate near zero once the coarse
# quantizer has absorbed the between-cluster variance, so the same 16×16
# codebook budget spends its resolution on a much tighter distribution: this
# is the actual IVFADC design (Jégou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011 — the recipe FAISS's IndexIVFPQ
# implements with encode_residual=true). pq_residual_error_report prices the
# win exactly; ann_ivfpq_residual_topk serves through it with per-probed-cell
# distance tables (the one extra cost residual coding introduces: the query's
# LUT depends on the cell, so serving builds nprobe tables of PQ_M·PQ_K
# entries instead of one — still a broadcast-scalar amount of work).
# ---------------------------------------------------------------------------


def _residual_frame(
    vecs: DataFrame, cents: DataFrame, ranked: DataFrame | None = None
) -> DataFrame:
    """(vec_id, centroid_id, embedding = emb − c_emb of the assigned cell):
    round-9 argmax-cosine assignment against ``cents`` (the shared
    _ranked_against contract), then an element-wise zip_with subtraction —
    exact double arithmetic on decimal-derived centroid values, so both
    engines produce bit-identical residuals. Callers that already ran the
    assignment pass the (persisted) ``ranked`` frame so the broadcast
    cross join over the corpus runs ONCE per key, not once per consumer
    (plan-audited: the serving key's first draft paid three assignment
    passes)."""
    if ranked is None:
        ranked = _ranked_against(vecs, cents)
    assigned = (
        ranked.filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "centroid_id")
    )
    return assigned.join(F.broadcast(cents), "centroid_id").select(
        "vec_id",
        "centroid_id",
        F.zip_with("embedding", "c_emb", lambda x, y: x - y).alias("embedding"),
    )


#: The oracle's residual chain: serving-centroid assignment of the whole
#: corpus (ivc1 from a prefix="iv" Lloyd chain, exactly as _IVFPQ_ORACLE
#: assigns), then the element-wise subtraction. Spliced before
#: _pq_chain_sql(src="res", prefix="r") by both residual keys.
_RESIDUAL_CTES = f"""
        rranked AS (
            SELECT v.vec_id, v.emb, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN ivc1 c
        ),
        rassigned AS (
            SELECT vec_id, emb, centroid_id FROM rranked WHERE rn = 1
        ),
        res AS (
            SELECT a.vec_id,
                   list_transform(list_zip(a.emb, c.c_emb), p -> p[1] - p[2]) AS emb
            FROM rassigned a JOIN ivc1 c ON a.centroid_id = c.centroid_id
        )"""


def _fixedpoint_qd_sql(rel: str) -> str:
    """The per-block fixed-point qd aggregate over a codes relation — the
    pq_reconstruction_error form, shared by both variants of the residual
    report so the comparison cannot drift."""
    return f"""
            SELECT block, COUNT(*) AS n_vecs,
                   CAST(SUM(CAST(round(qd * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS total_qd,
                   (CAST(SUM(CAST(round(qd * 1e9) AS BIGINT)) AS DOUBLE) / 1e9)
                       / COUNT(*) AS mean_qd
            FROM {rel} GROUP BY block"""


@register(
    "pq_residual_error_report",
    oracle=f"""
        WITH {_PQ_CTES},
        {_lloyd_chain_sql(prefix="iv")},
        {_RESIDUAL_CTES},
        {_pq_chain_sql(src="res", prefix="r")}
        SELECT 'plain' AS variant, * FROM ({_fixedpoint_qd_sql("codes")})
        UNION ALL
        SELECT 'residual' AS variant, * FROM ({_fixedpoint_qd_sql("rcodes")})
    """,
    tags=("ext-sim", "contract"),
)
def pq_residual_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does residual coding buy reconstruction quality at the SAME code
    budget? — measured, not assumed: per sub-space, the fixed-point
    total/mean quantization distance of the shipped 16×16 codebook over
    raw vectors ('plain', the pq_encode recipe verbatim) vs over
    (vector − assigned serving centroid) residuals ('residual', the
    IVFADC recipe of Jégou et al. 2011). Residuals concentrate by
    exactly as much variance as the coarse quantizer absorbs — and the
    report prices that structure-dependence honestly: on this near-
    uniform synthetic corpus the win is a measured ~4% mean qd at
    sf0.01 (clustered real corpora are where Jégou et al.'s ~2× lower
    distortion lives; the recipe is identical). Read beside
    pq_reconstruction_error: this is the PQ deployment's
    encode_residual=true decision, priced per sub-space from the same
    deterministic replay both engines pin.

    Plan: ONE serving-centroid training (lloyd_centroids, the recipe
    every index build uses), one broadcast assignment, a row-local
    zip_with subtraction (no shuffle — residuals never leave their
    partition), then the registered PQ trainer/encoder twice and one
    map-combined aggregate to 2·PQ_M rows. At 100 TB both trainings run
    on the same sample the IVF trainer uses; the report itself is the
    scan-and-aggregate every encode pass already does."""
    vecs = _vectors(spark, sf_dir)
    k = auto_centroids(vecs.count())
    cents = lloyd_centroids(vecs, k).persist()
    cents.count()  # assignment + subtraction both read the tiny frame
    res = _residual_frame(vecs, cents).select("vec_id", "embedding")

    def _report(frame: DataFrame, variant: str) -> DataFrame:
        sub = _pq_subvectors(frame).persist()
        sub.count()  # codebook training + assignment both read it
        codes = _pq_assign(sub, _pq_codebook(sub))
        total = (
            F.sum(F.round(F.col("qd") * F.lit(1e9)).cast("bigint")).cast("double")
            / F.lit(1e9)
        )
        return codes.groupBy("block").agg(
            F.count("*").alias("n_vecs"),
            total.alias("total_qd"),
            (total / F.count("*")).alias("mean_qd"),
        ).select(F.lit(variant).alias("variant"), "block", "n_vecs", "total_qd", "mean_qd")

    return _report(vecs, "plain").unionByName(_report(res, "residual"))


@register(
    "ann_ivfpq_residual_topk",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        {_lloyd_chain_sql(prefix="iv")},
        {_RESIDUAL_CTES},
        {_pq_chain_sql(src="res", prefix="r")},
        q_probes AS (
            SELECT centroid_id FROM rranked WHERE vec_id = 0 AND rn <= {IVFPQ_NPROBE}
        ),
        qres AS (
            SELECT c.centroid_id,
                   list_transform(list_zip(v.emb, c.c_emb), p -> p[1] - p[2]) AS q_res
            FROM vecs v CROSS JOIN ivc1 c
            WHERE v.vec_id = 0
              AND c.centroid_id IN (SELECT centroid_id FROM q_probes)
        ),
        qsub AS (
            SELECT centroid_id, bl.block,
                   (q_res)[bl.block * {PQ_SUB} + 1 : bl.block * {PQ_SUB} + {PQ_SUB}] AS q_sub
            FROM qres, (SELECT unnest(range(0, {PQ_M})) AS block) bl
        ),
        dtable AS (
            SELECT q.centroid_id, rcb.block, rcb.cid,
                   round({_l2sq_sql('q.q_sub', 'rcb.c_sub')}, 9) AS d
            FROM rcb JOIN qsub q ON rcb.block = q.block
        ),
        adc AS (
            SELECT c.vec_id,
                   CAST(SUM(CAST(d.d AS DECIMAL(28,9))) AS DOUBLE) AS adc_dist
            FROM rcodes c
            JOIN rassigned a ON c.vec_id = a.vec_id
            JOIN dtable d ON a.centroid_id = d.centroid_id
                         AND c.block = d.block AND c.code = d.cid
            WHERE c.vec_id <> 0
            GROUP BY c.vec_id
        ),
        shortlist AS (
            SELECT vec_id FROM adc ORDER BY adc_dist, vec_id LIMIT {PQ_SHORTLIST}
        ),
        qv AS (SELECT emb AS q_emb FROM vecs WHERE vec_id = 0)
        SELECT v.vec_id,
               round({_l2sq_sql('v.emb', 'qv.q_emb')}, 6) AS l2_dist
        FROM vecs v JOIN shortlist s ON v.vec_id = s.vec_id CROSS JOIN qv
        ORDER BY l2_dist, v.vec_id
        LIMIT {PQ_TOPK}
    """,
    tags=("ext-sim",),
)
def ann_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC proper — the residual-coded twin of ann_ivfpq_topk: probe
    the query's IVFPQ_NPROBE serving cells, ADC over residual codes with
    a PER-CELL distance table (the query's lookup table depends on the
    probed cell because codes store v − c_cell, so serving builds nprobe
    tables of PQ_M·PQ_K entries instead of one — nprobe·256 rows here,
    broadcast either way), shortlist, exact re-rank. Output schema and
    knobs match ann_ivfpq_topk row for row, so the two serving recipes
    are directly comparable; pq_residual_error_report prices why this
    one exists (same 4 bits/block over a tighter distribution).

    Scale shape: identical artifacts to the plain IVFPQ index — the
    residual subtraction is row-local at encode time (no extra shuffle),
    codes are the same PQ_M·log₂PQ_K bits/vector partitioned by
    centroid_id, and the only per-query delta is nprobe−1 more tiny
    LUTs. A query still reads nprobe code partitions, broadcasts the
    tables, hash-aggregates ADC, and touches floats for PQ_SHORTLIST
    rows."""
    vecs = _vectors(spark, sf_dir)
    k = auto_centroids(vecs.count())
    cents = lloyd_centroids(vecs, k).persist()
    cents.count()  # assignment, subtraction, and the query LUTs read it
    # ONE assignment pass feeds everything downstream: keep the rn=1 rows
    # (every vector's cell) plus the query's full ranking (its probe
    # tiers), persist that n+k-row frame, and derive assigned / residuals
    # / probes from it — the first draft re-ran the broadcast cross join
    # per consumer (plan-audited: three passes).
    pre = (
        _ranked_against(vecs, cents)
        .filter((F.col("rn") == 1) | (F.col("vec_id") == 0))
        .persist()
    )
    pre.count()
    assigned = pre.filter(F.col("rn") == 1).select("vec_id", "centroid_id")
    res = _residual_frame(vecs, cents, ranked=pre)
    sub = _pq_subvectors(res.select("vec_id", "embedding")).persist()
    sub.count()  # codebook training + encode both read the split
    cb = _pq_codebook(sub).persist()
    cb.count()  # encode + the per-cell distance tables both read it
    codes = (
        _pq_assign(sub, cb)
        .select("vec_id", "block", "code")
        .join(assigned, "vec_id")
    )
    q_probes = pre.filter(
        (F.col("vec_id") == 0) & (F.col("rn") <= IVFPQ_NPROBE)
    ).select("centroid_id")
    q_emb = vecs.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    qres = (
        q_probes.join(F.broadcast(cents), "centroid_id")
        .crossJoin(F.broadcast(q_emb))
        .select(
            "centroid_id",
            F.zip_with("q_emb", "c_emb", lambda x, y: x - y).alias("embedding"),
        )
    )
    q_sub = _pq_subvectors(
        qres.select(F.col("centroid_id").alias("vec_id"), "embedding")
    ).select(F.col("vec_id").alias("cell_id"), "block", F.col("sub").alias("q_sub"))
    dtable = F.broadcast(
        cb.join(q_sub, "block").select(
            "cell_id",
            "block",
            "cid",
            F.round(l2sq(F.col("q_sub"), F.col("c_sub")), 9).alias("d"),
        )
    ).alias("d")
    c = codes.alias("c")
    adc = (
        c.filter(F.col("c.vec_id") != 0)
        .join(
            dtable,
            (F.col("c.centroid_id") == F.col("d.cell_id"))
            & (F.col("c.block") == F.col("d.block"))
            & (F.col("c.code") == F.col("d.cid")),
        )
        .groupBy(F.col("c.vec_id").alias("vec_id"))
        .agg(
            (
                F.sum(F.round(F.col("d.d") * F.lit(10.0**9)).cast("bigint")).cast("double")
                / F.lit(10.0**9)
            ).alias("adc_dist")
        )
    )
    shortlist = adc.orderBy("adc_dist", "vec_id").limit(PQ_SHORTLIST).select("vec_id")
    rerank = (
        vecs.join(shortlist, "vec_id", "left_semi")
        .crossJoin(F.broadcast(q_emb))
        .select(
            "vec_id", F.round(l2sq(F.col("embedding"), F.col("q_emb")), 6).alias("l2_dist")
        )
    )
    return rerank.orderBy("l2_dist", "vec_id").limit(PQ_TOPK)


#: Per-cell quota of the cluster-balanced sample — the knob a diversity
#: downsample tunes against its token target (quota · n_cells ≈ sample
#: size; auto-k keeps n_cells proportional to the corpus, so the sampled
#: fraction is roughly constant across scales).
CLUSTER_SAMPLE_PER_CELL = 8


@register(
    "cluster_balanced_sample",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        {_lloyd_chain_sql(prefix="iv")},
        sranked AS (
            SELECT v.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round(list_cosine_similarity(v.emb, c.c_emb), 9) DESC,
                                c.centroid_id
                   ) AS rn
            FROM vecs v CROSS JOIN ivc1 c
        ),
        assigned AS (SELECT vec_id, centroid_id FROM sranked WHERE rn = 1),
        cell_sizes AS (
            SELECT centroid_id, COUNT(*) AS cell_n FROM assigned GROUP BY centroid_id
        )
        SELECT a.vec_id, a.centroid_id, CAST(s.cell_n AS BIGINT) AS cell_n
        FROM (
            SELECT vec_id, centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY centroid_id
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                   ) AS srn
            FROM assigned
        ) a JOIN cell_sizes s ON a.centroid_id = s.centroid_id
        WHERE a.srn <= {CLUSTER_SAMPLE_PER_CELL}
    """,
    tags=("ext-sim", "pipeline"),
)
def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage-preserving diversity downsample (the D4/SemDeDup-family
    move, Tirumala et al. 2023): assign every embedding to its serving
    centroid, then keep a FIXED per-cell quota chosen by deterministic
    hash order — so the sample covers the embedding space uniformly
    instead of frequency-proportionally, and dense regions (near-
    duplicate clouds, boilerplate clusters) stop dominating the
    training mix. cell_n rides along so downstream mixture planning
    can see how aggressively each region was cut.

    Plan: the assignment is the shared broadcast argmax (_ranked_against
    — no shuffle of the vector table), then ONE shuffle keyed on
    centroid_id for the per-cell window AND the cell size — cell_n is a
    whole-partition COUNT window over the same partitioning, so both
    ride one Exchange and the expensive assignment runs ONCE (a
    groupBy+join would re-derive it on a second branch — plan-audited).
    Cells are auto-k bounded, so partitions stay even; md5 order makes
    the quota deterministic on both engines (the lloyd seed-ranking
    trick, reused). At 100 TB this runs off the materialized index
    layout instead: vectors/ is already partitioned by centroid_id, so
    the window is partition-local and shuffle-free."""
    vecs = _vectors(spark, sf_dir)
    k = auto_centroids(vecs.count())
    assigned = (
        _ranked_lloyd(vecs, k)
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
    )
    w = Window.partitionBy("centroid_id").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    cell = Window.partitionBy("centroid_id")
    return (
        assigned.withColumn("srn", F.row_number().over(w))
        .withColumn("cell_n", F.count("*").over(cell).cast("bigint"))
        .filter(F.col("srn") <= CLUSTER_SAMPLE_PER_CELL)
        .select("vec_id", "centroid_id", "cell_n")
    )


@register(
    "ann_recall_residual",
    oracle=f"""
        WITH {_PQ_CTES},
        {_lloyd_chain_sql(prefix="iv")},
        {_RESIDUAL_CTES},
        {_pq_chain_sql(src="res", prefix="r")},
        rq AS (
            SELECT vec_id AS q_id, emb AS q_emb FROM vecs WHERE vec_id < {ANN_RECALL_NQ}
        ),
        exact5 AS (
            SELECT q_id, vec_id FROM (
                SELECT q.q_id, v.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.q_id
                           ORDER BY round({_l2sq_sql('v.emb', 'q.q_emb')}, 6), v.vec_id
                       ) AS rn
                FROM vecs v CROSS JOIN rq q WHERE v.vec_id <> q.q_id
            ) WHERE rn <= {PQ_TOPK}
        ),
        qprobes AS (
            SELECT vec_id AS q_id, centroid_id FROM rranked
            WHERE vec_id < {ANN_RECALL_NQ} AND rn <= {IVFPQ_NPROBE}
        ),
        members AS (
            SELECT p.q_id, a.vec_id, a.centroid_id
            FROM rassigned a JOIN qprobes p ON a.centroid_id = p.centroid_id
            WHERE a.vec_id <> p.q_id
        ),
        qsubp AS (
            SELECT vec_id AS q_id, block, s AS q_sub FROM sub WHERE vec_id < {ANN_RECALL_NQ}
        ),
        dtp AS (
            SELECT q.q_id, cb.block, cb.cid,
                   round({_l2sq_sql('q.q_sub', 'cb.c_sub')}, 9) AS d
            FROM cb JOIN qsubp q ON cb.block = q.block
        ),
        adcp AS (
            SELECT m.q_id, c.vec_id,
                   CAST(SUM(CAST(d.d AS DECIMAL(28,9))) AS DOUBLE) AS adc_dist
            FROM codes c
            JOIN members m ON c.vec_id = m.vec_id
            JOIN dtp d ON d.q_id = m.q_id AND c.block = d.block AND c.code = d.cid
            GROUP BY m.q_id, c.vec_id
        ),
        slp AS (
            SELECT q_id, vec_id FROM (
                SELECT q_id, vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q_id ORDER BY adc_dist, vec_id
                       ) AS rn
                FROM adcp
            ) WHERE rn <= {PQ_SHORTLIST}
        ),
        qres AS (
            SELECT p.q_id, p.centroid_id,
                   list_transform(list_zip(q.q_emb, c.c_emb), x -> x[1] - x[2]) AS q_res
            FROM qprobes p
            JOIN rq q ON p.q_id = q.q_id
            JOIN ivc1 c ON p.centroid_id = c.centroid_id
        ),
        qsubr AS (
            SELECT q_id, centroid_id, bl.block,
                   (q_res)[bl.block * {PQ_SUB} + 1 : bl.block * {PQ_SUB} + {PQ_SUB}] AS q_sub
            FROM qres, (SELECT unnest(range(0, {PQ_M})) AS block) bl
        ),
        dtr AS (
            SELECT q.q_id, q.centroid_id, rcb.block, rcb.cid,
                   round({_l2sq_sql('q.q_sub', 'rcb.c_sub')}, 9) AS d
            FROM rcb JOIN qsubr q ON rcb.block = q.block
        ),
        adcr AS (
            SELECT m.q_id, c.vec_id,
                   CAST(SUM(CAST(d.d AS DECIMAL(28,9))) AS DOUBLE) AS adc_dist
            FROM rcodes c
            JOIN members m ON c.vec_id = m.vec_id
            JOIN dtr d ON d.q_id = m.q_id AND d.centroid_id = m.centroid_id
                      AND c.block = d.block AND c.code = d.cid
            GROUP BY m.q_id, c.vec_id
        ),
        slr AS (
            SELECT q_id, vec_id FROM (
                SELECT q_id, vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q_id ORDER BY adc_dist, vec_id
                       ) AS rn
                FROM adcr
            ) WHERE rn <= {PQ_SHORTLIST}
        ),
        hits AS (
            SELECT 'plain' AS variant, s.q_id, COUNT(*) AS n_hits
            FROM slp s JOIN exact5 e ON s.q_id = e.q_id AND s.vec_id = e.vec_id
            GROUP BY s.q_id
            UNION ALL
            SELECT 'residual' AS variant, s.q_id, COUNT(*) AS n_hits
            FROM slr s JOIN exact5 e ON s.q_id = e.q_id AND s.vec_id = e.vec_id
            GROUP BY s.q_id
        ),
        grid AS (
            SELECT q_id, variant FROM rq,
                   (SELECT unnest(['plain', 'residual']) AS variant) v
        )
        SELECT g.q_id, g.variant, COALESCE(h.n_hits, 0) AS n_hits,
               CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / {PQ_TOPK} AS recall
        FROM grid g LEFT JOIN hits h ON g.q_id = h.q_id AND g.variant = h.variant
    """,
    tags=("ext-sim", "contract"),
)
def ann_recall_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does residual coding's quantization-error win survive to RECALL? —
    the serving-metric half of the encode_residual decision
    (pq_residual_error_report prices distortion; this key prices what a
    vector-search user actually observes): recall@{PQ_TOPK} of the ADC
    shortlist route per query (first ANN_RECALL_NQ vec_ids) at the
    shared IVFPQ_NPROBE width, 'plain' codes vs 'residual' codes over
    the SAME probed cells and the SAME shortlist width. Because the
    serving tail re-ranks the shortlist exactly, recall@k equals
    |exact top-k ∩ shortlist| — so the metric needs no re-rank stage
    and isolates exactly what the code variant controls: whether the
    true neighbors survive ADC into the shortlist.

    Measured (sf0.01): IDENTICAL — 0.525 mean recall@5 for both
    variants, equal per query, and an off-line width sweep shows no
    consistent winner at tighter shortlists either (hits/40 at widths
    5/10/20: plain 11/15/16, residual 8/12/19). The complete honest
    story with pq_residual_error_report: on a corpus with this little
    cluster structure the ~4% distortion win is inside ADC noise, so
    encode_residual is a WASH here — which is precisely why it is a
    flag and not a default in production systems; its recall value
    appears on clustered corpora where the coarse quantizer absorbs
    real variance (the ~2× distortion regime of Jégou et al.), and
    this key is the regression gate that would show it.

    One plan, no per-query loop: the query batch rides the same
    broadcast pattern as ann_recall_report; both variants share one
    probed-member table; each ADC is a code-table join against a
    broadcast LUT frame (8·PQ_M·PQ_K rows plain; ·nprobe residual —
    the per-cell tables being residual coding's one serving cost).
    Fixed-point ADC sums keep both engines hash-identical; the grid
    left-join keeps recall=0 rows honest."""
    vecs = _vectors(spark, sf_dir)
    k = auto_centroids(vecs.count())
    cents = lloyd_centroids(vecs, k).persist()
    cents.count()
    # one persisted assignment pass (rn=1 rows + the query batch's probe
    # tiers) feeds assigned / probes / residuals — see the serving key.
    pre = (
        _ranked_against(vecs, cents)
        .filter((F.col("rn") == 1) | (F.col("vec_id") < ANN_RECALL_NQ))
        .persist()
    )
    pre.count()
    assigned = pre.filter(F.col("rn") == 1).select("vec_id", "centroid_id")
    queries = F.broadcast(
        vecs.filter(F.col("vec_id") < ANN_RECALL_NQ).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
    )
    exact5 = (
        vecs.crossJoin(queries)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(l2sq(F.col("embedding"), F.col("q_emb")), 6).alias("d"),
        )
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("q_id").orderBy("d", "vec_id")),
        )
        .filter(F.col("rn") <= PQ_TOPK)
        .select("q_id", "vec_id")
    )
    q_probes = F.broadcast(
        pre.filter(
            (F.col("vec_id") < ANN_RECALL_NQ) & (F.col("rn") <= IVFPQ_NPROBE)
        ).select(F.col("vec_id").alias("q_id"), "centroid_id")
    )
    members = (
        assigned.join(q_probes, "centroid_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", "centroid_id")
    )

    def _shortlist(codes: DataFrame, dtable: DataFrame, on_cell: bool) -> DataFrame:
        c, d = codes.alias("c"), F.broadcast(dtable).alias("d")
        m = members.alias("m")
        cond = (
            (F.col("d.q_id") == F.col("m.q_id"))
            & (F.col("c.block") == F.col("d.block"))
            & (F.col("c.code") == F.col("d.cid"))
        )
        if on_cell:
            cond = cond & (F.col("d.centroid_id") == F.col("m.centroid_id"))
        adc = (
            c.join(m, F.col("c.vec_id") == F.col("m.vec_id"))
            .join(d, cond)
            .groupBy(F.col("m.q_id").alias("q_id"), F.col("c.vec_id").alias("vec_id"))
            .agg(
                (
                    F.sum(F.round(F.col("d.d") * F.lit(10.0**9)).cast("bigint")).cast("double")
                    / F.lit(10.0**9)
                ).alias("adc_dist")
            )
        )
        return (
            adc.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("q_id").orderBy("adc_dist", "vec_id")
                ),
            )
            .filter(F.col("rn") <= PQ_SHORTLIST)
            .select("q_id", "vec_id")
        )

    # plain variant: one LUT per query, cell-independent
    sub_p = _pq_subvectors(vecs).persist()
    sub_p.count()
    cb_p = _pq_codebook(sub_p).persist()
    cb_p.count()
    codes_p = _pq_assign(sub_p, cb_p).select("vec_id", "block", "code")
    qsub_p = sub_p.filter(F.col("vec_id") < ANN_RECALL_NQ).select(
        F.col("vec_id").alias("q_id"), "block", F.col("sub").alias("q_sub")
    )
    dt_p = cb_p.join(qsub_p, "block").select(
        "q_id", "block", "cid", F.round(l2sq(F.col("q_sub"), F.col("c_sub")), 9).alias("d")
    )
    sl_p = _shortlist(codes_p, dt_p, on_cell=False)

    # residual variant: one LUT per (query, probed cell)
    res = _residual_frame(vecs, cents, ranked=pre)
    sub_r = _pq_subvectors(res.select("vec_id", "embedding")).persist()
    sub_r.count()
    cb_r = _pq_codebook(sub_r).persist()
    cb_r.count()
    codes_r = _pq_assign(sub_r, cb_r).select("vec_id", "block", "code")
    qres = (
        q_probes.join(queries, "q_id")
        .join(F.broadcast(cents), "centroid_id")
        .select(
            "q_id",
            "centroid_id",
            F.zip_with("q_emb", "c_emb", lambda x, y: x - y).alias("embedding"),
        )
    )
    qsub_r = (
        _pq_subvectors(
            qres.select(
                F.concat_ws("_", "q_id", "centroid_id").alias("vec_id"), "embedding"
            )
        )
        .join(
            qres.select(
                F.concat_ws("_", "q_id", "centroid_id").alias("vec_id"),
                "q_id",
                "centroid_id",
            ),
            "vec_id",
        )
        .select("q_id", "centroid_id", "block", F.col("sub").alias("q_sub"))
    )
    dt_r = cb_r.join(qsub_r, "block").select(
        "q_id",
        "centroid_id",
        "block",
        "cid",
        F.round(l2sq(F.col("q_sub"), F.col("c_sub")), 9).alias("d"),
    )
    sl_r = _shortlist(codes_r, dt_r, on_cell=True)

    hits = (
        sl_p.join(exact5, ["q_id", "vec_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.count("*").alias("n_hits"))
        .select(F.lit("plain").alias("variant"), "q_id", "n_hits")
        .unionByName(
            sl_r.join(exact5, ["q_id", "vec_id"], "left_semi")
            .groupBy("q_id")
            .agg(F.count("*").alias("n_hits"))
            .select(F.lit("residual").alias("variant"), "q_id", "n_hits")
        )
    )
    grid = queries.select("q_id").crossJoin(
        spark.createDataFrame([("plain",), ("residual",)], "variant string")
    )
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0).cast("long"))
    return grid.join(F.broadcast(hits), ["q_id", "variant"], "left").select(
        "q_id",
        "variant",
        n_hits.alias("n_hits"),
        (n_hits.cast("double") / F.lit(float(PQ_TOPK))).alias("recall"),
    )


#: The threshold grid of the semantic-dedup tuning curve: from the corpus's
#: pair floor (SEMANTIC_TAU) upward in 0.1 steps — the range where the
#: removal count actually moves on this corpus. Production SemDeDup sweeps
#: 0.90-0.999 the same way; the grid is a constant so both engines compare
#: bit-identical double literals against the round-6 cosine.
SEM_SWEEP_TAUS = (0.45, 0.55, 0.65, 0.75, 0.85)


@register(
    "semantic_tau_sweep",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        centroids AS (
            SELECT vec_id AS centroid_id, emb AS c_emb
            FROM vecs WHERE vec_id < {AUTO_K_SQL}
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
        pairs AS (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                   round(list_cosine_similarity(a.emb, b.emb), 6) AS sim
            FROM assigned a JOIN assigned b
              ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= {SEMANTIC_TAU}
        ),
        taus AS (
            SELECT CAST(unnest([{", ".join(str(t) for t in SEM_SWEEP_TAUS)}]) AS DOUBLE) AS tau
        ),
        swept AS (
            SELECT t.tau, p.a_id, p.b_id FROM pairs p JOIN taus t ON p.sim >= t.tau
        ),
        pair_counts AS (
            SELECT tau, COUNT(*) AS n_pairs FROM swept GROUP BY tau
        ),
        doc_counts AS (
            SELECT tau, COUNT(DISTINCT doc) AS n_docs FROM (
                SELECT tau, unnest([a_id, b_id]) AS doc FROM swept
            ) GROUP BY tau
        )
        SELECT t.tau,
               COALESCE(p.n_pairs, 0) AS n_pairs,
               COALESCE(d.n_docs, 0) AS n_docs_implicated
        FROM taus t
        LEFT JOIN pair_counts p ON t.tau = p.tau
        LEFT JOIN doc_counts d ON t.tau = d.tau
    """,
    tags=("ext-sim", "ext-dedup", "contract"),
)
def semantic_tau_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The semantic-dedup THRESHOLD TUNING CURVE — the artifact a
    deployment reads before committing a tau (Abbas et al. 2023 tune
    SemDeDup exactly this way: sweep, read the removal curve, pick the
    elbow): per threshold, the surviving near-dup pair count and the
    number of documents implicated. Generated from ONE candidate pass at
    the registered floor (semantic_dedup's own recipe — same clusters,
    same round-6 exact cosine), so the sweep costs one small
    pair-table × |taus| fan-out, never |taus| corpus passes; the floor
    row reconciles with semantic_dedup by construction (its pair count
    IS the tau=SEMANTIC_TAU row — kept-in-sync by the shared recipe and
    pinned in tests).

    Plan: semantic_dedup_pairs once (assignment persisted, within-cluster
    self-join), then a broadcast |taus|-row join over the TRUE-pair table
    (bounded by real near-dups, not candidates), one count and one
    explode-distinct per tau, grid left-join keeps empty-threshold rows
    visible. At 100 TB the sweep rides whatever candidate pass the dedup
    run already does — the curve is free relative to the dedup itself."""
    vecs = _vectors(spark, sf_dir)
    pairs = semantic_dedup_pairs(vecs, None, SEMANTIC_TAU).select("a_id", "b_id", "sim")
    taus = F.broadcast(
        spark.createDataFrame([(t,) for t in SEM_SWEEP_TAUS], "tau double")
    )
    # persist: the pair/doc aggregates are two consumers, and without the
    # cache each would re-run the within-cluster self-join (the expensive
    # stage) — the swept table is |true pairs|·|taus| rows, tiny.
    swept = (
        pairs.join(taus, F.col("sim") >= F.col("tau"))
        .select("tau", "a_id", "b_id")
        .persist()
    )
    pair_counts = swept.groupBy("tau").agg(F.count("*").alias("n_pairs"))
    doc_counts = (
        swept.select("tau", F.explode(F.array("a_id", "b_id")).alias("doc"))
        .groupBy("tau")
        .agg(F.countDistinct("doc").alias("n_docs"))
    )
    zero = F.lit(0).cast("long")
    return (
        taus.join(F.broadcast(pair_counts), "tau", "left")
        .join(F.broadcast(doc_counts), "tau", "left")
        .select(
            "tau",
            F.coalesce(F.col("n_pairs"), zero).alias("n_pairs"),
            F.coalesce(F.col("n_docs"), zero).alias("n_docs_implicated"),
        )
    )
