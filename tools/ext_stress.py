"""Scale-stress for the round-3 extension families (the sf1-equivalent run
the driver can't provide): embeddings ×N for the PQ/SemDeDup stack, events
×N for the behavioral stack, documents ×N (scale_stress's corpus builder)
for the LM/BPE stack.

Surrogate construction, all pure DataFrame:

- embeddings: replica r of vector v gets vec_id = v + r·10⁹ and its
  components ROTATED by r positions — an isometry, so within-replica
  geometry (norms, dot products) is preserved exactly while cross-replica
  cosines decorrelate; vector count scales ×N with the same per-replica
  structure.
- events: replica r shifts user_id by r·10⁶ (and event_id by r·10⁹) —
  user population ×N over the same time range, per-user sequences
  preserved, so windows partition ×N ways and cohort/funnel shapes repeat
  per replica.
- documents: scale_stress.build_corpus (tagged-word replicas).

Validation target: wall(×N) within 2× of N·wall(×1) for the linear-shaped
plans (pq_encode, bpe_train_merges, bigram_lm_table, retention_cohorts,
event_transition_matrix, value_zscore_outliers, unigram_logprob_score);
semantic_dedup is quadratic WITHIN clusters by design — with fixed
N_CENTROIDS its pair stage grows ×N² at constant cluster count, which is
exactly why production SemDeDup scales k with the corpus; the report
prints the measured exponent so the trade is a recorded number, not a
claim. ann_pq_adc_topk's shortlist stage is linear; the re-rank is
constant (50 rows).

Run:  python tools/ext_stress.py 2>/dev/null
      REPLICAS=4 python tools/ext_stress.py 2>/dev/null

Recorded results live in PLANS.md ("extension stack at 10×").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("REPLICAS", "10"))
STRESS_DIR = os.environ.get("STRESS_DIR", "/tmp/ext_stress")

EMB_QUERIES = (
    "pq_encode",
    "ann_pq_adc_topk",
    "semantic_dedup",
    "knn_graph",
    # recall evaluation: exact side is queries × corpus (linear at fixed
    # batch), IVF side is the linear assignment — both should hold ~linear
    "ann_recall_report",
    # quality metrics: centroid-residual top-N and the PQ qd aggregate
    "embedding_outliers",
    "pq_reconstruction_error",
    # r6: the honest-seed recall curve — same linear assignment plan as
    # ann_recall_report, larger constant (4 nprobe tiers × query batch)
    "ann_recall_honest",
    # r6: the honest curve + one Lloyd step (adds one broadcast
    # assignment pass and a |centroids|×dim mean — still linear)
    "ann_recall_lloyd",
    # r6: two-level IVF — the probe cascade over coarse cells; the full
    # fine assignment dominates, so ~the one-level linearity
    "ann_ivf2_topk",
    "ann_recall_ivf2",
)
EVT_QUERIES = (
    "retention_cohorts",
    "event_transition_matrix",
    "funnel_conversion",
    "value_zscore_outliers",
    "active_users_rollup",
    # r6: salted hot-key join (events×10 = 10× rows through the same 5
    # hot event_type groups — exactly the skew the salt spreads) and the
    # partition-scoped merge (changeset and state both scale ×10)
    "skew_salted_enrich",
    "snapshot_merge_partitioned",
)
DOC_QUERIES = (
    "bpe_train_merges",
    "bpe_encode_token_count",
    "bigram_lm_table",
    "unigram_logprob_score",
)


def _done(path: str, table: str) -> bool:
    """Fresh iff complete AND not older than the base table it replicates
    (see scale_stress.build_corpus — a stale /tmp surrogate would record
    stress numbers against yesterday's corpus)."""
    from vacancy_analyser_spark.io import materialization_is_fresh

    return materialization_is_fresh(
        os.path.join(path, f"{table}.parquet"),
        os.path.join(BASE_SF, f"{table}.parquet"),
    )


def build_embeddings(spark) -> str:
    out = os.path.join(STRESS_DIR, f"emb_x{REPLICAS}")
    if _done(out, "embeddings"):
        return out
    shutil.rmtree(out, ignore_errors=True)
    emb = spark.read.parquet(os.path.join(BASE_SF, "embeddings.parquet"))
    reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("r"))
    dim = F.size("embedding")
    # rotation amount mod dim: REPLICAS is a free knob, and r >= dim would
    # make the first slice length negative (runtime error)
    rot = F.pmod(F.col("r"), dim)
    rotated = F.concat(
        F.slice(F.col("embedding"), rot + 1, dim - rot),
        F.slice(F.col("embedding"), F.lit(1), rot),
    )
    scaled = (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("r").cast("bigint") * 1_000_000_000).alias("vec_id"),
            rotated.alias("embedding"),
            "label",
        )
        .repartition(32)
    )
    scaled.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    # filtered_ann-style queries join documents; not needed for EMB_QUERIES
    return out


def build_events(spark) -> str:
    out = os.path.join(STRESS_DIR, f"evt_x{REPLICAS}")
    if _done(out, "events"):
        return out
    shutil.rmtree(out, ignore_errors=True)
    ev = spark.read.parquet(os.path.join(BASE_SF, "events.parquet"))
    reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("r"))
    scaled = (
        ev.crossJoin(F.broadcast(reps))
        .select(
            (F.col("event_id") + F.col("r").cast("bigint") * 1_000_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("r").cast("bigint") * 1_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(32)
    )
    scaled.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    return out


def run(spark, qs, name: str, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        # clear BETWEEN timed runs (bench.py's discipline): plan-equality
        # cache matching otherwise lets a query reuse the PREVIOUS query's
        # persisted subplans (the tf-idf pair shares its whole vector
        # subplan with the capped variant — measured: the capped key timed
        # FASTER than its exact sibling at x1 purely from run order)
        spark.catalog.clearCache()
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


#: The r4/r5 document-tier ops that had no ×N measurement (r4 verdict
#: "What's missing" #1): the containment pair (now planner-dispatched),
#: the governance matrix, and the sparse-cosine pair (capped beside its
#: exact sibling so the cap's cost is a recorded ratio, not a claim) —
#: plus the r5-late keys (span report, index-served MinHash, the LSH
#: S-curve) so nothing registered this round ships with an asserted
#: scale shape.
DOC_EXT_QUERIES = (
    "containment_dedup",
    "containment_capped",
    "source_overlap_matrix",
    "tfidf_cosine_pairs",
    "tfidf_cosine_capped",
    "contamination_spans",
    "minhash_index_serve",
    "lsh_recall_report",
    "boilerplate_strip",
    "ngram_novelty_score",
    "dataset_card_stats",
    "near_dup_component_stats",
    "dedup_savings_report",
    "incremental_dedup_bucketed",
    "duplicate_spans",
    "span_strip",
    # r6: DSIR selection — two corpus passes + vocab-sized broadcast,
    # should hold ~linear like the other model-broadcast keys
    "dsir_importance_resample",
    # r8: selection/sharding ops — per-lang-window (budget select),
    # scan+|N_SHARDS| agg (manifest), |langs| agg + scalar arithmetic
    # (mixture) — all expected ~linear; measured, not assumed
    "token_budget_select",
    "shard_manifest",
    "corpus_mix_temperature",
)


#: Keys whose registered dispatch picks DIFFERENT physical plans at ×1
#: and ×N on this surrogate (×1 sits in the vocab-bitmap dense regime,
#: ×N in the sparse count-join regime), so their plain vs_linear is a
#: cross-tier ratio, not a linearity measurement — collect_exact_tier's
#: two-ratio discipline applies. Each entry names the ×N plan so the
#: block can time the SAME plan at ×1 for the honest denominator.
#: Diagnosed r10: containment_dedup's r9 "1.98× vs linear" row decomposed
#: into same-plan 0.16× (count-join is strongly sublinear) against a
#: bitmap-tier ×1 base ~11× faster than the count-join on the same data —
#: the ratio measured the tier boundary, exactly like exact_tier's
#: vs_linear_key_base.
CROSS_TIER_DOC_EXT: dict[str, str] = {
    # capped twin excluded: its ×N plan runs on the CAPPED shingle table,
    # so timing the uncapped count-join at ×1 would not be "same plan" —
    # and its plain ratio (0.98× r9) needs no decomposition anyway
    "containment_dedup": "_containment_countjoin",
}


def collect_doc_ext(spark, deadline_sec: float | None = None) -> dict:
    """×N linearity for DOC_EXT_QUERIES over the tagged-word document
    surrogate (scale_stress.build_corpus) — importable by bench.py so the
    per-round BENCH artifact carries the numbers. Same vs_linear metric
    as every other block: wall(×N) / (N · wall(×1)) — except the
    CROSS_TIER_DOC_EXT keys, which additionally record
    ``vs_linear_same_plan`` against the ×N plan timed at ×1 (the
    linearity criterion; the plain ratio is the tier-boundary cost).

    ``deadline_sec`` bounds the block from INSIDE (the r4 ADVICE finding
    the suite-level budget couldn't): once the elapsed wall passes it,
    remaining keys are recorded as {"skipped": "deadline"} — visible
    truncation, never a silent cap. Keys run in list order, so the
    longest-standing measurements keep priority over late additions."""
    import tools.scale_stress as dstress

    from vacancy_analyser_spark.plans import dedup
    from vacancy_analyser_spark.plans.registry import queries

    qs = queries()
    t0 = time.monotonic()
    doc_dir = dstress.build_corpus(spark)
    rep: dict[str, object] = {"replicas": REPLICAS}
    gb = None
    for q in DOC_EXT_QUERIES:
        if deadline_sec is not None and time.monotonic() - t0 > deadline_sec:
            rep[q] = {"skipped": "deadline"}
            continue
        b = run(spark, qs, q, BASE_SF)
        s = run(spark, qs, q, doc_dir)
        row: dict[str, object] = {
            "x1_sec": b,
            f"x{REPLICAS}_sec": s,
            "vs_linear": round(s / (REPLICAS * b), 2) if b > 0 else None,
        }
        if q in CROSS_TIER_DOC_EXT:
            if gb is None:
                gb = dedup._doc_bigrams(spark, BASE_SF).persist()
                gb.count()
            plan = getattr(dedup, CROSS_TIER_DOC_EXT[q])
            sp = min(
                _timed_noop(plan, gb) for _ in range(2)
            )
            row["same_plan_base_sec"] = sp
            if sp > 0:
                r_same = s / (REPLICAS * sp)
                row["vs_linear_same_plan"] = round(r_same, 2)
                row["within_1_5x_same_plan"] = r_same <= 1.5
        rep[q] = row
    if gb is not None:
        gb.unpersist()
    return rep


def _timed_noop(plan, g) -> float:
    t0 = time.monotonic()
    plan(g).write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 2)


def collect_k_scaling(spark) -> dict:
    """The IVF/SemDeDup k-scaling probe alone, as a dict — importable by
    bench.py. With k fixed at N_CENTROIDS the within-cluster pair stage
    is quadratic in the corpus; scaling k ×REPLICAS holds expected
    cluster size constant and must return it to ~linear. The ``auto``
    row runs k=None — the corpus-derived default every registered key
    now uses — and must track the scaled-k line WITHOUT a hand-set k."""
    from vacancy_analyser_spark.plans.similarity import (
        N_CENTROIDS,
        SEMANTIC_TAU,
        _vectors,
        auto_centroids,
        semantic_dedup_pairs,
    )

    emb_dir = build_embeddings(spark)

    def run_pairs(sf_dir: str, k: int | None) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            semantic_dedup_pairs(_vectors(spark, sf_dir), k, SEMANTIC_TAU).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        return round(best, 3)

    b = run_pairs(BASE_SF, N_CENTROIDS)
    s_fixed = run_pairs(emb_dir, N_CENTROIDS)
    s_scaled = run_pairs(emb_dir, N_CENTROIDS * REPLICAS)
    b_auto = run_pairs(BASE_SF, None)
    s_auto = run_pairs(emb_dir, None)
    return {
        "replicas": REPLICAS,
        "k_fixed": N_CENTROIDS,
        "k_scaled": N_CENTROIDS * REPLICAS,
        "k_auto_base": auto_centroids(_vectors(spark, BASE_SF).count()),
        "k_auto_scaled": auto_centroids(_vectors(spark, emb_dir).count()),
        "x1_sec": b,
        "fixed_k_sec": s_fixed,
        "fixed_k_vs_linear": round(s_fixed / (REPLICAS * b), 2) if b > 0 else None,
        "scaled_k_sec": s_scaled,
        "scaled_k_vs_linear": round(s_scaled / (REPLICAS * b), 2) if b > 0 else None,
        "auto_x1_sec": b_auto,
        "auto_k_sec": s_auto,
        "auto_k_vs_linear": round(s_auto / (REPLICAS * b_auto), 2) if b_auto > 0 else None,
    }


def collect_range_join_bands(spark) -> dict:
    """The many-bands range-join row (range_join_banded's dispatch reason,
    measured): |part| bands at BASE_SF against the ×REPLICAS events
    surrogate, grid equi-join (what the probe picks) vs the forced
    broadcast NLJ (what the old plan would have run). The NLJ evaluates
    every band predicate per event row — O(n·m); the grid is a hash probe
    per row — the ratio is the operator's whole case."""
    import vacancy_analyser_spark.plans.joins as J

    evt_dir = build_events(spark)
    # the banded key loads events AND part from one sf_dir; the events
    # surrogate needs the (dim-sized) part table once, reused across rounds
    part_dst = os.path.join(evt_dir, "part.parquet")
    if not os.path.exists(os.path.join(part_dst, "_SUCCESS")):
        spark.read.parquet(os.path.join(BASE_SF, "part.parquet")).write.mode(
            "overwrite"
        ).parquet(part_dst)

    def run_once(forced_bnlj: bool) -> float:
        old = J.RANGE_BNLJ_MAX_BANDS
        J.RANGE_BNLJ_MAX_BANDS = 10**9 if forced_bnlj else 0
        try:
            best = float("inf")
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                J.range_join_banded(spark, evt_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.monotonic() - t0)
            return round(best, 3)
        finally:
            J.RANGE_BNLJ_MAX_BANDS = old

    grid_sec = run_once(forced_bnlj=False)
    n_bands = J.LAST_RANGE_DISPATCH.get("n_bands")
    bnlj_sec = run_once(forced_bnlj=True)
    return {
        "replicas": REPLICAS,
        "n_bands": n_bands,
        "grid_sec": grid_sec,
        "bnlj_sec": bnlj_sec,
        "bnlj_vs_grid": round(bnlj_sec / grid_sec, 2) if grid_sec else None,
    }


def collect_incremental_ingest(spark) -> dict:
    """The incremental-vs-rebuild cost row for the materialized IVF index
    (ann_index_incremental_add's 100 TB claim, measured): at ×1 and
    ×REPLICAS corpus size, build a base index (7/8 of the vectors), fold
    the remaining 1/8 in as an arriving batch, and run the full rebuild on
    the union for comparison. The add assigns ONLY the batch against the
    stored centroids and appends to the touched partitions, so
    ``add_vs_rebuild`` should sit well under the batch fraction's naive
    share and, crucially, the ×N add must NOT grow like the ×N rebuild's
    training pass (the add has no trainer at all)."""
    from vacancy_analyser_spark.plans.similarity import (
        _vectors,
        auto_centroids,
        ivf_build_index_frame,
        ivf_index_incremental_add,
    )

    emb_dir = build_embeddings(spark)
    out: dict[str, object] = {"replicas": REPLICAS, "batch_fraction": "1/8"}
    for tag, sf in (("x1", BASE_SF), (f"x{REPLICAS}", emb_dir)):
        vecs = _vectors(spark, sf)
        is_batch = F.pmod(F.col("vec_id"), F.lit(8)) == 7
        base, batch = vecs.filter(~is_batch), vecs.filter(is_batch)
        n_base, n_batch = base.count(), batch.count()
        k = auto_centroids(n_base)
        path = os.path.join(STRESS_DIR, f"ivf_incr_{tag}")
        path_rb = os.path.join(STRESS_DIR, f"ivf_rebuild_{tag}")
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(path_rb, ignore_errors=True)
        t0 = time.monotonic()
        ivf_build_index_frame(base, path, n_centroids=k)
        build_sec = time.monotonic() - t0
        t0 = time.monotonic()
        touched = ivf_index_incremental_add(spark, path, batch)
        add_sec = time.monotonic() - t0
        t0 = time.monotonic()
        ivf_build_index_frame(vecs, path_rb, n_centroids=k)
        rebuild_sec = time.monotonic() - t0
        out[tag] = {
            "n_base": n_base,
            "n_batch": n_batch,
            "k": k,
            "buckets_touched": len(touched),
            "base_build_sec": round(build_sec, 3),
            "incr_add_sec": round(add_sec, 3),
            "full_rebuild_sec": round(rebuild_sec, 3),
            "add_vs_rebuild": round(add_sec / rebuild_sec, 3) if rebuild_sec else None,
        }
    x1 = out["x1"]["incr_add_sec"]
    xn = out[f"x{REPLICAS}"]["incr_add_sec"]
    # the add's cost law: ×N corpus → ×N batch here, so linear-in-batch is
    # the target (an index-size-coupled add would grow faster)
    out["add_xN_vs_linear"] = round(xn / (REPLICAS * x1), 2) if x1 else None
    return out


def collect_compaction_salt(spark) -> dict:
    """The salted-compaction parallelism row (r11): a hot partition far
    past maxRecordsPerFile must compact across ~ceil(rows/max_records)
    tasks, not serialize in one. Fixture: every ×REPLICAS vector filed
    under ONE centroid partition, fragmented into one file per replica
    slice (the shape a resident ingest stream leaves behind a hot cell).
    Measured: compact_partitions (per-key salted rewrite, current code)
    vs the one-task counterfactual (repartition by key alone, same
    maxRecordsPerFile) on an identical copy — same output contract, the
    salt buys the parallelism. Also records the distinct writer-task
    count salvaged from the output part-file names, so the artifact
    shows the plan shape, not just the wall."""
    from vacancy_analyser_spark.operators.compaction import (
        compact_partitions,
        partition_file_census,
    )

    emb_dir = build_embeddings(spark)
    emb = spark.read.parquet(os.path.join(emb_dir, "embeddings.parquet"))
    out: dict[str, object] = {"replicas": REPLICAS}
    # densify the hot cell well past the ×REPLICAS table: the claim under
    # measure is a single partition holding MANY right-sized files' worth
    # of rows, where a one-task rewrite serializes the whole partition's
    # row encoding; at toy row counts fixed overhead hides that wall
    dense = spark.range(25).select(F.col("id").cast("bigint").alias("d"))
    hot = (
        emb.crossJoin(F.broadcast(dense))
        .select(
            (F.col("vec_id") + F.col("d") * 100_000_000_000).alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("embedding"),
            F.lit(0).cast("int").alias("centroid_id"),
        )
    )
    n_rows = hot.count()
    out["hot_rows"] = n_rows
    # scale the record bound to the fixture so the hot partition spans ~8
    # right-sized files — the production regime (rows >> max_records)
    # surrogate at this corpus size; both variants use the same bound
    mrpf = max(1000, n_rows // 16)
    out["max_records_per_file"] = mrpf

    def _mk(table_dir: str) -> None:
        shutil.rmtree(table_dir, ignore_errors=True)
        # one append per slice -> 40 small files in the partition (must
        # exceed the ~16-file right-sized layout to count as fragmented)
        for r in range(40):
            hot.filter(
                F.pmod(F.col("vec_id"), F.lit(40)) == r
            ).coalesce(1).write.mode("append").partitionBy("centroid_id").parquet(
                table_dir
            )

    def _tasks(table_dir: str) -> int:
        files = [
            f
            for f in os.listdir(os.path.join(table_dir, "centroid_id=0"))
            if f.startswith("part-")
        ]
        return len({f.split("-")[1] for f in files})

    salted = os.path.join(STRESS_DIR, "compact_salt")
    _mk(salted)
    before = partition_file_census(spark, salted, ("centroid_id",))
    out["files_before"] = before[(0,)][0]
    # AQE coalescing folds toy-sized shuffle partitions into one task
    # regardless of the salt; at real sizes the advisory byte target
    # keeps the salted tasks apart, so disable coalescing to surface the
    # intended plan (the unit test's rationale, applied to the measure)
    ck = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(ck, "true")
    spark.conf.set(ck, "false")
    try:
        t0 = time.monotonic()
        report = compact_partitions(spark, salted, max_records_per_file=mrpf)
        out["salted_sec"] = round(time.monotonic() - t0, 3)
    finally:
        spark.conf.set(ck, prev)
    out["salted_files_after"] = report[0]["files_after"] if report else None
    out["salted_writer_tasks"] = _tasks(salted)

    single = os.path.join(STRESS_DIR, "compact_single")
    _mk(single)
    t0 = time.monotonic()
    rows = (
        spark.read.parquet(single)
        .filter(F.col("centroid_id") == 0)
        .localCheckpoint(eager=True)
    )
    (
        rows.repartition(F.col("centroid_id"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", mrpf)
        .partitionBy("centroid_id")
        .parquet(single)
    )
    out["single_task_sec"] = round(time.monotonic() - t0, 3)
    out["single_writer_tasks"] = _tasks(single)
    if out["single_task_sec"]:
        out["salted_vs_single"] = round(out["salted_sec"] / out["single_task_sec"], 2)
    shutil.rmtree(salted, ignore_errors=True)
    shutil.rmtree(single, ignore_errors=True)
    return out


def main() -> None:
    import tools.scale_stress as dstress
    from vacancy_analyser_spark.plans.registry import queries
    from vacancy_analyser_spark.session import get_spark

    spark = get_spark("ext-stress")
    qs = queries()
    report: dict[str, object] = {"replicas": REPLICAS}

    emb_dir = build_embeddings(spark)
    evt_dir = build_events(spark)
    doc_dir = dstress.build_corpus(spark)

    for fam, names, stress in (
        ("embeddings", EMB_QUERIES, emb_dir),
        ("events", EVT_QUERIES, evt_dir),
        ("documents", DOC_QUERIES, doc_dir),
    ):
        fam_rep = {}
        for q in names:
            b = run(spark, qs, q, BASE_SF)
            s = run(spark, qs, q, stress)
            fam_rep[q] = {
                "x1_sec": b,
                f"x{REPLICAS}_sec": s,
                "vs_linear": round(s / (REPLICAS * b), 2) if b > 0 else None,
            }
        report[fam] = fam_rep

    # the SemDeDup k-scaling mitigation, measured so the claim is a
    # number — one definition (collect_k_scaling), not a drift-prone copy
    report["semantic_dedup_k_scaling"] = collect_k_scaling(spark)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
