"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]. Each query executes end-to-end into the noop
sink (full plan, no driver collect), three times; the reported number is the
min of the runs — single-JVM local mode has 2-3x per-query jitter from GC
and JIT pauses (measured: back-to-back full-bench totals differ by up to
25%), and the min is the stable estimator of plan cost. The cache is
cleared between runs so each timing rebuilds its own persisted
intermediates (no cross-run reuse). Prints:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

When the bench SF is the top shipped scale (sf0.1), the output also
carries a "scale_stress" block: the ×10-surrogate suite (tools/
scale_stress.py near-dup linearity + dispatcher plan choice, tools/
relational_stress.py relational linearity + AQE SMJ-flip probe, tools/
ext_stress.py IVF/SemDeDup k-scaling) so the per-round BENCH artifact
records the scale evidence, not just PLANS.md. Each sub-block is
fail-soft (an "error" entry instead of a crash). The
$SPARK_GRAFT_STRESS_BUDGET cap (default 900 s) gates whether a block
STARTS; a running block may finish past it (a Spark stage cannot be
preempted mid-collect without killing the session) — EXCEPT the
doc-ext block, which is the one that grew past any fixed size (14
keys in r5) and therefore checks the leftover budget BETWEEN keys,
recording visible {"skipped": "deadline"} entries for whatever it
truncates. Set SPARK_GRAFT_STRESS=0 to skip entirely.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: r3/r4 extension operators NOT on the headline list (which stays frozen
#: for baseline comparability since r1) — timed min-of-2 into a secondary
#: `ext` block so every round's artifact records their cost trajectory.
EXT = [
    "semantic_dedup",
    "knn_graph",
    "ann_pq_adc_topk",
    "ann_ivfpq_topk",
    "ann_ivfpq_index_serve",
    "ann_ivfpq_batch_topk",
    "tfidf_cosine_pairs",
    "tfidf_cosine_capped",
    "bpe_train_merges",
    "bpe_encode_token_count",
    "boilerplate_ngrams",
    "doc_boilerplate_share",
    "corpus_keep_list",
    "funnel_conversion",
    "retention_cohorts",
    "heavy_hitters",
    "table_profile",
    "containment_dedup",
    "containment_capped",
    "incremental_dedup",
    "minhash_index_serve",
    "contamination_spans",
    "ann_recall_report",
    "lsh_recall_report",
    "approx_quantile_contract",
    "boilerplate_strip",
    "ngram_novelty_score",
    "dataset_card_stats",
    "embedding_outliers",
    "pq_reconstruction_error",
    "near_dup_component_stats",
    "dedup_savings_report",
    "incremental_dedup_bucketed",
    "duplicate_spans",
    "span_strip",
    "skew_salted_enrich",
    "snapshot_merge_partitioned",
    "ann_recall_honest",
    "dsir_importance_resample",
    "ann_recall_lloyd",
    "ann_ivf2_topk",
    "ann_ivf2_index_serve",
    "ann_recall_ivf2",
    "corpus_selection_manifest",
    "ann_index_incremental_add",
    "range_join_banded",
    "ann_recall_incremental",
    "ann_index_drift_report",
    "ann_ivfpq_incremental_add",
    "ann_ivf2_incremental_add",
    "ann_recall_lloyd2",
    "ann_ivfpq_residual_topk",
    "pq_residual_error_report",
    "token_budget_select",
    "cluster_balanced_sample",
    "ann_recall_residual",
    "shard_manifest",
    "semantic_tau_sweep",
    "corpus_mix_temperature",
    "quality_gate_bucketed",
    # r10: the graduated r9 cold cohort (see EXT_BASELINE_R10_GRAD)
    "kmeans_iterate",
    "embedding_near_dup",
    "semantic_dedup_multiprobe",
    "ngram_jaccard_capped",
    "near_dup_groups",
    "filtered_ann_topk",
    "ann_retrain_decision",
    "corpus_build_manifest",
    "ann_ingest_replay",
    "shard_manifest_diff",
    "ann_index_delete",
    "ann_ivfpq_index_delete",
    "ann_ivf2_index_delete",
    "ann_autoprobe_topk",
    "ann_cell_split_retrain",
    "ann_split_index_serve",
]

#: The deferrable evaluation tail (r7 verdict item: the timed ext block
#: reached ~100 s on a jittery host against the ~1400 s round budget
#: including stress). These keys are REPORTS over registered stages —
#: their plans are exercised elsewhere in the block — so when the ext
#: wall crosses $SPARK_GRAFT_EXT_BUDGET (seconds; default 480 since r10 —
#: the graduated cohort grew the min-of-2 core block to ~180 s recorded,
#: ~360 s wall, and the old 360 s default starved the entire defer tail)
#: whatever of THIS LIST hasn't run yet is
#: skipped VISIBLY: each skipped key lands in the artifact's
#: "ext_skipped" map instead of silently missing from ext_queries. The
#: regression gate stays intact for everything that ran; core ext keys
#: are never skipped.
EXT_DEFER = (
    "corpus_selection_manifest",
    "lsh_recall_report",
    "ann_recall_lloyd2",
    "pq_residual_error_report",
    "ann_recall_residual",
    # r10-graduated keys whose single-sample pin is ≥4 s: single-run,
    # last, budget-cuttable — graduation must not starve the core block
    "embedding_near_dup",
    "ngram_jaccard_capped",
    "near_dup_groups",
    "corpus_build_manifest",
    "ann_ingest_replay",
    "ann_autoprobe_topk",
    "ann_cell_split_retrain",
    "ann_split_index_serve",
)

#: Rotating cold-key slot (r8 verdict item 7): registered keys with green
#: driver rows but no TIMED row in any BENCH artifact yet (92 remained
#: entering r10). Each round this list names the next cohort; keys run
#: ONCE (single sample — these establish first reference numbers, they
#: are not regression-gated) into the artifact's "cold_queries" map,
#: under an INDEPENDENT wall budget ($SPARK_GRAFT_COLD_BUDGET, default
#: 240 s since r10 — six of this cohort's keys pay one-off index-build
#: fixtures of 10-36 s each on a cold warehouse) checked before each
#: key — the first key always runs; budget
#: skips are recorded in "cold_skipped", visibly, like EXT_DEFER's.
#: Keys already timed graduate out (r9's 16-key cohort graduated into
#: the gated ext block this round — EXT_BASELINE_R10_GRAD).
#: r10 cohort (94): the six r10-new keys first (their first numbers
#: belong to the round that shipped them), then the r9-verdict-named
#: never-timed keys (pq_encode, embedding_drift, snapshot_stream_replay,
#: corpus_ingest_replay, the multimodal trio), the non-trivial tail,
#: then the entire cheap remainder — the never-benched backlog closes
#: this round (budget-gated; any overrun is a visible cold_skipped).
COLD_KEYS = (
    "ann_index_compact",
    "ann_split_incremental_add",
    "ann_split_index_delete",
    "ann_ivf2_autoprobe_topk",
    "ann_index_delete_lookup",
    "ann_ivf2_index_compact",
    "pq_encode",
    "embedding_drift",
    "snapshot_stream_replay",
    "corpus_ingest_replay",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    "multimodal_resize",
    "streaming_neardup_replay",
    "streaming_session_replay",
    "streaming_zscore_replay",
    "ivf_index_probe",
    "ann_ivf_topk",
    "ann_ivf_topk_nprobe2",
    "embedding_centroids",
    "embedding_quantize",
    "benchmark_decontaminate",
    "bigram_lm_table",
    "doc_quality_filter",
    "lang_id_ngram",
    "lang_confusion_matrix",
    "doc_fingerprint",
    "doc_lang_stats",
    "source_overlap_matrix",
    "corpus_lake_pruned_scan",
    "dedup_keep_best",
    "corpus_mix_resample",
    # the never-timed remainder (cheap rowops/relational/streaming-batch
    # keys, ~0.2-2 s each): with the r10-new fixtures warm from the keys
    # above, the 240 s budget covers the whole tail — closing the
    # never-benched backlog this round instead of r11
    "active_users_rollup",
    "anti_join_removed",
    "approx_distinct",
    "array_join_split",
    "bpe_apply_frozen",
    "bpe_token_estimate",
    "broadcast_synonym_join",
    "categorical_profile",
    "conditional_counts",
    "csv_typed_scan",
    "dataset_split_assign",
    "date_functions",
    "disjunctive_filter_revenue",
    "distinct_count",
    "employer_enrich_join",
    "event_transition_matrix",
    "except_skills",
    "explode_count",
    "filter_contains",
    "filter_it_specialization",
    "filter_not_archived",
    "flatten_struct",
    "forecast_revenue_change",
    "freshness_lag",
    "grouping_sets_revenue",
    "idle_rich_customers",
    "important_part_value",
    "json_extract_props",
    "late_shipment_counts",
    "max_dates",
    "nation_trade_volume",
    "nations_per_region_agg",
    "null_handling",
    "order_priority_check",
    "parts_supplier_relationship",
    "pct_of_total",
    "potential_part_promotion",
    "project_columns",
    "promo_revenue_share",
    "quality_percentile_gate",
    "range_join_salary",
    "redact_pii",
    "regexp_extract_year",
    "repetition_ngram_ratio",
    "rollup_year_prof",
    "sample_per_group",
    "semi_join",
    "session_window_count",
    "simhash",
    "small_qty_revenue",
    "sort_desc",
    "stateful_dedup",
    "stratified_sample",
    "string_truncate",
    "token_count",
    "top_n",
    "top_supplier_revenue",
    "unigram_logprob_score",
    "union_years",
    "value_drift_by_day",
    "value_histogram",
    "value_zscore_outliers",
)

#: Ext-block regression gate (r4 verdict item 7): the first full ext
#: recording — the DRIVER's BENCH_r04 ext_queries at sf0.1, local[32] —
#: is the baseline the way BENCH_r01 is for the headline. Any ext op
#: whose min-of-2 exceeds 2x its pinned number lands in the output's
#: "ext_regressions" list (the 2x bound absorbs local-mode jitter, which
#: is routinely 1.3-2x on the min-of-2 the ext block affords; sustained
#: entries here mean a plan regressed, not a noisy host). This table is
#: the r4 PROVENANCE record, kept verbatim; the EFFECTIVE gate is
#: EXT_BASELINE below — the r5 overlay re-pins the keys r5 rewrote
#: (under the r4 pins the gate had gone slack: containment_dedup could
#: triple back to its pre-dispatch shape and still pass 2× of 17.4 s)
#: and gives first pins to the r5 additions.
EXT_BASELINE_R4 = {
    "semantic_dedup": 1.336,
    "knn_graph": 1.389,
    "ann_pq_adc_topk": 3.372,
    "ann_ivfpq_topk": 3.775,
    "tfidf_cosine_pairs": 3.9,
    "tfidf_cosine_capped": 9.433,
    "bpe_train_merges": 1.218,
    "bpe_encode_token_count": 1.235,
    "boilerplate_ngrams": 1.238,
    "doc_boilerplate_share": 1.617,
    "corpus_keep_list": 8.356,
    "funnel_conversion": 0.648,
    "retention_cohorts": 0.602,
    "heavy_hitters": 0.819,
    "table_profile": 0.871,
    "containment_dedup": 17.435,
    "incremental_dedup": 2.529,
}

#: r5 re-pins and new pins (quiet-host min-of-2 recordings, 2026-08-14).
#: Keys REWRITTEN in r5 are re-pinned to their post-fix numbers — under
#: the r4 pins the gate had gone slack (containment_dedup could triple
#: back to its old shape and still pass 2× of 17.4 s); keys NEW in r5
#: get their first pin here. The r4 table above is kept verbatim for
#: provenance; the effective gate is the merge below (r5 overrides).
EXT_BASELINE_R5 = {
    "tfidf_cosine_capped": 4.0,        # was 9.433 — layout fix
    "containment_dedup": 2.6,          # was 17.435 — density dispatch
    "corpus_keep_list": 3.8,           # was 8.356 — components dispatch
    "containment_capped": 3.4,
    "ann_ivfpq_index_serve": 1.8,
    "ann_ivfpq_batch_topk": 4.2,
    "minhash_index_serve": 1.3,
    "contamination_spans": 1.1,
    "ann_recall_report": 1.6,
    "lsh_recall_report": 6.5,
    "approx_quantile_contract": 0.7,
    "boilerplate_strip": 2.6,
    "ngram_novelty_score": 1.3,
    "dataset_card_stats": 0.6,
    "embedding_outliers": 1.4,
    "pq_reconstruction_error": 3.2,
    "near_dup_component_stats": 3.3,
    "dedup_savings_report": 3.7,
    "incremental_dedup_bucketed": 1.8,
}

#: r6 re-pins and new pins (quiet-host full-suite recording, 2026-08-15).
#: Re-pinned: the IVF/SemDeDup family re-based on corpus-derived auto-k
#: (k grew 8 → 31 at sf0.1, so semantic_dedup/knn_graph run slower than
#: their r4 pins by design — the r5 numbers would let a further 2× slip
#: through unflagged), and the count-join-recipe riders the mass-width
#: branch touched. First pins: the five r6 keys.
EXT_BASELINE_R6 = {
    "semantic_dedup": 1.9,             # was 1.336 — auto-k (8 → 31 centroids)
    "knn_graph": 1.9,                  # was 1.389 — auto-k
    "ann_ivfpq_topk": 3.5,
    "ann_ivfpq_index_serve": 1.4,
    "ann_ivfpq_batch_topk": 3.7,
    "ann_recall_report": 1.7,
    "containment_dedup": 2.3,
    "containment_capped": 2.6,
    "corpus_keep_list": 3.9,
    "lsh_recall_report": 5.8,
    "near_dup_component_stats": 3.1,
    "dedup_savings_report": 3.6,
    "duplicate_spans": 1.6,
    "span_strip": 2.5,
    "skew_salted_enrich": 0.5,
    "snapshot_merge_partitioned": 1.6,
    "ann_recall_honest": 2.1,
    "dsir_importance_resample": 1.1,
    "ann_recall_lloyd": 4.3,
    "ann_ivf2_topk": 2.3,
    "ann_ivf2_index_serve": 1.6,
    "ann_recall_ivf2": 3.4,
    "corpus_selection_manifest": 4.1,
}

#: r8 re-pins and new pins (quiet-host full-suite recording, 2026-08-15).
#: Re-pinned: the IVF/IVFPQ serving family flipped to the Lloyd-refined
#: trainer (the in-query keys pay one sample-seed + kmeans_step pass per
#: run — ann_ivfpq_topk 3.5 → 5.0, batch 3.7 → 5.4, the recall report
#: now measures the served Lloyd recipe at 3.1; the materialized-index
#: keys stay flat because the trainer runs once per build). First pins:
#: the two r8 keys.
EXT_BASELINE_R8 = {
    "ann_ivfpq_topk": 5.0,
    "ann_ivfpq_batch_topk": 5.4,
    "ann_ivfpq_index_serve": 1.3,
    "ann_recall_report": 3.1,
    "ann_recall_lloyd": 3.6,
    "ann_recall_honest": 2.0,
    "ann_recall_ivf2": 4.5,            # was 3.4 — two Lloyd trainings per run
    "ann_ivf2_topk": 4.2,              # was 2.3 — same
    "ann_ivf2_index_serve": 1.3,       # flat: trainer runs once per build
    "ann_index_incremental_add": 0.3,
    "range_join_banded": 0.8,
    "ann_recall_incremental": 4.1,
    "ann_index_drift_report": 2.7,
    "ann_ivfpq_incremental_add": 0.6,  # serve-side read; the one-off build is ~15 s
    "ann_ivf2_incremental_add": 0.4,   # serve-side read; the one-off build is ~6 s
    "ann_recall_lloyd2": 5.9,          # two trainer passes + eval; deferrable tail
    "ann_ivfpq_residual_topk": 6.1,    # lloyd + residual PQ train + per-cell ADC
    "pq_residual_error_report": 6.0,   # trains BOTH codebooks; deferrable tail
    "token_budget_select": 2.0,        # scan + |langs| agg + per-lang window
    "cluster_balanced_sample": 6.0,    # in-query lloyd training dominates
    "ann_recall_residual": 8.5,        # trains BOTH codebooks + 2 ADC paths; deferrable
    "shard_manifest": 2.0,             # scan-side algebra + |N_SHARDS| agg
    "semantic_tau_sweep": 2.3,         # one semantic_dedup pass + tiny fan-out
    "corpus_mix_temperature": 1.5,     # |langs| agg + scalar arithmetic
    "quality_gate_bucketed": 1.5,      # one GK-sketch agg + verification join
}

#: r10: the r9 cold cohort graduates into the gated ext block (VERDICT r9
#: item 6). Pins are the r9 committed cold numbers — SINGLE-sample first
#: references, so these keys take the widened 3x gate (EXT_SINGLE_PIN)
#: until a min-of-2 round re-pins them; the ≥4 s ones also join EXT_DEFER
#: (single-run, last, budget-cuttable) so graduation doesn't starve the
#: core block's wall.
EXT_BASELINE_R10_GRAD = {
    "kmeans_iterate": 2.06,
    "embedding_near_dup": 5.95,
    "semantic_dedup_multiprobe": 2.12,
    "ngram_jaccard_capped": 4.33,
    "near_dup_groups": 4.14,
    "filtered_ann_topk": 0.43,
    "ann_retrain_decision": 3.16,
    "corpus_build_manifest": 6.31,
    "ann_ingest_replay": 7.92,
    "shard_manifest_diff": 0.42,
    "ann_index_delete": 0.32,
    "ann_ivfpq_index_delete": 0.34,
    "ann_ivf2_index_delete": 0.35,
    "ann_autoprobe_topk": 4.72,
    "ann_cell_split_retrain": 6.19,
    "ann_split_index_serve": 9.62,
}

#: Keys whose pin is a single-sample first reference (not a min-of-2):
#: gated at 3x like EXT_DEFER until re-pinned from a min-of-2 round.
EXT_SINGLE_PIN = frozenset(EXT_BASELINE_R10_GRAD)

EXT_BASELINE = {
    **EXT_BASELINE_R4,
    **EXT_BASELINE_R5,
    **EXT_BASELINE_R6,
    **EXT_BASELINE_R8,
    **EXT_BASELINE_R10_GRAD,
}

#: The queries that represent the engine's load-bearing paths: batch spine,
#: fact⋈fact join, window aggs, merge, and each LLM-pipeline extension tier.
HEADLINE = [
    "flagship_region_share",
    "pricing_summary",
    "star_join_3way",
    "shipping_priority",
    "local_supplier_volume",
    "market_share",
    "product_type_profit",
    "min_cost_supplier",
    "returned_item_report",
    "waiting_suppliers",
    "large_order_customers",
    "customer_order_distribution",
    "snapshot_merge",
    "asof_state_at_date",
    "top_n_per_group",
    "pivot_by_year",
    "skill_freq",
    "tumbling_window_count",
    "interval_join_attribution",
    "sliding_window_avg",
    "order_gap_days",
    "moving_sum_value",
    "ntile_quartiles",
    "price_percentiles",
    "tfidf_top_terms",
    "corpus_prep_stats",
    "sequence_pack",
    "doc_chunk_overlap",
    "lake_dpp_star_join",
    "exact_dedup",
    "ngram_jaccard_dedup",
    "minhash_lsh_dedup",
    "simhash_near_dup",
    "cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from vacancy_analyser_spark.plans import queries
    from vacancy_analyser_spark.session import get_spark

    spark = get_spark("vacancy-analyser-bench")
    qs = queries()

    # Warm the JVM/codegen once on a trivial plan so per-query numbers
    # measure the queries, not session startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        runs: list[float] = []
        # min-of-3, plus up to 3 adaptive reruns: the host occasionally
        # injects 2-3x contention spikes (observed with an idle guest), and
        # a spiky triple would record a number that is pure scheduler luck
        # (measured r4: back-to-back full-headline totals of 21.5s vs
        # 27.9s, every per-query min uniformly inflated in the bad draw).
        # If the runs disagree by >30% of the min, buy more samples.
        while len(runs) < 3 or (len(runs) < 6 and max(runs) > 1.3 * min(runs)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)

    ext_timings: dict[str, float] = {}
    ext_skipped: dict[str, str] = {}
    # Budget arithmetic (r8): the budget gates RAW WALL, and the non-defer
    # block is min-of-2, so its wall is ~2x its recorded total (107 s
    # recorded -> ~215 s wall at r8's 40 core ext keys). The original
    # 240 s default therefore started skipping the ENTIRE defer tail once
    # the core block grew past ~110 s recorded — silent-ish starvation of
    # exactly the evaluation keys the tail exists to protect. 360 s keeps
    # ~2.5x headroom over the core block plus a single-sampled tail
    # (defer keys run ONCE: they are eval reports whose 2x regression
    # pins absorb single-run jitter; halving their cost is what keeps
    # them in the artifact at all).
    ext_budget = float(os.environ.get("SPARK_GRAFT_EXT_BUDGET", "480"))
    ext_t0 = time.monotonic()
    # deferrable eval keys run LAST so a budget cut can only ever hit them
    for name in sorted(EXT, key=lambda n: n in EXT_DEFER):
        if name in EXT_DEFER and time.monotonic() - ext_t0 > ext_budget:
            ext_skipped[name] = "ext_budget"
            continue
        fn = qs[name]
        n_runs = 1 if name in EXT_DEFER else 2
        runs = []
        while len(runs) < n_runs:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        ext_timings[name] = round(min(runs), 3)

    # cold-key slot: first-ever timed rows for the rotating cohort —
    # single sample, under its own independent wall budget (checked
    # before each key, so the first key always runs)
    cold_timings: dict[str, float] = {}
    cold_skipped: dict[str, str] = {}
    cold_budget = float(os.environ.get("SPARK_GRAFT_COLD_BUDGET", "240"))
    cold_t0 = time.monotonic()
    for name in COLD_KEYS:
        if name not in qs:
            cold_skipped[name] = "not_registered"
            continue
        if time.monotonic() - cold_t0 > cold_budget:
            cold_skipped[name] = "cold_budget"
            continue
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold_timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    # the ext gate only means something at the pinned scale (sf0.1 — the
    # r4 numbers were recorded there); at other SFs just record timings
    # Defer keys are single-sampled (n_runs=1), so one GC/host-jitter
    # spike would trip the min-of-2 gate spuriously; they get an
    # explicitly widened 3x bound and their entries are tagged
    # single_run so the artifact shows which rows lack a second sample.
    def _ext_gate(name: str) -> float:
        # single-sampled rows (defer tail) and single-sample PINS (the
        # graduated r10 cohort) both get the widened 3x bound
        return 3.0 if name in EXT_DEFER or name in EXT_SINGLE_PIN else 2.0

    ext_regressions = (
        {
            name: {
                "sec": t,
                "pin_sec": EXT_BASELINE[name],
                "ratio": round(t / EXT_BASELINE[name], 2),
                "single_run": name in EXT_DEFER,
            }
            for name, t in ext_timings.items()
            if name in EXT_BASELINE and t > _ext_gate(name) * EXT_BASELINE[name]
        }
        if sf == 0.1
        else {}
    )
    # Two artifacts (r6 verdict item 5: BENCH_r04..06 recorded
    # "parsed": null because one giant stdout line — headline + 44 ext
    # ops + 1400 s of stress evidence — overflowed the driver's parser):
    #   stdout  — the COMPACT driver-contract line only (headline queries
    #             + value + a 3-field ext summary), ~1.5 KB like r1-r3.
    #   BENCH_FULL.json — everything (per-ext-op timings, regression
    #             details, the scale_stress blocks), written next to
    #             this script for the judge / PLANS.md.
    full = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "ext_total_wall": round(sum(ext_timings.values()), 3),
        "ext_queries": ext_timings,
        "ext_regressions": ext_regressions,
        "ext_skipped": ext_skipped,
        "cold_queries": cold_timings,
        "cold_skipped": cold_skipped,
        "sf": sf,
    }

    # ×10 stress evidence — only at the top shipped SF (the surrogate
    # builders replicate $SPARK_GRAFT_SF_DIR; running them against the
    # tiny SFs would record numbers dominated by fixed overhead)
    if os.environ.get("SPARK_GRAFT_STRESS", "1") != "0" and sf == 0.1:
        full["scale_stress"] = run_scale_stress(spark)

    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
    with open(full_path, "w") as fh:
        json.dump(full, fh, indent=1)

    compact = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "ext_total_wall": full["ext_total_wall"],
        "ext_ops": len(ext_timings),
        "ext_regressions": sorted(ext_regressions),
        "ext_skipped": sorted(ext_skipped),
        "cold_ops": len(cold_timings),
        "cold_skipped": sorted(cold_skipped),
        "full_artifact": "BENCH_FULL.json",
    }
    print(json.dumps(compact))


def run_scale_stress(spark) -> dict:
    # 900 → 1400 in r6: the exact_tier_x20 block adds ~5-6 min (two ×20
    # runs + same-plan bases); doc_ext keeps its between-key deadline, so
    # the suite still truncates VISIBLY rather than blowing the wall
    budget = float(os.environ.get("SPARK_GRAFT_STRESS_BUDGET", "1400"))
    t_start = time.monotonic()
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    import ext_stress
    import relational_stress
    import scale_stress

    blocks = {
        "neardup_x10": scale_stress.collect,
        "relational_x10": relational_stress.collect,
        "ivf_k_scaling_x10": ext_stress.collect_k_scaling,
        # the incremental-vs-rebuild index maintenance row (r8): the add
        # must cost batch-shaped work, never corpus-shaped work
        "ann_incr_ingest_x10": ext_stress.collect_incremental_ingest,
        # many-bands range join (r8): grid equi-join vs the forced NLJ on
        # x10 events × 20k bands — the dispatch's reason, measured
        "range_join_bands_x10": ext_stress.collect_range_join_bands,
        # the exact-tier high-multiple row (r6): registered dispatcher at
        # ×20 — bitmap→count-join flip + mass-derived exchange width
        "exact_tier_x20": lambda s: scale_stress.collect_exact_tier(s, 20),
        # the doc tier grew to 13 keys in r5 (~10 min of x10 runs at full
        # length): it consumes whatever budget the earlier blocks left,
        # truncating VISIBLY per key instead of blowing the suite wall
        "doc_ext_x10": lambda s: ext_stress.collect_doc_ext(
            s, deadline_sec=max(60.0, budget - (time.monotonic() - t_start))
        ),
    }
    report: dict[str, object] = {}
    for name, fn in blocks.items():
        if time.monotonic() - t_start > budget:
            report[name] = {"skipped_budget": True}
            continue
        try:
            report[name] = fn(spark)
        except Exception as exc:  # fail-soft: the headline contract survives
            report[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
    report["suite_wall_sec"] = round(time.monotonic() - t_start, 1)
    return report


if __name__ == "__main__":
    main()
