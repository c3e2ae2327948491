"""Physical-plan regression guards: the claims PLANS.md makes about the
executed plans, asserted so they cannot silently regress.

Each assertion is a property a 100 TB run depends on — filter pushdown,
column pruning, two-phase hash aggregation, broadcast placement — not a
golden-plan string (those churn with Spark versions)."""

from __future__ import annotations

import pytest

from vacancy_analyser_spark.plans import queries

QS = queries()


def _plan(spark, sf_dir, name: str) -> str:
    df = QS[name](spark, sf_dir)
    # collect(), NOT a sink write: a write runs a SEPARATE QueryExecution,
    # leaving the Dataset's own plan at isFinalPlan=false (static, pre-AQE)
    # — probed; collect drives this Dataset's execution so the string below
    # is the FINAL adaptive plan. Outputs at the test SF are all bounded.
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # when the TOP-LEVEL plan is adaptive it must be finalized; nested
    # adaptive plans (e.g. a DPP pruning subquery) legitimately print
    # isFinalPlan=false inside the string, and exchange-free plans (pure
    # scan-side queries) carry no AdaptiveSparkPlan wrapper at all
    first = plan.splitlines()[0]
    if first.startswith("AdaptiveSparkPlan"):
        assert first.endswith("isFinalPlan=true")
    # the adaptive plan string appends an "== Initial Plan ==" section —
    # keep only the final section so scan/operator counts aren't doubled
    return plan.split("== Initial Plan ==")[0]


def _static_plan(spark, sf_dir, name: str) -> str:
    """The pre-AQE physical plan — for asserting STATIC properties
    (pushdown placement, scan columns) on queries whose final adaptive
    plan collapses at the tiny test SF (an empty runtime stage propagates
    to EmptyRelation, erasing the subtree the assertion targets)."""
    df = QS[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown_and_partial_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # constant filter reaches scan
    assert "partial_sum" in plan  # map-side combine before exchange
    assert "SortAggregate" not in plan


def test_pricing_summary_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    scan = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_comment" not in scan and "l_orderkey" not in scan


def test_skill_freq_broadcasts_taxonomy(spark, sf_dir):
    plan = _plan(spark, sf_dir, "skill_freq")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # the dim must never shuffle the fact


def test_minhash_signature_agg_is_hash_not_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "minhash_lsh_dedup")
    assert "SortAggregate" not in plan  # numeric min keeps codegen HashAggregate


def test_asof_uses_window_group_limit(spark, sf_dir):
    plan = _plan(spark, sf_dir, "asof_state_at_date")
    assert "WindowGroupLimit" in plan  # rank-limit pushdown before the exchange
    assert "LessThanOrEqual(ts," in plan  # as-of bound in the nanos domain


def test_snapshot_merge_pushes_both_windows(spark, sf_dir):
    plan = _plan(spark, sf_dir, "snapshot_merge")
    assert plan.count("GreaterThanOrEqual(ts,") >= 2  # both snapshot bounds pushed


def test_flagship_never_python(spark, sf_dir):
    # whole pipeline is JVM-side: no Arrow eval, no Python runner in the plan
    plan = _plan(spark, sf_dir, "flagship_region_share")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_large_order_customers_scans_lineitem_once(spark, sf_dir):
    # the IN-subquery + re-aggregate form would scan lineitem twice; the
    # decorrelated plan aggregates once and reuses the row
    plan = _plan(spark, sf_dir, "large_order_customers")
    assert plan.count("lineitem.parquet") == 1
    assert "partial_sum" in plan  # map-side combine before the group shuffle


def test_small_qty_revenue_broadcasts_thresholds(spark, sf_dir):
    # per-part thresholds and the brand dim both ride broadcast joins — the
    # fact side never shuffles to meet them
    plan = _plan(spark, sf_dir, "small_qty_revenue")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "EqualTo(p_brand,Brand#11)" in plan  # brand filter reaches the part scan


def test_idle_rich_customers_anti_join_prefiltered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "idle_rich_customers")
    assert "LeftAnti" in plan  # NOT EXISTS decorrelated to anti join
    # the scalar avg rides a 1-row broadcast nested loop, not a shuffle
    assert "BroadcastNestedLoopJoin" in plan
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan  # anti side filtered at scan


def test_top_supplier_revenue_single_lineitem_scan(spark, sf_dir):
    # the per-supplier revenue is persisted and BOTH consumers (the 1-row
    # MAX reduce and the filtered output) read the cache — lineitem is
    # materialized once, and no unpartitioned window serializes |supplier|
    plan = _plan(spark, sf_dir, "top_supplier_revenue")
    cache_scans = plan.count("TableCacheQueryStage") + plan.count("InMemoryTableScan")
    assert cache_scans >= 2, plan
    # every lineitem mention sits inside the cached subtree's printed plan
    # (2 per cache scan); an extra uncached scan would push this past 4
    assert plan.count("lineitem.parquet") <= 2 * cache_scans
    assert "Window" not in plan


def test_disjunctive_filter_partial_pushdown(spark, sf_dir):
    # Catalyst factors the OR-of-ANDs: quantity-only disjunction reaches the
    # lineitem scan, brand/size disjunction reaches the part scan
    plan = _plan(spark, sf_dir, "disjunctive_filter_revenue")
    li_scan = [s for s in plan.split("FileScan parquet ") if "lineitem.parquet" in s][0]
    part_scan = [s for s in plan.split("FileScan parquet ") if "part.parquet" in s][0]
    assert "l_quantity" in li_scan.split("DataFilters: ")[1].split("]")[0]
    assert "p_brand" in part_scan.split("DataFilters: ")[1].split("]")[0]


def test_nation_trade_volume_role_playing_dims(spark, sf_dir):
    # nation joins twice under different roles; the pair disjunction is
    # factored into an n_name IN-filter pushed to BOTH nation scans.
    # Static plan: pushdown is decided before AQE, and the empty result at
    # this SF collapses the final plan to EmptyRelation
    plan = _static_plan(spark, sf_dir, "nation_trade_volume")
    assert plan.count("nation.parquet") == 2
    assert plan.count("NATION_1") >= 2 and plan.count("NATION_2") >= 2


def test_promo_revenue_share_one_pass(spark, sf_dir):
    # numerator and denominator come from ONE scan+join, not a union of two
    plan = _plan(spark, sf_dir, "promo_revenue_share")
    assert plan.count("lineitem.parquet") == 1
    assert "GreaterThanOrEqual(l_shipdate" in plan  # band pushed to scan
    assert "Union" not in plan


def test_local_supplier_volume_broadcasts_dims(spark, sf_dir):
    # the c_nationkey = s_nationkey cross-path equality rides broadcast
    # joins; only the fact-side joins exchange
    plan = _plan(spark, sf_dir, "local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "GreaterThanOrEqual(o_orderdate" in plan  # year band at the scan


def test_waiting_suppliers_single_lineitem_scan(spark, sf_dir):
    # both per-order stats come from one window pass — never the
    # aggregate-and-join-back double scan the oracle SQL does
    plan = _plan(spark, sf_dir, "waiting_suppliers")
    assert plan.count("lineitem.parquet") == 1
    # top-10 without a global sort is a STATIC planning property — at this
    # SF the final adaptive plan specializes the ordered limit away (the
    # aggregate yields fewer rows than the limit)
    assert "TakeOrderedAndProject" in _static_plan(spark, sf_dir, "waiting_suppliers")


def test_market_share_pruned_before_fact_join(spark, sf_dir):
    # p_type reaches the part scan; lineitem is scanned once for both the
    # gated numerator and the denominator
    plan = _plan(spark, sf_dir, "market_share")
    assert "EqualTo(p_type,ECONOMY)" in plan
    assert plan.count("lineitem.parquet") == 1
    assert "Union" not in plan


def test_returned_item_report_scan_filters_and_topk(spark, sf_dir):
    plan = _plan(spark, sf_dir, "returned_item_report")
    assert "EqualTo(l_returnflag,R)" in plan  # flag pushed to lineitem scan
    assert "TakeOrderedAndProject" in plan  # LIMIT 20 as TopK, not full sort


def test_order_priority_check_semi_join(spark, sf_dir):
    # EXISTS decorrelates to a semi join carrying the non-equi lateness
    # conjunct; no row duplication, no aggregate-side dedup
    plan = _plan(spark, sf_dir, "order_priority_check")
    assert "LeftSemi" in plan


def test_forecast_revenue_change_all_filters_at_scan(spark, sf_dir):
    # Q6 shape is a pure pushdown test: no join anywhere, and every band
    # predicate prunes at the parquet scan
    plan = _plan(spark, sf_dir, "forecast_revenue_change")
    assert "Join" not in plan
    # PushedFilters prints truncated; the shipdate bound is visible there,
    # the discount/quantity bands in the Filter node that feeds the scan
    assert "GreaterThanOrEqual(l_shipda" in plan
    assert ">= 0.05)" in plan and "< 24.0)" in plan
    scan = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_orderkey" not in scan  # projection pruned to the 4 used cols


def test_product_type_profit_three_broadcast_dims(spark, sf_dir):
    # part/supplier/nation are broadcast; the only exchange is li⋈orders
    plan = _plan(spark, sf_dir, "product_type_profit")
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("lineitem.parquet") == 1


def test_parts_supplier_relationship_anti_is_broadcast(spark, sf_dir):
    # the NOT IN denylist must be a broadcast anti probe, never an exchange
    plan = _plan(spark, sf_dir, "parts_supplier_relationship")
    assert "LeftAnti" in plan
    idx = plan.index("LeftAnti")
    assert "BroadcastHashJoin" in plan[max(0, idx - 80) : idx + 40]


def test_important_part_value_single_scan(spark, sf_dir):
    # global threshold comes from a one-row reduce of the persisted
    # per-part values — the lineitem⋈supplier subtree is materialized
    # once, not recomputed, and no unpartitioned window remains
    plan = _plan(spark, sf_dir, "important_part_value")
    cache_scans = plan.count("TableCacheQueryStage") + plan.count("InMemoryTableScan")
    assert cache_scans >= 2, plan
    assert plan.count("lineitem.parquet") <= 2 * cache_scans
    assert "Window" not in plan


def test_potential_part_promotion_semi_gates_scan(spark, sf_dir):
    # cold-part list gates lineitem BEFORE the aggregate; no join-back for
    # the per-part denominator
    plan = _plan(spark, sf_dir, "potential_part_promotion")
    assert plan.count("lineitem.parquet") == 1
    assert "StringStartsWith(p_name,cold)" in plan
    assert plan.count("LeftSemi") >= 2


def test_min_cost_supplier_prunes_before_window(spark, sf_dir):
    # part/Europe filters apply before the per-part min window; lineitem
    # aggregates once
    plan = _plan(spark, sf_dir, "min_cost_supplier")
    assert plan.count("lineitem.parquet") == 1
    assert "EqualTo(p_size,10)" in plan
    assert "Window" in plan


def test_tfidf_single_token_pass(spark, sf_dir):
    # document frequency aggregates from the tf table — tokens are
    # exploded exactly once; the corpus-size scalar rides a broadcast
    plan = _plan(spark, sf_dir, "tfidf_top_terms")
    assert "InMemoryTableScan" in plan  # df branch reads the cached tf table
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row N scalar
    assert "WindowGroupLimit" in plan  # top-5 pruned before the doc exchange


def test_frame_sample_never_reads_payload(spark, sf_dir):
    # the explosion is sized by metadata: the documents scan must carry
    # doc_id and n_chars only — text (the payload source) is pruned out
    plan = _plan(spark, sf_dir, "multimodal_frame_sample")
    scan = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "text" not in scan
    assert "n_chars" in scan


def test_feature_extract_is_arrow_batched(spark, sf_dir):
    # the Python decode path must be Arrow mapInPandas, never row-at-a-time
    plan = _plan(spark, sf_dir, "multimodal_feature_extract")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_stratified_sample_is_scanside_filter(spark, sf_dir):
    # sampling must be a predicate on the fact scan: the strata counts are
    # inlined as a literal map, so the sampled scan is one pass — no join,
    # no exchange, one documents read
    plan = _plan(spark, sf_dir, "stratified_sample")
    assert "Join" not in plan
    assert "Exchange" not in plan
    assert plan.count("documents.parquet") == 1


def test_embedding_near_dup_no_nested_loop(spark, sf_dir):
    # candidate generation is an equi-join on (band, key); the only Python
    # is the Arrow-batched signature matmul. An all-pairs nested loop over
    # the full table is the scale hazard this operator exists to avoid.
    plan = _plan(spark, sf_dir, "embedding_near_dup")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" in plan  # signature stage is Arrow-batched


def test_interval_join_is_keyed_equi_join_with_pushed_type_filters(spark, sf_dir):
    # the time range must ride an equi-join on user_id as a residual —
    # a nested-loop theta join here would be quadratic at scale; both
    # event_type equalities must reach the parquet scans
    plan = _plan(spark, sf_dir, "interval_join_attribution")
    assert "EqualTo(event_type,view)" in plan
    assert "EqualTo(event_type,click)" in plan
    assert "NestedLoop" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_lake_query_uses_dynamic_partition_pruning(spark, sf_dir):
    # the year constraint arrives only through the campaign dim join —
    # the partitioned fact scan must carry a dynamicpruning subquery
    # (reads one o_year= directory), not scan the lake and filter later
    plan = _plan(spark, sf_dir, "lake_dpp_star_join")
    assert "dynamicpruningexpression" in plan.lower(), plan


def test_sequence_pack_single_exchange(spark, sf_dir):
    # window by lang THEN rollup by (lang, bin_id) must reuse the lang
    # partitioning: one exchange total, aggregates stack exchange-free
    plan = _plan(spark, sf_dir, "sequence_pack")
    assert plan.count("Exchange hashpartitioning") == 1


def test_dataset_split_is_scanside(spark, sf_dir):
    # split assignment is Column algebra on the scan: no window, no join;
    # the only exchange carries (lang, split) partial aggregates
    plan = _plan(spark, sf_dir, "dataset_split_assign")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan
    assert "Join" not in plan


def test_corpus_prep_single_scan_no_joinback(spark, sf_dir):
    # gate → dedup → stats is one linear plan: documents scanned once,
    # dedup is a window (not aggregate-and-join-back), no join anywhere
    plan = _plan(spark, sf_dir, "corpus_prep_stats")
    assert plan.count("documents.parquet") == 1
    assert "Window" in plan
    assert "Join" not in plan


def test_semantic_dedup_pair_join_is_hash_on_centroid(spark, sf_dir):
    # the pair generator must be an equi-join on centroid_id over the
    # CACHED assignment (one assignment pass), never a nested-loop product
    plan = _plan(spark, sf_dir, "semantic_dedup")
    pair_section = plan.split("InMemoryTableScan")[0]
    assert "BroadcastHashJoin [centroid_id" in pair_section or "SortMergeJoin [centroid_id" in pair_section
    assert "InMemoryTableScan" in plan  # both sides read the persisted assignment
    assert "CartesianProduct" not in plan


def test_funnel_stage_filters_reach_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "funnel_conversion")
    # each stage's event_type predicate is pushed into its parquet scan
    for etype in ("view", "click", "purchase"):
        assert f"EqualTo(event_type,{etype})" in plan
    assert "WindowExec" not in plan  # ratio step is a join, not a window


def test_zscore_stats_join_is_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "value_zscore_outliers")
    assert "BroadcastHashJoin [event_type" in plan
    # the fact side is never exchanged: the only hashpartitioning exchange
    # carries the 5-row per-type stats aggregate
    import re

    fact_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "event_type" not in ln
    ]
    assert not fact_exchanges


def test_bigram_lm_reuses_pair_shuffle(spark, sf_dir):
    # c(w1,·) must re-aggregate the (w1,w2) count shuffle, not rescan the corpus
    plan = _plan(spark, sf_dir, "bigram_lm_table")
    assert "ReusedExchange" in plan
    assert plan.count("FileScan parquet") == 1


def test_unigram_logprob_single_corpus_shuffle_reuse(spark, sf_dir):
    plan = _plan(spark, sf_dir, "unigram_logprob_score")
    assert "ReusedExchange" in plan  # model shares the token shuffle
    assert "BroadcastHashJoin [w" in plan  # model joins back broadcast


def test_capped_jaccard_cap_applied_semi_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ngram_jaccard_capped")
    # r5 shape: the df cap is applied ONCE — a semi-join against the
    # rare-shingle set building the shared capped table, which is cached
    # and re-probed for the regime dispatch; every pair plan (and the
    # size aggregate) reads that cache, so the cap reaches all consumers
    # through one application instead of per-consumer semi-joins
    assert "LeftSemi" in plan
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan


def test_multiprobe_distinct_after_threshold(spark, sf_dir):
    # the pair dedup exchange must run AFTER the sim>=tau filter (bounded
    # by true pairs), and the pair join stays an equi-join over the cache
    plan = _plan(spark, sf_dir, "semantic_dedup_multiprobe")
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan
    # the aggregate implementing distinct() groups the post-filter output
    head = plan.split("InMemoryTableScan")[0]
    assert "HashAggregate(keys=[a_id" in head or "HashAggregate(keys=[vec_id" in head


def test_drift_by_day_fact_never_exchanged(spark, sf_dir):
    plan = _plan(spark, sf_dir, "value_drift_by_day")
    assert "BroadcastHashJoin [event_type" in plan
    # only aggregate-sized frames shuffle: every hashpartitioning exchange
    # carries a grouping key, never raw event rows
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "event_type" in ln


def test_active_users_rollup_partial_combines(spark, sf_dir):
    plan = _plan(spark, sf_dir, "active_users_rollup")
    # per-granularity distinct aggregates must partial-combine before the
    # exchange (the shuffle carries distinct (user, bucket) pairs)
    assert plan.count("HashAggregate") >= 6
    assert "CartesianProduct" not in plan


def _forced_broadcasts(df) -> int:
    """Count forced broadcast() hints surviving in the optimized logical
    plan. A hint is a promise the side is bounded at ANY scale — only
    schema-bounded dims (region, nation, taxonomy, 1-row scalars) may
    carry one. AQE-chosen broadcasts (BroadcastHashJoin in the physical
    plan without a hint) are fine: they re-decide from runtime sizes."""
    return df._jdf.queryExecution().optimizedPlan().toString().count("strategy=broadcast")


def test_jaccard_sparse_paths_never_hint_doc_scaled_sides(spark, sf_dir):
    """The per-document sizes of the Jaccard family ride the shingle rows
    (window + first()) — r3 verdict's scale-killer: a broadcast sizes
    table is one row per corpus document, an OOM-by-construction at
    100 TB. No plan in the sparse family may carry any broadcast hint."""
    from vacancy_analyser_spark.plans.dedup import (
        _doc_bigrams,
        _jaccard_countjoin,
        _jaccard_ppjoin,
    )

    g = _doc_bigrams(spark, sf_dir)
    assert _forced_broadcasts(_jaccard_countjoin(g)) == 0
    assert _forced_broadcasts(_jaccard_ppjoin(g)) == 0


def test_containment_and_incremental_never_hint_doc_scaled_sides(spark, sf_dir):
    """Like the Jaccard family above: the SPARSE containment plans must
    carry no hint (the registered query may dispatch to the bitmap plan,
    whose broadcast of the packed table is gated by MAX_BITMAP_DOCS —
    a planner-bounded side, the same exemption _jaccard_bitmap has)."""
    from vacancy_analyser_spark.plans.dedup import (
        _containment_countjoin,
        _containment_ppjoin,
        _doc_bigrams,
    )

    g = _doc_bigrams(spark, sf_dir)
    assert _forced_broadcasts(_containment_countjoin(g)) == 0
    assert _forced_broadcasts(_containment_ppjoin(g)) == 0
    assert _forced_broadcasts(QS["incremental_dedup"](spark, sf_dir)) == 0


def test_sf_scaling_joins_carry_no_hint(spark, sf_dir):
    """customer and part scale with SF — the join discipline
    (plans/joins.py header) says they get NO hint; AQE promotes them to
    broadcast from runtime sizes at small SF, sort-merge at 100 TB."""
    assert _forced_broadcasts(QS["employer_enrich_join"](spark, sf_dir)) == 0
    assert _forced_broadcasts(QS["broadcast_synonym_join"](spark, sf_dir)) == 0
    # ...and at the test SF, AQE must still pick the broadcast at runtime,
    # proving dropping the hint costs nothing where broadcasting is right.
    df = QS["broadcast_synonym_join"](spark, sf_dir)
    df.collect()
    assert "BroadcastHashJoin" in df._jdf.queryExecution().executedPlan().toString()


def test_tfidf_cosine_pairs_candidates_are_term_bucketed(spark, sf_dir):
    """The sparse-cosine pair join must be an equi-join on the shared
    term (bucketed candidates, like every pair generator in the engine),
    never a cross product; and no forced broadcast hint on the
    doc-scaled norms table."""
    df = QS["tfidf_cosine_pairs"](spark, sf_dir)
    assert _forced_broadcasts(df) == 0
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan


def test_ivfpq_no_full_corpus_float_stage(spark, sf_dir):
    """IVFPQ serving: the only stage that touches embedding floats after
    encoding is the PQ_SHORTLIST re-rank — the ADC aggregate runs over
    integer codes. No CartesianProduct anywhere (the scalar q_emb
    crossJoins compile to BroadcastNestedLoopJoin over 1-row sides), and
    the probed-bucket restriction is a semi-join in the plan."""
    df = QS["ann_ivfpq_topk"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan  # codes ⋉ probed bucket ids / rerank ⋉ shortlist


def test_corpus_lake_scan_prunes_partitions_and_text(spark, sf_dir):
    """The lang IN-filter must become STATIC partition pruning on the
    lang-partitioned documents lake (PartitionFilters carries lang), and
    the census must never read the text column."""
    plan = _static_plan(spark, sf_dir, "corpus_lake_pruned_scan")
    pf = plan.split("PartitionFilters: ")[1].splitlines()[0]
    assert "lang" in pf and ("IN" in pf.upper() or "in(" in pf)
    scan = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "text" not in scan


def test_bucketed_incremental_skips_corpus_shuffle_and_sort(spark, sf_dir):
    """The bucketed-corpus serving key must (a) feed the candidate
    SortMergeJoin with exactly ONE bh-keyed Exchange — the increment's;
    the bucketed corpus scan's output partitioning satisfies the join,
    so its branch carries none, while the flat merge-hinted equivalent
    needs TWO — and (b) return exactly the flat registered key's rows
    (layout independence, the same contract the lake/DPP key pins)."""
    import re

    from pyspark.sql import functions as F

    from vacancy_analyser_spark.functions.text import tokens
    from vacancy_analyser_spark.io import load_table
    from vacancy_analyser_spark.plans.dedup import (
        INCREMENT_SOURCE,
        _bigrams,
        incremental_dedup,
        incremental_dedup_bucketed,
    )

    df = incremental_dedup_bucketed(spark, sf_dir)
    rows = {(r["new_id"], r["corpus_id"], r["jaccard"]) for r in df.collect()}
    flat = {
        (r["new_id"], r["corpus_id"], r["jaccard"])
        for r in incremental_dedup(spark, sf_dir).collect()
    }
    assert rows == flat

    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in plan
    bucketed_exchanges = len(re.findall(r"Exchange hashpartitioning\(bh#", plan))
    assert bucketed_exchanges == 1, plan

    # the flat merge-hinted equivalent shuffles BOTH sides on bh
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "source", tokens("text").alias("toks"))
    gh = toks.select(
        "doc_id", "source", F.explode(F.array_distinct(_bigrams("toks"))).alias("bigram")
    ).select("doc_id", "source", F.xxhash64("bigram").alias("bh"))
    a = gh.filter(F.col("source") == INCREMENT_SOURCE).alias("a")
    b = gh.filter(F.col("source") != INCREMENT_SOURCE).alias("b")
    flat_inter = (
        a.join(b.hint("merge"), F.col("a.bh") == F.col("b.bh"))
        .groupBy(F.col("a.doc_id"), F.col("b.doc_id"))
        .agg(F.count("*").alias("n"))
    )
    flat_inter.collect()
    flat_plan = (
        flat_inter._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    )
    flat_exchanges = len(re.findall(r"Exchange hashpartitioning\(bh#", flat_plan))
    assert flat_exchanges == 2, flat_plan


def test_skew_salted_enrich_salts_the_exchange(spark, sf_dir):
    """The salted join must actually partition on (key, salt) — that IS the
    skew mitigation — and stay a distributed join (merge pin), since a
    broadcast would erase the salted Exchange the operator exists for."""
    plan = _plan(spark, sf_dir, "skew_salted_enrich")
    assert "SortMergeJoin" in plan
    salted_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "__salt" in ln and "event_type" in ln
    ]
    assert len(salted_exchanges) >= 2  # both sides shuffle on (key, salt)
