"""Tests for the physical-layer decisions: fixed-point money aggregation,
nanos-domain time-filter pushdown, and the dedup building blocks.

These encode *intent* the oracle-parity suite cannot: parity proves the
current data agrees, these prove the mechanisms (rounding behavior, filter
placement, bit packing) hold on adversarial inputs.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from vacancy_analyser_spark.functions.numeric import davg, davg_sql, dsum, dsum_sql
from vacancy_analyser_spark.functions.text import tokens
from vacancy_analyser_spark.io import load_table
from vacancy_analyser_spark.plans.dedup import _bigrams


# --- fixed-point aggregation -------------------------------------------------

ADVERSARIAL_MONEY = [
    0.07,  # classic binary-unrepresentable cent value
    123.455,  # odd digit at the rounding boundary
    -0.000001,  # smallest negative at scale 6
    0.0000005,  # half-way at the 6th decimal
    -98765.432101,
    1e9 + 0.25,
    0.1 + 0.2,  # 0.30000000000000004
    None,
]


def test_dsum_davg_match_duckdb_decimal_semantics(spark):
    df = spark.createDataFrame([(v,) for v in ADVERSARIAL_MONEY], "x double")
    got = df.agg(dsum("x").alias("s"), davg("x").alias("a")).collect()[0]
    con = duckdb.connect()
    vals = ", ".join("(NULL)" if v is None else f"({v!r})" for v in ADVERSARIAL_MONEY)
    want = con.sql(
        f"SELECT {dsum_sql('x')} AS s, {davg_sql('x')} AS a FROM (VALUES {vals}) t(x)"
    ).fetchone()
    assert got["s"] == want[0]  # bit-for-bit, not approx
    assert got["a"] == want[1]


def test_dsum_is_partitioning_invariant(spark):
    rows = [(float(i) * 0.000003,) for i in range(1, 500)]
    df1 = spark.createDataFrame(rows, "x double").repartition(1)
    df7 = spark.createDataFrame(rows, "x double").repartition(7)
    assert df1.agg(dsum("x")).collect() == df7.agg(dsum("x")).collect()


# --- ts_filters pushdown -----------------------------------------------------


def test_ts_filters_match_post_conversion_filter(spark, sf_dir):
    lo, hi = "2024-01-05 00:00:00", "2024-01-20 00:00:00"
    pushed = load_table(spark, sf_dir, "events", ts_filters=[("ts", ">=", lo), ("ts", "<", hi)])
    naive = load_table(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit(lo).cast("timestamp")) & (F.col("ts") < F.lit(hi).cast("timestamp"))
    )
    assert pushed.count() == naive.count()
    assert sorted(r["event_id"] for r in pushed.select("event_id").collect()) == sorted(
        r["event_id"] for r in naive.select("event_id").collect()
    )


def test_ts_filters_reach_parquet_scan(spark, sf_dir):
    pushed = load_table(
        spark, sf_dir, "events", ts_filters=[("ts", ">=", "2024-01-05 00:00:00")]
    )
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(ts," in plan.split("PushedFilters")[1].split("]")[0]


def test_ts_filters_on_native_timestamp_column(spark, sf_dir):
    # lineitem.l_shipdate is a real timestamp column — the same API must
    # filter it without the nanos translation.
    df = load_table(
        spark, sf_dir, "lineitem", ts_filters=[("l_shipdate", "<=", "1998-01-01 00:00:00")]
    )
    mx = df.agg(F.max("l_shipdate").cast("string")).collect()[0][0]
    assert mx is not None and mx <= "1998-01-01 00:00:00"


# --- dedup building blocks ---------------------------------------------------


@pytest.mark.parametrize(
    ("text", "expected"),
    [
        ("a b c", ["a b", "b c"]),
        ("  A \n B  ", ["a b"]),  # normalization folds case + whitespace
        ("solo", []),
        ("", []),
        ("чёрный кот спит", ["чёрный кот", "кот спит"]),  # unicode survives
    ],
)
def test_bigrams_edges(spark, text, expected):
    df = spark.createDataFrame([(text,)], "text string").select(
        tokens("text").alias("toks")
    )
    got = df.select(_bigrams("toks").alias("b")).collect()[0]["b"]
    assert got == expected


def test_jaccard_bitmap_matches_bruteforce(spark, sf_dir, monkeypatch):
    """The vocab-bitmap plan must equal a literal per-pair set Jaccard."""
    from vacancy_analyser_spark.plans.dedup import ngram_jaccard_dedup

    got = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in ngram_jaccard_dedup(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    import re

    sets = {}
    for row in docs:
        toks = re.sub(r"\s+", " ", row["text"].lower()).strip().split(" ")
        sets[row["doc_id"]] = {f"{a} {b}" for a, b in zip(toks, toks[1:])}
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union and inter / union >= 0.5:
                want[(a, b)] = inter / union
    assert got == pytest.approx(want)


def test_jaccard_regime_paths_agree(spark, sf_dir):
    """The density-regime chooser is a planner rule, not a semantic switch:
    all three physical plans (bitmap, count-join, prefix-filtered
    count-join) must return identical pairs and values — the dense fixture
    corpus is the WORST case for the prefix filter (no shingle is rare),
    so agreement here exercises its pruning guarantee hardest."""
    from vacancy_analyser_spark.plans.dedup import (
        _doc_bigrams,
        _jaccard_bitmap,
        _jaccard_countjoin,
        _jaccard_ppjoin,
    )

    g = _doc_bigrams(spark, sf_dir).persist()
    n_vocab = g.select("bigram").distinct().count()
    bitmap = sorted(map(tuple, _jaccard_bitmap(g, n_vocab).collect()))
    countjoin = sorted(map(tuple, _jaccard_countjoin(g).collect()))
    ppjoin = sorted(map(tuple, _jaccard_ppjoin(g).collect()))
    g.unpersist()
    assert bitmap == countjoin
    assert ppjoin == countjoin
    assert len(bitmap) > 0  # the fixture corpus does contain near-dups


def test_ppjoin_prunes_frequent_head_but_keeps_all_pairs(spark):
    """On a corpus with stopword-like head shingles shared by MANY docs,
    the prefix filter must still find exactly the true near-dup pairs:
    the head shingles sort last (highest df) and fall outside every
    prefix, yet verified Jaccard values still count them."""
    from pyspark.sql import functions as FF

    from vacancy_analyser_spark.plans.dedup import _jaccard_countjoin, _jaccard_ppjoin

    # 40 docs in 20 near-dup pairs: 10 pair-specific shingles, odd member
    # deviates on 2; PLUS 5 head shingles present in every doc
    rows = []
    for d in range(40):
        pair = d // 2
        for j in range(10):
            if d % 2 == 1 and j < 2:
                rows.append((d, f"dev-{d}-{j}"))
            else:
                rows.append((d, f"pair-{pair}-{j}"))
        for h in range(5):
            rows.append((d, f"head-{h}"))
    g = spark.createDataFrame(rows, "doc_id long, bigram string")
    pp = sorted(map(tuple, _jaccard_ppjoin(g).collect()))
    cj = sorted(map(tuple, _jaccard_countjoin(g).collect()))
    assert pp == cj
    # within-pair J = (8+5)/(15+15-13) = 13/17 ≈ 0.76 ≥ 0.5 → 20 pairs;
    # cross-pair J = 5/25 = 0.2 < 0.5 → none
    assert len(pp) == 20
    assert all(abs(j - 13 / 17) < 1e-9 for _, _, j in pp)
    # and the pruning is real: candidate generation must exclude head-only
    # collisions — every doc pairs with every other via heads (780 pairs)
    # but only 20 survive; the prefix join must not have enumerated the 780
    from vacancy_analyser_spark.plans.dedup import JACCARD_T

    gh = g.select("doc_id", FF.xxhash64("bigram").alias("bh"))
    sizes = gh.groupBy("doc_id").agg(FF.count("*").alias("n"))
    df_tbl = gh.groupBy("bh").agg(FF.count("*").alias("df"))
    from pyspark.sql import Window as W

    ranked = (
        gh.join(df_tbl, "bh")
        .join(sizes, "doc_id")
        .withColumn("rn", FF.row_number().over(W.partitionBy("doc_id").orderBy("df", "bh")))
    )
    prefix = ranked.filter(FF.col("rn") <= FF.col("n") - FF.ceil(FF.lit(JACCARD_T) * FF.col("n")) + 1)
    # no head shingle may appear in any prefix (df=40 → sorts last)
    assert prefix.filter(FF.col("df") == 40).count() == 0


def test_sparse_dispatcher_flips_on_head_weight(spark):
    """The df-skew probe must pick count-join on rare-shingle corpora and
    the prefix filter once candidate volume per doc turns quadratic."""
    from vacancy_analyser_spark.plans.dedup import (
        _jaccard_countjoin,
        _jaccard_ppjoin,
        _sparse_plan_for,
    )

    # rare shingles: df<=2 everywhere → few candidates → count-join
    light = spark.createDataFrame(
        [(d, f"s-{d // 2}-{j}") for d in range(100) for j in range(10)],
        "doc_id long, bigram string",
    )
    assert _sparse_plan_for(light) is _jaccard_countjoin

    # one corpus-wide head shingle set: df=n_docs → quadratic candidates.
    # 3000 docs × 30 heads → 30×(3000 choose 2) ≈ 135M rows ≈ 45k/doc
    heavy = light.union(
        spark.createDataFrame(
            [(d, f"head-{h}") for d in range(3000) for h in range(30)],
            "doc_id long, bigram string",
        )
    )
    assert _sparse_plan_for(heavy) is _jaccard_ppjoin


def test_bitmap_dispatch_gates_on_doc_count(spark):
    """A huge corpus with a tiny shared vocabulary (log lines) must NOT take
    the bitmap plan just because the vocab fits: its pair loop is O(|docs|²)
    over a broadcast table. The dispatch flips to the shuffling count-join
    past MAX_BITMAP_DOCS — and both plans stay result-identical on exactly
    the many-docs/tiny-vocab shape that triggers the flip."""
    from vacancy_analyser_spark.plans import dedup as D

    # the rule itself: vocab gate alone is not enough
    assert D._dense_regime(n_vocab=100, n_docs=D.MAX_BITMAP_DOCS)
    assert not D._dense_regime(n_vocab=100, n_docs=D.MAX_BITMAP_DOCS + 1)
    assert not D._dense_regime(n_vocab=D.MAX_BITMAP_VOCAB + 1, n_docs=100)
    # the cost gate rejects a corpus both absolute ceilings admit: 10k docs
    # x 2,790 vocab (44 words) = 4.4e9 word-ops measured at 80s vs the
    # count-join's 4.4s (tools/scale_stress.py x2 surrogate)
    assert not D._dense_regime(n_vocab=2_790, n_docs=10_000)
    assert D._dense_regime(n_vocab=931, n_docs=5_000)  # the sf0.1 corpus

    # many docs, 30-shingle vocabulary: every doc holds 10 of 30 shingles
    rows = [
        (d, f"v-{(d * 7 + j) % 30}")
        for d in range(300)
        for j in range(10)
    ]
    g = spark.createDataFrame(rows, "doc_id long, bigram string").persist()
    n_vocab = g.select("bigram").distinct().count()
    assert n_vocab <= 30  # tiny vocab — the OLD dispatch would take the bitmap
    bitmap = sorted(map(tuple, D._jaccard_bitmap(g, n_vocab).collect()))
    countjoin = sorted(map(tuple, D._jaccard_countjoin(g).collect()))
    g.unpersist()
    assert bitmap == countjoin
    assert len(bitmap) > 0  # modular shingle reuse does create true pairs


def test_countjoin_df_cap_inactive_is_exact(spark, sf_dir):
    """max_df above the corpus's max document frequency must leave the
    count-join's result byte-identical to the uncapped plan — the cap is
    a head mitigation, never a silent approximation when inactive."""
    from vacancy_analyser_spark.plans import dedup as D

    g = D._doc_bigrams(spark, sf_dir).persist()
    g.count()
    uncapped = sorted(map(tuple, D._jaccard_countjoin(g).collect()))
    capped = sorted(map(tuple, D._jaccard_countjoin(g, max_df=10**9).collect()))
    assert capped == uncapped
    assert len(uncapped) > 0
    g.unpersist()


def test_countjoin_df_cap_drops_head_pairs_only(spark):
    """With a real head: 3 docs share one universal shingle; two of them
    are near-dups through rare shingles. Capping at df<=2 removes the
    universal shingle from all sets — the rare-shingle pair survives with
    its capped-set Jaccard, the head-only pair disappears."""
    from vacancy_analyser_spark.plans import dedup as D
    from pyspark.sql import functions as F

    rows = [
        (1, "head"), (2, "head"), (3, "head"),  # universal shingle df=3
        (1, "r1"), (1, "r2"), (2, "r1"), (2, "r2"),  # docs 1,2 share rare
        (3, "z9"),
    ]
    g = spark.createDataFrame(rows, "doc_id long, bigram string")
    capped = {
        (r["a_id"], r["b_id"], r["jaccard"])
        for r in D._jaccard_countjoin(g, max_df=2).collect()
    }
    # capped sets: 1->{r1,r2}, 2->{r1,r2}, 3->{z9}: only (1,2) at J=1.0
    assert capped == {(1, 2, 1.0)}
    uncapped = {(r["a_id"], r["b_id"]) for r in D._jaccard_countjoin(g).collect()}
    assert (1, 2) in uncapped


def test_ntile_dispatch_paths_agree(spark, sf_dir, monkeypatch):
    """The ntile size dispatcher is a physical choice only: the plain
    ntile() window (small-n path, taken at every test SF) and the 4-pass
    boundary-band plan (forced here by zeroing the threshold) must return
    identical tiles, counts, and fixed-point sums."""
    from vacancy_analyser_spark.plans import analytic_windows as AW

    small = sorted(map(tuple, AW.ntile_quartiles(spark, sf_dir).collect()))
    monkeypatch.setattr(AW, "_NTILE_SMALL_N", 0)
    large = sorted(map(tuple, AW.ntile_quartiles(spark, sf_dir).collect()))
    assert small == large
    assert len(small) == 4


def test_countjoin_width_rule_is_result_identical_and_mass_gated(spark, monkeypatch):
    """The corpus-mass exchange-width branch (r6): widened plans must be
    byte-identical in RESULT to the stock count-join, the dispatcher must
    return a widened plan only past the mass threshold, and the widened
    plan must actually carry the width into its exchanges."""
    import functools

    from pyspark.sql import functions as FF

    from vacancy_analyser_spark.plans import dedup
    from vacancy_analyser_spark.plans.dedup import (
        _countjoin_pairs,
        _jaccard_countjoin,
        _sparse_plan_for,
    )

    g = spark.createDataFrame(
        [(d, f"s-{(d + j) % 37}") for d in range(60) for j in range(8)],
        "doc_id long, bigram string",
    )
    stock = sorted(map(tuple, _jaccard_countjoin(g).collect()))
    wide = sorted(map(tuple, _jaccard_countjoin(g, shuffle_width=7).collect()))
    assert stock == wide and len(stock) > 0

    # plan shape: both heavy exchanges run at the requested width
    df = _countjoin_pairs(g, shuffle_width=7)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("REPARTITION_BY_NUM") >= 2 or plan.count(", 7)") >= 2

    # mass gate: default constants keep the tiny corpus on the stock plan
    assert _sparse_plan_for(g) is _jaccard_countjoin
    # shrink the per-partition budget → same corpus now demands a width
    monkeypatch.setattr(dedup, "CAND_ROWS_PER_PARTITION", 2)
    chosen = _sparse_plan_for(g)
    assert isinstance(chosen, functools.partial)
    assert chosen.keywords["shuffle_width"] > int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    assert sorted(map(tuple, chosen(g).collect())) == stock


def test_sparse_dispatch_records_decision_and_clamp_signal(spark, monkeypatch, caplog):
    """LAST_SPARSE_DISPATCH mirrors every dispatch (plan, width, clamped);
    a mass estimate past MAX_CANDJOIN_WIDTH partitions sets the clamped
    re-tier signal and logs a warning instead of silently capping."""
    import functools
    import logging

    from vacancy_analyser_spark.plans import dedup
    from vacancy_analyser_spark.plans.dedup import _jaccard_countjoin, _sparse_plan_for

    g = spark.createDataFrame(
        [(d, f"s-{(d + j) % 37}") for d in range(60) for j in range(8)],
        "doc_id long, bigram string",
    )
    assert _sparse_plan_for(g) is _jaccard_countjoin
    rec = dedup.LAST_SPARSE_DISPATCH
    assert rec["plan"] == "_jaccard_countjoin"
    assert rec["width"] is None and rec["clamped"] is False

    # shrink the budget AND the ceiling → same corpus is now "past the
    # exact tier": the default dispatch now RE-TIERS to the df-capped
    # metric (r8), logging the decision; retier=False preserves the old
    # clamp-at-max-width behavior for the inner (post-cap) dispatch
    monkeypatch.setattr(dedup, "CAND_ROWS_PER_PARTITION", 2)
    monkeypatch.setattr(dedup, "MAX_CANDJOIN_WIDTH", 64)
    with caplog.at_level(logging.WARNING, logger="vacancy_analyser_spark.plans.dedup"):
        chosen = _sparse_plan_for(g)
    assert isinstance(chosen, functools.partial)
    assert chosen.func is dedup._retier_capped
    assert any("re-tier" in r.message for r in caplog.records)

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="vacancy_analyser_spark.plans.dedup"):
        chosen = _sparse_plan_for(g, retier=False)
    assert isinstance(chosen, functools.partial)
    assert chosen.keywords["shuffle_width"] == 64
    assert dedup.LAST_SPARSE_DISPATCH["clamped"] is True
    assert any("re-tier" in r.message for r in caplog.records)


def test_dispatch_label_renders_width_and_clamp(spark, monkeypatch):
    """The shared stress-harness helper renders plain, widened, and
    clamped dispatches distinctly."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from scale_stress import dispatch_label

    from vacancy_analyser_spark.plans import dedup
    from vacancy_analyser_spark.plans.dedup import _jaccard_countjoin, _sparse_plan_for

    g = spark.createDataFrame(
        [(d, f"s-{(d + j) % 37}") for d in range(60) for j in range(8)],
        "doc_id long, bigram string",
    )
    assert dispatch_label(dedup, _sparse_plan_for(g)) == "_jaccard_countjoin"
    monkeypatch.setattr(dedup, "CAND_ROWS_PER_PARTITION", 2)
    label = dispatch_label(dedup, _sparse_plan_for(g))
    assert label.startswith("_jaccard_countjoin[w=") and "!clamped" not in label
    monkeypatch.setattr(dedup, "MAX_CANDJOIN_WIDTH", 64)
    assert dispatch_label(dedup, _sparse_plan_for(g)) == "retier:df_capped"
    assert (
        dispatch_label(dedup, _sparse_plan_for(g, retier=False))
        == "_jaccard_countjoin[w=64!clamped]"
    )


def test_clamp_retier_dispatches_to_capped_metric(spark, sf_dir, monkeypatch):
    """Force the clamp on the real corpus: the crossing probe must dispatch
    to the df-capped tier, record the decision, and produce EXACTLY the
    registered capped pipeline's results (ngram_jaccard_capped) — the
    re-tier is the capped metric, not an approximation of it."""
    from vacancy_analyser_spark.plans import dedup
    from vacancy_analyser_spark.plans.dedup import (
        _doc_bigrams,
        _sparse_plan_for,
        ngram_jaccard_capped,
    )

    g = _doc_bigrams(spark, sf_dir).persist()
    g.count()
    want = sorted(map(tuple, ngram_jaccard_capped(spark, sf_dir).collect()))

    monkeypatch.setattr(dedup, "CAND_ROWS_PER_PARTITION", 1)
    monkeypatch.setattr(dedup, "MAX_CANDJOIN_WIDTH", 1)
    # keep the per-doc skew rule from routing to PPJoin before the mass
    # branch can fire
    monkeypatch.setattr(dedup, "PPJOIN_CAND_PER_DOC", float("inf"))
    got_df = _sparse_plan_for(g)(g)
    rec = dict(dedup.LAST_SPARSE_DISPATCH)
    assert rec["retier"] == "df_capped"
    assert rec["clamped"] is True
    assert rec["cap"] >= dedup.MIN_DF_CAP
    assert sorted(map(tuple, got_df.collect())) == want
