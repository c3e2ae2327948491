"""Property tests for the r3 operators beyond their oracle parity:
containment vs brute-force set math and vs Jaccard, quantization
round-trip error bounds, repetition-ratio invariants, and the
incremental-dedup asymmetry guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from vacancy_analyser_spark.functions.text import tokens
from vacancy_analyser_spark.plans.dedup import (
    CONTAIN_T,
    JACCARD_T,
    _bigrams,
    containment_dedup,
    incremental_dedup,
    ngram_jaccard_dedup,
)
from vacancy_analyser_spark.plans.similarity import embedding_quantize
from vacancy_analyser_spark.plans.textops import repetition_ngram_ratio


def _bigram_sets(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select("doc_id", tokens("text").alias("toks"))
    rows = toks.select("doc_id", _bigrams("toks").alias("bg")).collect()
    return {r["doc_id"]: set(r["bg"]) for r in rows}


def test_containment_matches_bruteforce_sets(spark, sf_dir):
    sets = _bigram_sets(spark, sf_dir)
    expected = set()
    ids = [d for d, s in sets.items() if s]
    for a in ids:
        for b in ids:
            if a == b:
                continue
            c = len(sets[a] & sets[b]) / len(sets[a])
            if c >= CONTAIN_T:
                expected.add((a, b))
    got = {
        (r["contained_id"], r["container_id"])
        for r in containment_dedup(spark, sf_dir).collect()
    }
    assert got == expected
    assert len(got) > 0  # fixture corpus does contain containment pairs


def test_containment_dominates_jaccard(spark, sf_dir):
    # J(A,B) <= C(A->B): every Jaccard pair at >= CONTAIN_T must appear in
    # the containment output (both directions, since J is symmetric)
    jac = {
        (r["a_id"], r["b_id"])
        for r in ngram_jaccard_dedup(spark, sf_dir)
        .filter(F.col("jaccard") >= CONTAIN_T)
        .collect()
    }
    cont = {
        (r["contained_id"], r["container_id"])
        for r in containment_dedup(spark, sf_dir).collect()
    }
    for a, b in jac:
        assert (a, b) in cont and (b, a) in cont


def test_containment_regime_paths_agree(spark, sf_dir):
    """The containment dispatcher is a planner rule, not a semantic
    switch: all three physical plans (bitmap popcount, count-join,
    asymmetric prefix-filtered join) must return identical directed pairs
    and values. The dense fixture corpus is the WORST case for the prefix
    filter (no shingle is rare), so agreement here exercises its
    pigeonhole bound hardest — mirrors test_jaccard_regime_paths_agree."""
    from vacancy_analyser_spark.plans.dedup import (
        _containment_bitmap,
        _containment_countjoin,
        _containment_ppjoin,
        _doc_bigrams,
    )

    g = _doc_bigrams(spark, sf_dir).persist()
    n_vocab = g.select("bigram").distinct().count()
    bitmap = sorted(map(tuple, _containment_bitmap(g, n_vocab).collect()))
    countjoin = sorted(map(tuple, _containment_countjoin(g).collect()))
    ppjoin = sorted(map(tuple, _containment_ppjoin(g).collect()))
    g.unpersist()
    assert bitmap == countjoin
    assert ppjoin == countjoin
    assert len(bitmap) > 0  # fixture corpus does contain containment pairs


def test_containment_ppjoin_prunes_head_but_keeps_all_pairs(spark):
    """Head-heavy synthetic corpus (the Σ df² killer): the prefix-filtered
    containment join must return exactly the count-join's pairs while the
    contained-side prefixes exclude the universal head shingles (they
    sort last by df, outside every prefix)."""
    from pyspark.sql import Window as W

    from vacancy_analyser_spark.plans.dedup import (
        _ceil_contain_t,
        _containment_countjoin,
        _containment_ppjoin,
    )

    # 20 "pages" each contained in one of 4 "books": page p of book k has
    # shingles book-k-0..9 (the book has all 20), plus 5 universal heads
    rows = []
    for k in range(4):
        rows += [(1000 + k, f"book-{k}-{j}") for j in range(20)]
        for p in range(5):
            rows += [(k * 5 + p, f"book-{k}-{4 * p + j}") for j in range(4)]
    for d in {r[0] for r in rows}:
        rows += [(d, f"head-{h}") for h in range(5)]
    g = spark.createDataFrame(rows, "doc_id long, bigram string")
    pp = sorted(map(tuple, _containment_ppjoin(g).collect()))
    cj = sorted(map(tuple, _containment_countjoin(g).collect()))
    assert pp == cj
    # every page (4+5=9 shingles, 4 book + 5 head) is contained in its
    # book (20+5 shingles): C = 9/9 = 1.0 ≥ 0.8 → 20 directed pairs at
    # least; no page contains its book (C = 9/25 < 0.8)
    contained = {(a, b) for a, b, _ in pp}
    for k in range(4):
        for p in range(5):
            assert (k * 5 + p, 1000 + k) in contained
            assert (1000 + k, k * 5 + p) not in contained
    # and the pruning is real: the 24-doc head clique (df=24) must be
    # outside every contained-side prefix
    gh = g.select("doc_id", F.xxhash64("bigram").alias("bh"))
    sizes = gh.groupBy("doc_id").agg(F.count("*").alias("n"))
    df_tbl = gh.groupBy("bh").agg(F.count("*").alias("df"))
    ranked = (
        gh.join(df_tbl, "bh")
        .join(sizes, "doc_id")
        .withColumn("rn", F.row_number().over(W.partitionBy("doc_id").orderBy("df", "bh")))
    )
    prefix = ranked.filter(F.col("rn") <= F.col("n") - _ceil_contain_t(F.col("n")) + 1)
    assert prefix.filter(F.col("df") == 24).count() == 0


def test_ceil_contain_t_is_integer_exact(spark):
    """Float ceil(0.8·n) rounds 4.000000000000000222 up to 5 at n=5 —
    the exact failure the rational form exists to avoid. Pin ⌈T·n⌉
    against Python integer math over a range crossing many multiples."""
    import math

    from vacancy_analyser_spark.plans.dedup import (
        CONTAIN_T_DEN,
        CONTAIN_T_NUM,
        _ceil_contain_t,
    )

    rows = spark.range(1, 200).select(F.col("id").alias("n"))
    got = {r["n"]: r["c"] for r in rows.select("n", _ceil_contain_t(F.col("n")).alias("c")).collect()}
    for n in range(1, 200):
        assert got[n] == math.ceil(CONTAIN_T_NUM * n / CONTAIN_T_DEN) == -((-CONTAIN_T_NUM * n) // CONTAIN_T_DEN)


def test_capped_keys_dispatch_is_result_identical(spark, sf_dir):
    """The r5 capped-key dispatch (regime re-probed on the capped table)
    must be a pure planner change: the dispatched registered queries
    equal the plain capped count-joins over the same planner cap."""
    from vacancy_analyser_spark.plans.dedup import (
        DF_CAP_DIVISOR,
        MIN_DF_CAP,
        _containment_countjoin,
        _doc_bigrams,
        _jaccard_countjoin,
        _regime_probe,
        containment_capped,
        ngram_jaccard_capped,
    )

    g = _doc_bigrams(spark, sf_dir).persist()
    g.count()
    _, n_docs, _ = _regime_probe(g, sf_dir)
    cap = max(MIN_DF_CAP, n_docs // DF_CAP_DIVISOR)
    assert sorted(map(tuple, ngram_jaccard_capped(spark, sf_dir).collect())) == sorted(
        map(tuple, _jaccard_countjoin(g, max_df=cap).collect())
    )
    assert sorted(map(tuple, containment_capped(spark, sf_dir).collect())) == sorted(
        map(tuple, _containment_countjoin(g, max_df=cap).collect())
    )
    g.unpersist()


def test_quantize_bounds_and_roundtrip(spark, sf_dir):
    q = embedding_quantize(spark, sf_dir)
    # int8 range: floor can reach -128 on the negative extreme, +127 max
    bad = q.filter((F.col("qv") < -128) | (F.col("qv") > 127)).count()
    assert bad == 0
    # dequantization error: x in [qv*scale, (qv+1)*scale) by floor — the
    # reconstruction qv*scale under-shoots by strictly less than one scale
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    x = emb.select("vec_id", F.posexplode("embedding").alias("pos0", "x")).select(
        "vec_id", (F.col("pos0") + 1).alias("pos"), "x"
    )
    joined = q.join(x, ["vec_id", "pos"])
    viol = joined.filter(
        (F.col("scale") > 0)
        & (
            (F.col("x").cast("double") < F.col("qv") * F.col("scale") - 1e-9)
            | (F.col("x").cast("double") >= (F.col("qv") + 1) * F.col("scale") + 1e-9)
        )
    ).count()
    assert viol == 0


def test_repetition_ratio_invariants(spark, sf_dir):
    r = repetition_ngram_ratio(spark, sf_dir)
    assert r.filter((F.col("dup_ratio") < 0) | (F.col("dup_ratio") >= 1)).count() == 0
    assert r.filter(F.col("n_distinct") > F.col("n_bigrams")).count() == 0
    # a doc made of one repeated word is pure repetition
    one = spark.createDataFrame(
        [(1, "spam spam spam spam spam", "en", "srcX", 24)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        one.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        row = repetition_ngram_ratio(spark, d).collect()[0]
        assert row["n_bigrams"] == 4 and row["n_distinct"] == 1
        assert row["dup_ratio"] == 0.75


def test_incremental_dedup_is_asymmetric_and_consistent(spark, sf_dir):
    from vacancy_analyser_spark.plans.dedup import INCREMENT_SOURCE

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new_ids = {r["doc_id"] for r in docs.filter(F.col("source") == INCREMENT_SOURCE).collect()}
    out = incremental_dedup(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        # left column is always an increment doc, right never is
        assert r["new_id"] in new_ids
        assert r["corpus_id"] not in new_ids
        assert r["jaccard"] >= JACCARD_T
    # consistency with the full-corpus query: every incremental pair is a
    # full-dedup pair (as an unordered pair)
    full = {
        frozenset((r["a_id"], r["b_id"]))
        for r in ngram_jaccard_dedup(spark, sf_dir).collect()
    }
    for r in out:
        assert frozenset((r["new_id"], r["corpus_id"])) in full


def test_lsh_recall_report_dispatches_and_accounts_every_pair(spark, sf_dir):
    """The recall report's pair universe must ride the density dispatcher
    (on the dense test corpus: the bitmap popcount loop — bit_count in the
    executed plan, no shingle-keyed pair shuffle), its decile counts must
    reconcile exactly against brute force, and the top band must be fully
    detected at this SF (deterministic data, deterministic recipe)."""
    import re
    from collections import Counter

    from vacancy_analyser_spark.plans.dedup import (
        lsh_recall_report,
        minhash_lsh_dedup,
    )

    df = lsh_recall_report(spark, sf_dir)
    rows = {r["j_decile"]: r for r in df.collect()}

    # brute-force universe replay
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    grams = {
        d: set(
            " ".join(p)
            for p in zip(
                re.sub(r"\s+", " ", t.lower()).strip().split(" "),
                re.sub(r"\s+", " ", t.lower()).strip().split(" ")[1:],
            )
        )
        for d, t in texts.items()
    }
    ids = sorted(grams)
    want = Counter()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(grams[a] & grams[b])
            if inter:
                j = inter / (len(grams[a]) + len(grams[b]) - inter)
                want[min(int(j * 10), 9)] += 1
    assert {d: r["n_pairs"] for d, r in rows.items()} == dict(want)

    lsh_n = minhash_lsh_dedup(spark, sf_dir).count()
    assert sum(r["n_detected"] for r in rows.values()) <= lsh_n
    top = max(rows)
    assert rows[top]["detect_rate"] == 1.0

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "bit_count" in plan  # dense regime → bitmap universe
