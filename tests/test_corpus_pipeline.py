"""End-to-end invariants of the composable corpus pipeline (corpus.py):
the programmatic surface behind the registered textops/dedup queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vacancy_analyser_spark.corpus import (
    assign_split,
    decontaminate,
    dedup_exact,
    mix_resample,
    pack_sequences,
    quality_gate,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and keeps on running through "
    "the quiet field while morning light settles over every sleeping town"
)


@pytest.fixture()
def docs(spark):
    rows = []
    for i in range(40):
        lang = "en" if i % 2 == 0 else "fr"
        rows.append((i, GOOD + f" variant {i}", lang, len(GOOD) + 11))
    # exact duplicates of doc 0's content under new ids
    rows.append((100, GOOD + " variant 0", "en", len(GOOD) + 11))
    rows.append((101, GOOD + " variant 0", "en", len(GOOD) + 11))
    # low-quality rows the gate must drop
    rows.append((200, "short", "en", 5))
    rows.append((201, "1234567890 " * 30, "en", 330))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")


def test_full_chain_invariants(spark, docs):
    gated = quality_gate(docs)
    ids = {r["doc_id"] for r in gated.select("doc_id").collect()}
    assert 200 not in ids and 201 not in ids  # too short / non-alpha
    assert 0 in ids and 100 in ids

    deduped = dedup_exact(gated)
    ids = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    assert 0 in ids and 100 not in ids and 101 not in ids  # min doc_id kept

    # dedup is idempotent
    assert dedup_exact(deduped).count() == deduped.count()

    # decontaminate against a benchmark sharing doc 1's text → doc 1 gone,
    # docs with <3 shared bigrams survive
    bench = docs.filter(F.col("doc_id") == 1).select("text")
    clean = decontaminate(deduped, bench)
    ids_clean = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert 1 not in ids_clean
    # every doc shares the long common prefix → all flagged; loosen: rebuild
    # benchmark with unrelated text and assert nothing is dropped
    bench2 = spark.createDataFrame([("totally unrelated words here",)], "text string")
    assert decontaminate(deduped, bench2).count() == deduped.count()

    split = assign_split(deduped)
    # split partitions the corpus exactly
    assert split.count() == deduped.count()
    assert split.groupBy("doc_id").count().filter("count > 1").count() == 0
    assert {r["split"] for r in split.select("split").distinct().collect()} <= {
        "train", "val", "test",
    }
    # deterministic under physical repartitioning
    a = sorted(map(tuple, split.select("doc_id", "split").collect()))
    b = sorted(map(tuple, assign_split(deduped.repartition(7)).select("doc_id", "split").collect()))
    assert a == b

    packed = pack_sequences(split, budget_tokens=60, shard_docs=10)
    rows = packed.select("lang", "shard", "bin_id", "doc_id", "n_tokens").collect()
    # bins are contiguous in doc_id within (lang, shard): bin_id is
    # non-decreasing when docs are ordered by key
    by_part: dict = {}
    for r in rows:
        by_part.setdefault((r["lang"], r["shard"]), []).append((r["doc_id"], r["bin_id"]))
    for part in by_part.values():
        ordered = sorted(part)
        assert [b for _, b in ordered] == sorted(b for _, b in ordered)

    mixed = mix_resample(split, {"en": 2.0, "fr": 1.5})
    n_en = split.filter("lang = 'en'").count()
    out_en = mixed.filter("lang = 'en'").count()
    assert out_en == 2 * n_en  # integer weight is exact
    n_fr = split.filter("lang = 'fr'").count()
    out_fr = mixed.filter("lang = 'fr'").count()
    assert n_fr <= out_fr <= 2 * n_fr  # fractional weight bounded


def test_chunking_udtf_matches_jvm_plan(spark):
    """The Python UDTF chunker (custom-logic tier) must reproduce the
    JVM-side slice plan's chunks exactly — same ids, lengths, and content
    hash — so the two tiers are interchangeable."""
    from pyspark.sql.functions import lit

    from vacancy_analyser_spark.functions.text import tokens as jvm_tokens
    from vacancy_analyser_spark.operators.chunking import ChunkTokens

    rows = [
        (1, "word " * 200),          # 200 tokens → 4 chunks at 64/48
        (2, "tiny doc"),             # under one window
        (3, ""),                     # empty edge: one [''] token
        (4, "exactly " * 64),        # n == size boundary → 1 chunk
        (5, "x " * 65),              # n == size+1 → 2 chunks
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.createOrReplaceTempView("chunk_docs")
    spark.udtf.register("chunk_tokens", ChunkTokens)
    udtf_out = spark.sql(
        "SELECT doc_id, c.chunk_id, c.chunk_len, md5(c.chunk_text) AS chunk_md5 "
        "FROM chunk_docs, LATERAL chunk_tokens(text, 64, 48) c"
    )

    toks = docs.select("doc_id", jvm_tokens("text").alias("t")).withColumn("n", F.size("t"))
    n_chunks = F.when(F.col("n") <= 64, lit(1)).otherwise(
        F.ceil((F.col("n") - 64).cast("double") / 48).cast("int") + 1
    )
    chunked = toks.select(
        "doc_id", "t", F.explode(F.sequence(lit(0), n_chunks - 1)).alias("chunk_id")
    )
    chunk = F.slice(F.col("t"), F.col("chunk_id") * 48 + 1, 64)
    jvm_out = chunked.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(chunk).cast("int").alias("chunk_len"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )
    a = sorted(map(tuple, udtf_out.collect()))
    b = sorted(map(tuple, jvm_out.collect()))
    assert a == b
    assert len([r for r in a if r[0] == 1]) == 4  # 200 tokens → 4 chunks


def test_pack_respects_budget_mostly(spark, docs):
    """Every bin's token total stays under budget + one doc's overshoot
    (the running-sum form can overshoot by at most the doc that crosses
    the boundary)."""
    gated = quality_gate(docs)
    packed = pack_sequences(gated, budget_tokens=60, shard_docs=100)
    per_bin = packed.groupBy("lang", "shard", "bin_id").agg(
        F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("biggest")
    )
    bad = per_bin.filter(F.col("tot") >= 60 + F.col("biggest")).count()
    assert bad == 0


def test_stratified_sample_balances_languages(spark, sf_dir):
    """Each language's kept count must concentrate near the rarest
    language's size: the expected kept per lang is exactly `target`, so a
    loose binomial band around it must hold for every language."""
    from vacancy_analyser_spark.plans.textops import stratified_sample
    from vacancy_analyser_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    per_lang = {r["lang"]: r["cnt"] for r in docs.groupBy("lang").count().withColumnRenamed("count", "cnt").collect()}
    target = min(per_lang.values())
    kept = stratified_sample(spark, sf_dir).groupBy("lang").count().collect()
    kept_by_lang = {r["lang"]: r["count"] for r in kept}
    for lang, cnt in per_lang.items():
        k = kept_by_lang.get(lang, 0)
        assert k <= cnt
        # mean = target; 4σ binomial band, never flaky under regeneration
        sigma = (target * max(0.0, 1 - target / cnt)) ** 0.5
        assert abs(k - target) <= 4 * sigma + 1


def test_dedup_near_collapses_clusters(spark):
    """A~B and B~C must drop BOTH B and C (transitive closure), docs in no
    pair pass through, and the stage is idempotent."""
    from vacancy_analyser_spark.corpus import dedup_near

    docs = spark.createDataFrame(
        [(i, f"text-{i}") for i in (1, 2, 3, 7, 8, 20)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "a_id long, b_id long")

    once = dedup_near(docs, pairs)
    assert sorted(r["doc_id"] for r in once.collect()) == [1, 7, 20]
    twice = dedup_near(once, pairs)
    assert sorted(r["doc_id"] for r in twice.collect()) == [1, 7, 20]


def test_redact_pii(spark):
    from vacancy_analyser_spark.functions.text import redact_pii

    rows = [
        ("mail me at john.doe+spam@example.co.uk please", "mail me at [EMAIL] please"),
        ("server 192.168.0.1 went down", "server [IP] went down"),
        ("call +7 (912) 345-67-89 now", "call [PHONE] now"),
        ("ip 10.0.0.7 and bob@x.io and 8 800 555 35 35", "ip [IP] and [EMAIL] and [PHONE]"),
        ("no pii here, year 2024", "no pii here, year 2024"),
    ]
    df = spark.createDataFrame(rows, "text string, want string")
    got = df.select(redact_pii("text").alias("got"), "want").collect()
    for r in got:
        assert r["got"] == r["want"]


def test_dedup_near_consistent_with_groups_on_harness(spark, sf_dir):
    """The pipeline stage and the registered near_dup_groups query must
    agree on harness data: survivors are exactly all docs minus every
    non-canonical group member, and no near-dup pair survives intact."""
    from vacancy_analyser_spark.corpus import dedup_near
    from vacancy_analyser_spark.io import load_table
    from vacancy_analyser_spark.plans.dedup import near_dup_groups, ngram_jaccard_dedup

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_dedup(spark, sf_dir)
    kept_ids = {r["doc_id"] for r in dedup_near(docs, pairs).select("doc_id").collect()}

    groups = near_dup_groups(spark, sf_dir).collect()
    dropped = {r["doc_id"] for r in groups if r["doc_id"] != r["group_id"]}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert kept_ids == all_ids - dropped
    for r in pairs.select("a_id", "b_id").collect():
        assert not (r["a_id"] in kept_ids and r["b_id"] in kept_ids)


def test_sample_per_group_fixed_size_and_deterministic(spark, sf_dir):
    from vacancy_analyser_spark.corpus import sample_per_group
    from vacancy_analyser_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    s = sample_per_group(docs, n=10)
    per = {r["lang"]: r["count"] for r in s.groupBy("lang").count().collect()}
    full = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    for lang, cnt in full.items():
        assert per.get(lang, 0) == min(10, cnt)  # exactly n (or the whole group)
    # stable under physical repartitioning
    a = sorted(r["doc_id"] for r in s.select("doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in sample_per_group(docs.repartition(13), n=10).select("doc_id").collect()
    )
    assert a == b


def test_boilerplate_share_matches_bruteforce(spark, sf_dir):
    """doc_boilerplate_share replayed in pure python at the test SF:
    same 5-grams, same ≥3-doc floor, same position counting."""
    import re
    from collections import Counter

    from vacancy_analyser_spark.io import load_table
    from vacancy_analyser_spark.plans.textops import (
        BOILER_MIN_DOCS,
        BOILER_NGRAM,
        doc_boilerplate_share,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    grams = {}
    for r in docs:
        toks = re.sub(r"\s+", " ", r["text"].lower()).strip().split(" ")
        grams[r["doc_id"]] = [
            " ".join(toks[i : i + BOILER_NGRAM])
            for i in range(len(toks) - BOILER_NGRAM + 1)
        ]
    df_count = Counter()
    for gs in grams.values():
        for g in set(gs):
            df_count[g] += 1
    boiler = {g for g, n in df_count.items() if n >= BOILER_MIN_DOCS}
    want = {}
    for doc_id, gs in grams.items():
        if not gs:
            continue
        hits = sum(1 for g in gs if g in boiler)
        want[doc_id] = (len(gs), hits, round(hits / len(gs), 6))
    got = {
        r["doc_id"]: (r["n_positions"], r["n_boiler"], r["boiler_share"])
        for r in doc_boilerplate_share(spark, sf_dir).collect()
    }
    assert got == want


def test_corpus_keep_list_partitions_and_precedence(spark, sf_dir):
    """Every doc gets exactly one verdict; verdict sets are consistent
    with the component queries: near_dup docs are exactly the non-keeper
    group members that passed the earlier gates."""
    from vacancy_analyser_spark.plans.dedup import (
        corpus_keep_list,
        dedup_keep_best,
        near_dup_groups,
    )

    verdicts = {
        r["doc_id"]: r["verdict"] for r in corpus_keep_list(spark, sf_dir).collect()
    }
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(verdicts) == n_docs
    members = {r["doc_id"] for r in near_dup_groups(spark, sf_dir).collect()}
    keepers = {r["keeper_id"] for r in dedup_keep_best(spark, sf_dir).collect()}
    for d, v in verdicts.items():
        if v == "near_dup":
            assert d in members and d not in keepers
        if v == "kept" and d in members:
            assert d in keepers  # kept group members must be their keeper


def test_tfidf_capped_inactive_equals_exact(spark, sf_dir, monkeypatch):
    """At the shipped divisor (2) the head cap is INACTIVE on every sf dir
    (max df_top ≈ 46-47% of docs) — the capped query must be value-
    identical to the exact one. Forcing a tight divisor must actually
    bind (different, smaller candidate space ⇒ result changes), proving
    the cap is wired and not dead code."""
    from vacancy_analyser_spark.plans import textops as TX

    exact = sorted(map(tuple, TX.tfidf_cosine_pairs(spark, sf_dir).collect()))
    capped = sorted(map(tuple, TX.tfidf_cosine_capped(spark, sf_dir).collect()))
    assert capped == exact
    assert len(exact) > 0
    monkeypatch.setattr(TX, "TFIDF_DF_CAP_DIVISOR", 10)
    bound = sorted(map(tuple, TX.tfidf_cosine_capped(spark, sf_dir).collect()))
    assert bound != exact


def test_tfidf_dispatch_mass_probe_and_forced_cap(spark, sf_dir, monkeypatch):
    """The r9 mass dispatch (the tfidf twin of dedup._retier_capped):

    - at shipped SF the probe stays inside the session width — stock plan,
      LAST_TFIDF_DISPATCH records the mass, no cap, no explicit width;
    - a session-width crossing keeps the SAME metric at an explicit
      exchange width (result-identical — planner rule, not semantics);
    - a MAX_CANDJOIN_WIDTH crossing dispatches to the df_top-capped
      metric, pinned identical to tfidf_cosine_capped's registered
      pipeline, with the decision recorded."""
    import vacancy_analyser_spark.plans.dedup as dedup_mod
    from vacancy_analyser_spark.plans import textops as TX

    exact = sorted(map(tuple, TX.tfidf_cosine_pairs(spark, sf_dir).collect()))
    rec = dict(TX.LAST_TFIDF_DISPATCH)
    assert rec["cand_rows"] > 0 and rec["capped"] is False and rec["width"] is None

    # force the mid regime: a per-partition budget small enough that the
    # probe wants more than the session's 8 shuffle partitions but still
    # a sane absolute width (an unclamped width = cand_rows would ask the
    # scheduler for tens of thousands of tasks)
    monkeypatch.setattr(dedup_mod, "CAND_ROWS_PER_PARTITION", max(1, rec["cand_rows"] // 64))
    monkeypatch.setattr(dedup_mod, "MAX_CANDJOIN_WIDTH", 10**9)
    widened = sorted(map(tuple, TX.tfidf_cosine_pairs(spark, sf_dir).collect()))
    assert TX.LAST_TFIDF_DISPATCH["width"] is not None
    assert TX.LAST_TFIDF_DISPATCH["width"] <= 70
    assert TX.LAST_TFIDF_DISPATCH["capped"] is False
    assert widened == exact  # planner rule, not a semantic switch

    # force the clamp regime: mass budget exhausted → capped metric
    monkeypatch.setattr(dedup_mod, "MAX_CANDJOIN_WIDTH", 0)
    capped_via_dispatch = sorted(
        map(tuple, TX.tfidf_cosine_pairs(spark, sf_dir).collect())
    )
    assert TX.LAST_TFIDF_DISPATCH["capped"] is True
    pinned = sorted(map(tuple, TX.tfidf_cosine_capped(spark, sf_dir).collect()))
    assert capped_via_dispatch == pinned


def test_boilerplate_filter_consistent_with_share_query(spark, sf_dir):
    """The API stage must drop exactly the docs the registered share query
    scores above the threshold (same spans, same floor)."""
    from vacancy_analyser_spark.corpus import boilerplate_filter
    from vacancy_analyser_spark.io import load_table
    from vacancy_analyser_spark.plans.textops import doc_boilerplate_share

    docs = load_table(spark, sf_dir, "documents")
    max_share = 0.2  # low enough to actually drop docs on the fixture
    kept = {r["doc_id"] for r in boilerplate_filter(docs, max_share=max_share).collect()}
    shares = {
        r["doc_id"]: r["boiler_share"]
        for r in doc_boilerplate_share(spark, sf_dir).collect()
    }
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    expect = {
        d for d in all_ids
        if d not in shares or shares[d] <= max_share
    }
    # rounding: the registered query rounds to 6; exclude boundary docs
    boundary = {d for d, s in shares.items() if abs(s - max_share) < 1e-6}
    assert kept - boundary == expect - boundary
    assert len(expect) < len(all_ids)  # the threshold actually bites


def test_dedup_keep_best_api_matches_registered_keepers(spark, sf_dir):
    """The API keeper stage must retain exactly the registered
    dedup_keep_best keepers plus every doc outside any component."""
    from vacancy_analyser_spark.corpus import dedup_keep_best as api_keep_best
    from vacancy_analyser_spark.io import load_table
    from vacancy_analyser_spark.plans.dedup import (
        dedup_keep_best as q_keep_best,
        near_dup_groups,
        ngram_jaccard_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_dedup(spark, sf_dir).select("a_id", "b_id")
    kept = {r["doc_id"] for r in api_keep_best(docs, pairs).select("doc_id").collect()}
    members = {r["doc_id"] for r in near_dup_groups(spark, sf_dir).collect()}
    keepers = {r["keeper_id"] for r in q_keep_best(spark, sf_dir).collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert kept == (all_ids - members) | keepers


def test_contamination_spans_matches_bruteforce(spark, sf_dir):
    """Pure-Python replay of the gaps-and-islands span report at the test
    SF (longest run / total matched / run count per contaminated doc),
    plus the plan shapes the 100 TB story depends on: the benchmark gate
    is a semi join (never a cartesian) and the islands come from ONE
    doc-partitioned window."""
    import re

    from vacancy_analyser_spark.plans.dedup import CONTAM_SPAN_MIN, contamination_spans

    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }

    def grams(t):
        toks = re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        return [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]

    bench = set()
    for d, t in texts.items():
        if d % 50 == 0:
            bench.update(grams(t))
    want = {}
    for d, t in texts.items():
        if d % 50 == 0:
            continue
        hits = [i for i, g in enumerate(grams(t)) if g in bench]
        runs = []
        for i in hits:
            if runs and i == runs[-1][1] + 1:
                runs[-1][1] = i
            else:
                runs.append([i, i])
        if not runs:
            continue
        max_span = max(b - a + 1 for a, b in runs)
        if max_span >= CONTAM_SPAN_MIN:
            want[d] = (max_span, len(hits), len(runs))

    df = contamination_spans(spark, sf_dir)
    got = {r["doc_id"]: (r["max_span"], r["n_matched"], r["n_spans"]) for r in df.collect()}
    assert got == want
    assert want  # the threshold actually selects something at this SF
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan
    assert plan.split("== Initial Plan ==")[0].count("Window") == 1


def test_minhash_index_serve_probes_index_not_corpus_text(spark, sf_dir):
    """Build-once/probe-cheap on the dedup side: serving must (a) scan
    documents only for the INCREMENT (the source equality is pushed; the
    corpus-side complement filter Not(EqualTo) — the build's scan — must
    NOT appear in the serve plan), (b) read the corpus from the
    materialized index (lsh_ path in the plan), (c) find EXACTLY the LSH
    self-join's collisions that straddle the increment boundary, with
    signature-fraction estimates in [BAND_ROWS/N_MINHASH, 1], and (d)
    reuse a fresh index on the second call."""
    from vacancy_analyser_spark.io import load_table
    from vacancy_analyser_spark.plans.dedup import (
        BAND_ROWS,
        INCREMENT_SOURCE,
        N_MINHASH,
        _lsh_index_is_fresh,
        _lsh_index_path,
        minhash_index_serve,
        minhash_lsh_dedup,
    )

    serve = minhash_index_serve(spark, sf_dir)
    rows = serve.collect()
    plan = serve._jdf.queryExecution().executedPlan().toString()
    assert f"EqualTo(source,{INCREMENT_SOURCE})" in plan
    assert f"Not(EqualTo(source,{INCREMENT_SOURCE}))" not in plan
    assert "lsh_" in plan
    assert _lsh_index_is_fresh(_lsh_index_path(sf_dir), sf_dir)

    inc = {
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("source") == INCREMENT_SOURCE)
        .select("doc_id")
        .collect()
    }
    got_pairs = {(min(r["new_id"], r["corpus_id"]), max(r["new_id"], r["corpus_id"])) for r in rows}
    lsh = minhash_lsh_dedup(spark, sf_dir).collect()
    straddling = {
        (r["a_id"], r["b_id"]) for r in lsh if (r["a_id"] in inc) != (r["b_id"] in inc)
    }
    assert got_pairs == straddling
    assert rows  # the increment actually collides with the corpus at this SF
    lo = BAND_ROWS / N_MINHASH
    for r in rows:
        est = r["est_jaccard"]
        assert lo - 1e-9 <= est <= 1 + 1e-9
        # k/N_MINHASH grid: exactly representable, hash-safe
        assert abs(est * N_MINHASH - round(est * N_MINHASH)) < 1e-9


def test_boilerplate_strip_matches_bruteforce(spark, sf_dir):
    """Pure-Python replay of the strip at the test SF: flagged 5-gram
    starts cover [p, p+4]; kept tokens rejoin in order; md5 of the cleaned
    text and the kept-count must match per doc, fully-covered docs must be
    absent, and the strip must be consistent with doc_boilerplate_share
    (share == 0 ⇒ nothing stripped)."""
    import hashlib
    import re
    from collections import Counter, defaultdict

    from vacancy_analyser_spark.functions.text import BOILER_MIN_DOCS, BOILER_NGRAM
    from vacancy_analyser_spark.plans.textops import (
        boilerplate_strip,
        doc_boilerplate_share,
    )

    texts = {
        r["doc_id"]: re.sub(r"\s+", " ", r["text"].lower()).strip().split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    gram_docs = defaultdict(set)
    for d, toks in texts.items():
        for i in range(len(toks) - BOILER_NGRAM + 1):
            gram_docs[" ".join(toks[i : i + BOILER_NGRAM])].add(d)
    boiler = {g for g, ds in gram_docs.items() if len(ds) >= BOILER_MIN_DOCS}
    want = {}
    for d, toks in texts.items():
        covered = set()
        for i in range(len(toks) - BOILER_NGRAM + 1):
            if " ".join(toks[i : i + BOILER_NGRAM]) in boiler:
                covered.update(range(i, i + BOILER_NGRAM))
        kept = [t for i, t in enumerate(toks) if i not in covered]
        if kept:
            want[d] = (len(kept), hashlib.md5(" ".join(kept).encode()).hexdigest())

    got = {
        r["doc_id"]: (r["n_kept"], r["clean_md5"])
        for r in boilerplate_strip(spark, sf_dir).collect()
    }
    assert got == want
    assert len(want) < len(texts)  # the strip drops fully-templated docs

    share = {
        r["doc_id"]: r["boiler_share"] for r in doc_boilerplate_share(spark, sf_dir).collect()
    }
    for d, s in share.items():
        if s == 0.0 and d in got:
            assert got[d][0] == len(texts[d])


def test_novelty_score_matches_bruteforce_and_skips_windows(spark, sf_dir):
    """First-doc novelty replayed in pure Python, plus the scale shape:
    the firsts census is an AGGREGATE + gram-keyed join back (Σ df rows),
    never a per-gram window over the corpus."""
    import re
    from collections import defaultdict

    from vacancy_analyser_spark.plans.textops import ngram_novelty_score

    texts = {
        r["doc_id"]: re.sub(r"\s+", " ", r["text"].lower()).strip().split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    grams = {
        d: {" ".join(p) for p in zip(t, t[1:])} for d, t in texts.items() if len(t) > 1
    }
    first = defaultdict(lambda: 1 << 62)
    for d, gs in grams.items():
        for g in gs:
            first[g] = min(first[g], d)
    want = {}
    for d, gs in grams.items():
        if not gs:
            continue
        novel = sum(1 for g in gs if first[g] == d)
        want[d] = (len(gs), novel, novel / len(gs))
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in ngram_novelty_score(spark, sf_dir).collect()
    }
    assert got == want
    df = ngram_novelty_score(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "Window" not in plan


def test_dataset_card_stats_matches_bruteforce_single_scan(spark, sf_dir):
    """Every cell of the card replayed in pure Python (counts, token
    totals, exact-int ratio arithmetic), and the plan reads documents
    ONCE — per-doc signals are Column algebra on the same scan."""
    import hashlib
    import re
    from collections import Counter, defaultdict

    from vacancy_analyser_spark.plans.textops import dataset_card_stats

    rows = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    fp_counts = Counter(
        hashlib.md5(re.sub(r"\s+", " ", r["text"].lower()).strip().encode()).hexdigest()
        for r in rows
    )
    cells = defaultdict(list)
    for r in rows:
        toks = re.sub(r"\s+", " ", r["text"].lower()).strip().split(" ")
        alpha = len(re.sub(r"[^a-zA-Z]", "", r["text"])) / len(r["text"]) if r["text"] else 0
        q = bool(
            r["text"]
            and 120 <= r["n_chars"] <= 400
            and len(toks) >= 20
            and alpha > 0.7
        )
        fp = hashlib.md5(
            re.sub(r"\s+", " ", r["text"].lower()).strip().encode()
        ).hexdigest()
        cells[(r["source"], r["lang"])].append((len(toks), r["n_chars"], q, fp_counts[fp] > 1))
    want = {}
    for k, vs in cells.items():
        n = len(vs)
        want[k] = (
            n,
            sum(v[0] for v in vs),
            sum(v[1] for v in vs) / n,
            sum(1 for v in vs if v[3]) / n,
            sum(1 for v in vs if v[2]) / n,
        )
    df = dataset_card_stats(spark, sf_dir)
    got = {
        (r["source"], r["lang"]): (
            r["n_docs"], r["total_tokens"], r["avg_chars"], r["dup_share"], r["quality_rate"]
        )
        for r in df.collect()
    }
    assert got == want
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert plan.count("documents.parquet") == 1


def test_api_stages_match_registered_keys(spark, sf_dir):
    """The four r5 API stages must agree with their registered twins on
    the harness data — the API and the driver-checked keys share one
    behavior (the boilerplate_filter/share precedent)."""
    from vacancy_analyser_spark.corpus import (
        contamination_report,
        dataset_card,
        novelty_scores,
        strip_boilerplate,
    )
    from vacancy_analyser_spark.io import load_table
    from vacancy_analyser_spark.plans.dedup import CONTAM_SPAN_MIN, contamination_spans
    from vacancy_analyser_spark.plans.textops import (
        boilerplate_strip,
        dataset_card_stats,
        ngram_novelty_score,
    )

    docs = load_table(spark, sf_dir, "documents")

    # strip: same kept tokens per doc (the key ships md5; the API ships text)
    import hashlib

    api = {
        r["doc_id"]: hashlib.md5(r["text"].encode()).hexdigest()
        for r in strip_boilerplate(docs).select("doc_id", "text").collect()
    }
    want = {
        r["doc_id"]: r["clean_md5"] for r in boilerplate_strip(spark, sf_dir).collect()
    }
    assert api == want

    api_nov = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in novelty_scores(docs).collect()
    }
    want_nov = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in ngram_novelty_score(spark, sf_dir).collect()
    }
    assert api_nov == want_nov

    # contamination: benchmark = the registered key's synthetic split
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    api_c = {
        r["doc_id"]: (r["max_span"], r["n_matched"], r["n_spans"])
        for r in contamination_report(train, bench, min_span=CONTAM_SPAN_MIN).collect()
    }
    want_c = {
        r["doc_id"]: (r["max_span"], r["n_matched"], r["n_spans"])
        for r in contamination_spans(spark, sf_dir).collect()
    }
    assert api_c == want_c

    api_card = {
        (r["source"], r["lang"]): (r["n_docs"], r["total_tokens"], r["avg_chars"], r["dup_share"], r["quality_rate"])
        for r in dataset_card(docs).collect()
    }
    want_card = {
        (r["source"], r["lang"]): (r["n_docs"], r["total_tokens"], r["avg_chars"], r["dup_share"], r["quality_rate"])
        for r in dataset_card_stats(spark, sf_dir).collect()
    }
    assert api_card == want_card


def test_token_budget_select_respects_per_lang_budget(spark, sf_dir):
    """Greedy maximality per language: the kept running sum stays within
    the 25% budget, and the next-best excluded doc would cross it."""
    from pyspark.sql import functions as F
    from vacancy_analyser_spark.io import load_table
    from vacancy_analyser_spark.plans.textops import token_budget_select
    from vacancy_analyser_spark.functions.text import tokens

    kept = token_budget_select(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    totals = {
        r["lang"]: r["t"]
        for r in docs.groupBy("lang")
        .agg(F.sum(F.size(tokens("text")).cast("bigint")).alias("t"))
        .collect()
    }
    by_lang = {
        r["lang"]: (r["cum"], r["n"])
        for r in kept.groupBy("lang")
        .agg(F.max("cum_tokens").alias("cum"), F.count("*").alias("n"))
        .collect()
    }
    for lang, (cum, n) in by_lang.items():
        assert cum <= int(0.25 * totals[lang])
        assert n > 0
    # maximality: per lang, kept count == count of prefix rows under budget
    # (the oracle pins exact membership; here we pin the greedy shape)
    assert set(by_lang) <= set(totals)


def test_cluster_balanced_sample_quota_and_coverage(spark, sf_dir):
    """Every cell contributes min(quota, cell size) members — balanced
    coverage, the property that distinguishes this from random sampling."""
    from pyspark.sql import functions as F
    from vacancy_analyser_spark.plans.similarity import (
        CLUSTER_SAMPLE_PER_CELL,
        cluster_balanced_sample,
    )

    s = cluster_balanced_sample(spark, sf_dir)
    per_cell = s.groupBy("centroid_id", "cell_n").agg(F.count("*").alias("k")).collect()
    assert per_cell
    for r in per_cell:
        assert r["k"] == min(CLUSTER_SAMPLE_PER_CELL, r["cell_n"])


def test_shard_manifest_balance_and_invariance(spark, sf_dir):
    """Hash sharding's two promises, pinned: statistical balance (token
    mass within 3x across shards at test scale) and repartition
    invariance (the manifest is identical no matter how the input was
    partitioned — the property size-balanced packing lacks)."""
    from vacancy_analyser_spark.io import load_table
    from vacancy_analyser_spark.plans.textops import N_SHARDS, shard_manifest

    m = shard_manifest(spark, sf_dir).collect()
    assert len(m) == N_SHARDS
    masses = [r["total_tokens"] for r in m]
    assert min(masses) > 0
    assert max(masses) / min(masses) < 3.0
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in m) == docs.count()


def test_mix_temperature_weights_normalize_and_upsample_low_resource(spark, sf_dir):
    """Mixture math sanity: weights sum to ~1, every language draws a
    positive target, and the temperature up-samples the low-resource end
    (the smallest language gets the highest epoch count)."""
    from vacancy_analyser_spark.plans.textops import corpus_mix_temperature

    rows = corpus_mix_temperature(spark, sf_dir).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    assert all(r["target_tokens"] > 0 for r in rows)
    by_mass = sorted(rows, key=lambda r: r["token_mass"])
    epochs = [r["epochs"] for r in by_mass]
    assert epochs[0] == max(epochs)
    assert epochs[-1] == min(epochs)


def test_quality_gate_bucketed_contract_holds(spark, sf_dir):
    """The sketch-threshold contract must hold for every language (the
    oracle pins literal TRUE, so any violation is also a driver-hash
    failure — this is the fast local trip-wire)."""
    from vacancy_analyser_spark.plans.textops import quality_gate_bucketed

    rows = quality_gate_bucketed(spark, sf_dir).collect()
    assert rows
    assert all(r["gate_ok"] for r in rows)
    assert all(r["n"] > 0 for r in rows)


def test_shard_fingerprint_additivity(spark, sf_dir):
    """The property shard_manifest_diff sells: the sum-based content
    fingerprint is additive, so fp_base + fp_delta must equal
    shard_manifest's content_fp shard-for-shard (and the doc counts must
    reconcile the same way) — incremental audit needs to read only the
    batch."""
    from vacancy_analyser_spark.plans.textops import shard_manifest, shard_manifest_diff

    full = {
        r["shard_id"]: (r["n_docs"], r["content_fp"])
        for r in shard_manifest(spark, sf_dir).collect()
    }
    diff = {
        r["shard_id"]: (r["n_docs_base"] + r["n_docs_added"], r["fp_base"] + r["fp_delta"])
        for r in shard_manifest_diff(spark, sf_dir).collect()
    }
    assert diff == full
