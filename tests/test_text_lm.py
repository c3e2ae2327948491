"""Property tests for the LM/profile text ops beyond oracle parity:
bigram-LM probability-mass closure, logprob-score sign/shape invariants,
categorical_profile vs an exact pandas replay, and ngram_jaccard_capped vs
a driver-side capped-set recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from vacancy_analyser_spark.functions.text import tokens
from vacancy_analyser_spark.io import load_table
from vacancy_analyser_spark.plans.dedup import (
    DF_CAP_DIVISOR,
    JACCARD_T,
    MIN_DF_CAP,
    _bigrams,
    ngram_jaccard_capped,
)
from vacancy_analyser_spark.plans.textops import (
    bigram_lm_table,
    categorical_profile,
    token_count,
    unigram_logprob_score,
)


def test_bigram_lm_probability_mass_closes(spark, sf_dir):
    lm = bigram_lm_table(spark, sf_dir)
    # cond_p is round(c12/c1, 6), so per w1 the mass Σ_w2 cond_p sits within
    # k rounding half-steps of exactly 1
    mass = lm.groupBy("w1").agg(
        F.sum("cond_p").alias("rounded_mass"), F.count("*").alias("k")
    )
    rows = mass.collect()
    assert rows
    for r in rows:
        assert abs(r["rounded_mass"] - 1.0) <= 5e-7 * r["k"] + 1e-12


def test_bigram_lm_counts_match_replay(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(tokens("text").alias("t")).collect()
    from collections import Counter

    c12 = Counter()
    for r in docs:
        t = r["t"]
        for i in range(len(t) - 1):
            c12[(t[i], t[i + 1])] += 1
    got = {(r["w1"], r["w2"]): r["c12"] for r in bigram_lm_table(spark, sf_dir).collect()}
    assert got == dict(c12)


def test_unigram_logprob_negative_and_token_aligned(spark, sf_dir):
    score = unigram_logprob_score(spark, sf_dir)
    tc = token_count(spark, sf_dir)
    joined = score.join(tc, "doc_id").collect()
    assert joined
    for r in joined:
        assert r["n_tokens"] == r["n_tokens"]  # both sides present
        assert r["avg_logp"] < 0  # probabilities < 1 ⇒ log < 0
    # every document scores (empty docs still have the [''] token)
    assert score.count() == load_table(spark, sf_dir, "documents").count()


def test_categorical_profile_matches_pandas(spark, sf_dir):
    pdf = load_table(spark, sf_dir, "documents").select("lang", "source").toPandas()
    got = {r["column_name"]: r for r in categorical_profile(spark, sf_dir).collect()}
    for col in ("lang", "source"):
        counts = pdf[col].value_counts(dropna=False)
        total = len(pdf)
        assert got[col]["n_distinct"] == len(counts)
        assert got[col]["top_share"] == round(counts.max() / total, 6)
        sumsq = sum(round((c / total) * (c / total) * 10**12) for c in counts) / 10**12
        assert got[col]["gini"] == round(1.0 - sumsq, 6)


def _capped_sets(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("toks"))
    rows = toks.select("doc_id", F.array_distinct(_bigrams("toks")).alias("bg")).collect()
    sets = {r["doc_id"]: set(r["bg"]) for r in rows if r["bg"]}
    from collections import Counter

    df = Counter()
    for s in sets.values():
        for b in s:
            df[b] += 1
    cap = max(MIN_DF_CAP, len(sets) // DF_CAP_DIVISOR)
    return {d: {b for b in s if df[b] <= cap} for d, s in sets.items()}


def test_capped_jaccard_matches_set_replay(spark, sf_dir):
    sets = _capped_sets(spark, sf_dir)
    expected = {}
    ids = sorted(d for d, s in sets.items() if s)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= JACCARD_T:
                expected[(a, b)] = j
    got = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in ngram_jaccard_capped(spark, sf_dir).collect()
    }
    assert got == expected
    assert got  # fixture corpus has capped near-dup pairs


def _bpe_python_replay(vocab: dict[str, int], n_steps: int):
    """Ground-truth BPE: overlapping pair counts, lexicographic tie-break,
    greedy left-to-right merge."""
    from collections import Counter

    state = {w: list(w) for w in vocab}
    rules = []
    for s in range(n_steps):
        pc = Counter()
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += vocab[w]
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((s + 1, a, b, c))
        for w, syms in state.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            state[w] = out
    return rules, state


def test_bpe_merges_match_python_replay(spark, sf_dir):
    from vacancy_analyser_spark.plans.textops import BPE_STEPS, bpe_train_merges

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    vocab = {r["w"]: r["c"] for r in words}
    expected, _ = _bpe_python_replay(vocab, BPE_STEPS)
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train_merges(spark, sf_dir).orderBy("step").collect()
    ]
    assert got == expected


def test_bpe_merge_fold_handles_same_symbol_runs(spark):
    # 'aaaa' under merge (a,a) must become [aa, aa] (greedy-left), never
    # [aa, a, a] or a chained [aaa, a] — the run-alternation contract both
    # the fold and the oracle's windowed formulation implement
    from vacancy_analyser_spark.plans.textops import _bpe_merge_fold

    df = spark.createDataFrame([("aaaa",), ("aaa",), ("baaab",)], "word string")
    syms = F.expr("regexp_extract_all(word, '.', 0)")
    merged = _bpe_merge_fold(syms, "a", "a")
    got = {r["word"]: r["m"] for r in df.select("word", merged.alias("m")).collect()}
    assert got["aaaa"] == ["aa", "aa"]
    assert got["aaa"] == ["aa", "a"]
    assert got["baaab"] == ["b", "aa", "a", "b"]


def test_bpe_merge_fold_matches_replay_on_random_words(spark):
    """Hypothesis: for arbitrary small words over a 2-letter alphabet and
    an arbitrary merge pair, the Spark fold merge equals the greedy-left
    Python replay — the property the oracle's window formulation and the
    registered loop both depend on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyspark.sql import Row

    def py_merge(syms, a, b):
        out = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        return out

    @settings(max_examples=12, deadline=None)
    @given(
        words=st.lists(
            st.text(alphabet="ab", min_size=1, max_size=8), min_size=1, max_size=6
        ),
        pair=st.tuples(st.sampled_from("ab"), st.sampled_from("ab")),
    )
    def check(words, pair):
        from vacancy_analyser_spark.plans.textops import _bpe_merge_fold

        a, b = pair
        df = spark.createDataFrame([Row(word=w) for w in words])
        syms = F.expr("regexp_extract_all(word, '.', 0)")
        merged = _bpe_merge_fold(syms, a, b)
        got = {r["word"]: r["m"] for r in df.select("word", merged.alias("m")).collect()}
        for w in words:
            assert got[w] == py_merge(list(w), a, b), (w, a, b)

    check()


def test_bpe_encode_counts_match_trained_replay(spark, sf_dir):
    """Token counts under the trained vocabulary equal the Python replay's
    post-merge symbol counts summed over each document's words, and sit
    between the whitespace token count (merges only shrink) and the
    character count."""
    from vacancy_analyser_spark.plans.textops import (
        BPE_STEPS,
        bpe_encode_token_count,
        token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    vocab = {r["w"]: r["c"] for r in words}
    _, state = _bpe_python_replay(vocab, BPE_STEPS)
    doc_words = docs.select("doc_id", F.explode(tokens("text")).alias("w")).collect()
    expected: dict[int, int] = {}
    for r in doc_words:
        expected[r["doc_id"]] = expected.get(r["doc_id"], 0) + len(state[r["w"]])
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_encode_token_count(spark, sf_dir).collect()
    }
    assert got == expected
    tc = {r["doc_id"]: r["n_tokens"] for r in token_count(spark, sf_dir).collect()}
    for d, n in got.items():
        assert n >= tc[d]  # every word is >= 1 symbol


def test_bpe_exhausted_merge_supply_matches_oracle(spark, tmp_path):
    """A corpus whose merge supply dries up before BPE_STEPS (single-char
    words only) must agree between the Spark loop (break, keep last
    state) and the oracle (LEFT JOIN step = no-op): the trainer emits an
    empty rule table and the encoder still emits real per-doc counts."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vacancy_analyser_spark.plans.registry import all_specs
    from vacancy_analyser_spark.schemas import TESTDATA_TABLES

    out = tmp_path / "degen"
    out.mkdir()
    for t in TESTDATA_TABLES:
        if t == "documents":
            continue
        pq.write_table(
            pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet").empty_table(),
            str(out / f"{t}.parquet"),
        )
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b c", "a a", "b"], pa.string()),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([5, 3, 1], pa.int64()),
        }
    )
    pq.write_table(docs, str(out / "documents.parquet"))
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{out}/{t}.parquet'")
    for key, expect_rows in (("bpe_train_merges", 0), ("bpe_encode_token_count", 3)):
        spec = all_specs()[key]
        s = sorted(tuple(r) for r in spec.fn(spark, str(out)).collect())
        d = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
        assert s == d, key
        assert len(s) == expect_rows, key
    # the encoder's counts on an unmergeable corpus are the char counts
    enc = dict(
        (r["doc_id"], r["n_bpe_tokens"])
        for r in all_specs()["bpe_encode_token_count"].fn(spark, str(out)).collect()
    )
    assert enc == {0: 3, 1: 2, 2: 1}


def test_bpe_apply_frozen_rules_matches_trained_encoder(spark, sf_dir):
    """bpe_apply_rules given the trainer's own rules must reproduce
    bpe_encode_token_count exactly — the frozen-vocab train-once/apply-
    anywhere contract."""
    from vacancy_analyser_spark.plans.textops import (
        bpe_apply_rules,
        bpe_encode_token_count,
        bpe_train_merges,
    )

    rules = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train_merges(spark, sf_dir).orderBy("step").collect()
    ]
    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_apply_rules(docs, rules).collect()
    }
    expected = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_encode_token_count(spark, sf_dir).collect()
    }
    assert got == expected
    # frozen rules applied to a DIFFERENT corpus slice still encode it
    half = docs.filter("doc_id % 2 = 0")
    part = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_apply_rules(half, rules).collect()}
    assert part == {d: n for d, n in expected.items() if d % 2 == 0}
