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
