"""Streaming corpus ingest with deduplication: the production loop that
ties the dedup suite together — each arriving micro-batch of documents is
gated against the ACCUMULATED corpus (exact fingerprints, then asymmetric
near-dup shingles) and only survivors are appended.

This is the foreachBatch composition of three batch operators the engine
already proves individually: exact_dedup's fingerprint (plans/dedup.py),
incremental_dedup's asymmetric new×corpus candidate join (candidates
linear in the increment — old×old pairs never generated), and the
snapshot store's append lifecycle (streaming/snapshot_stream.py). State is
the corpus itself (a parquet directory), not operator memory: restarts
resume from the durable corpus, and the whole loop is deterministic given
the batch order (pinned by sequential replay in tests/test_streaming.py).

At 100 TB: the corpus side of the near-dup join is the standing shingle
table (bucketed — the BucketedStateStore pattern — so repeat increments
shuffle only the new batch); fingerprints are a 128-bit column join; the
append writes partitioned by ingest date. The per-batch cost scales with
the BATCH, not the corpus, which is the whole point.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import normalize_ws, tokens
from ..plans.dedup import JACCARD_T, _bigrams


def dedup_gate(
    spark: SparkSession,
    batch: DataFrame,
    corpus: DataFrame | None,
    jaccard_t: float = JACCARD_T,
) -> DataFrame:
    """Survivors of one batch against an optional existing corpus.

    Order of gates (each narrows the next one's input):
    1. in-batch exact dedup — keep min(doc_id) per fingerprint;
    2. corpus exact dedup — anti-join on fingerprint;
    3. corpus near-dup — asymmetric shingle join (batch×corpus ONLY),
       exact Jaccard ≥ ``jaccard_t`` kills the batch doc.

    In-batch NEAR dups deliberately survive until a later batch sees them
    in the corpus — the same one-sided contract as incremental_dedup
    (batch-internal near-dup is a separate, quadratic-in-batch question a
    pipeline schedules independently)."""
    fp = F.md5(normalize_ws("text")).alias("fingerprint")
    b = batch.select("doc_id", "text", fp)
    # gate 1: in-batch exact (deterministic keeper)
    keep = b.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    b = b.join(keep, ["fingerprint", "doc_id"], "left_semi")
    if corpus is None:
        return b.select("doc_id", "text")
    c = corpus.select("doc_id", "text", fp)
    # gate 2: corpus exact
    b = b.join(c.select("fingerprint"), "fingerprint", "left_anti")
    # gate 3: corpus near-dup — the incremental_dedup shape: new-side
    # shingles vs old-side shingles only, candidates linear in the batch
    def shingles(df: DataFrame) -> DataFrame:
        toks = df.select("doc_id", tokens("text").alias("toks"))
        return toks.select(
            "doc_id", F.explode(F.array_distinct(_bigrams("toks"))).alias("bigram")
        ).select("doc_id", F.xxhash64("bigram").alias("bh"))

    bg, cg = shingles(b).alias("a"), shingles(c).alias("o")
    b_sizes = bg.groupBy("doc_id").agg(F.count("*").alias("na"))
    c_sizes = cg.groupBy("doc_id").agg(F.count("*").alias("nb"))
    inter = (
        bg.join(cg, F.col("a.bh") == F.col("o.bh"))
        .groupBy(F.col("a.doc_id").alias("new_id"), F.col("o.doc_id").alias("old_id"))
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    kill = (
        inter.join(b_sizes.withColumnRenamed("doc_id", "new_id"), "new_id")
        .join(c_sizes.withColumnRenamed("doc_id", "old_id"), "old_id")
        .filter(jac >= F.lit(jaccard_t))
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )
    return b.join(kill, "doc_id", "left_anti").select("doc_id", "text")


def corpus_ingest_stream(
    docs: DataFrame, corpus_path: str, jaccard_t: float = JACCARD_T
):
    """Wire ``dedup_gate`` into a streaming query: returns a DataStreamWriter
    whose foreachBatch reads the durable corpus, gates the batch, and
    appends survivors. Caller starts it with checkpointing:

        corpus_ingest_stream(stream, path).option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
    """

    def step(batch: DataFrame, _bid: int) -> None:
        spark = batch.sparkSession
        corpus = None
        if os.path.isdir(corpus_path) and any(
            f.endswith(".parquet") for f in os.listdir(corpus_path)
        ):
            corpus = spark.read.parquet(corpus_path)
        survivors = dedup_gate(spark, batch, corpus, jaccard_t)
        survivors.write.mode("append").parquet(corpus_path)

    return docs.select("doc_id", "text").writeStream.foreachBatch(step)
