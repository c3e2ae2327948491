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

Cost contract: survivors are stored WITH their fingerprint and shingle
hashes, so later batches never re-run text processing (md5, tokenize,
bigram) over the corpus — per-batch TEXT work scales with the batch. The
corpus-side join still reads the standing shingle column; at 100 TB that
column lives as a bucketed table (the BucketedStateStore pattern) so
repeat increments shuffle only the new batch, and the append writes
partitioned by ingest date.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_ws, tokens
from ..plans.dedup import JACCARD_T, _bigrams

#: Columns the durable corpus carries. fingerprint/shingles are the
#: precomputed artifacts that keep per-batch text work batch-sized.
CORPUS_COLUMNS = ("doc_id", "text", "fingerprint", "shingles")

#: How often a stream's memoized corpus read re-infers the footer schema
#: to verify nothing rewrote the corpus under it (see _read_corpus).
_DRIFT_CHECK_EVERY = 16


def _with_artifacts(df: DataFrame) -> DataFrame:
    """(doc_id, text) → + fingerprint (md5 of normalized text) + shingles
    (distinct word-bigram xxhash64 array). Computed once per document, at
    ingest; stored so no later batch re-derives them."""
    toks = df.select("doc_id", "text", tokens("text").alias("toks"))
    return toks.select(
        "doc_id",
        "text",
        F.md5(normalize_ws("text")).alias("fingerprint"),
        F.transform(
            F.array_distinct(_bigrams("toks")), lambda bg: F.xxhash64(bg)
        ).alias("shingles"),
    )


def dedup_gate(
    batch: DataFrame, corpus: DataFrame | None, jaccard_t: float = JACCARD_T
) -> DataFrame:
    """Survivors of one (doc_id, text) batch against an optional existing
    corpus, returned WITH their stored artifacts (CORPUS_COLUMNS).

    Order of gates (each narrows the next one's input):
    1. in-batch exact dedup — keep min(doc_id) per fingerprint;
    2. corpus exact dedup — anti-join on the corpus's STORED fingerprint;
    3. corpus near-dup — asymmetric shingle join (batch×corpus ONLY, from
       the corpus's STORED shingle arrays), exact Jaccard ≥ ``jaccard_t``
       kills the batch doc.

    In-batch NEAR dups deliberately survive until a later batch sees them
    in the corpus — the same one-sided contract as incremental_dedup
    (batch-internal near-dup is a separate, quadratic-in-batch question a
    pipeline schedules independently). A corpus frame without the stored
    artifact columns (an externally-built corpus) gets them derived on
    the fly — correct, just not the fast path."""
    # gate 0: intra-batch re-delivery — a source that re-delivers the SAME
    # doc_id within one micro-batch would otherwise pass gate 1 twice (the
    # min-doc_id semi-join keeps every row of the keeper id) and append
    # the document to the corpus twice. ONE window keeps exactly one row
    # per doc_id, keyed (fingerprint, text) — fully DETERMINISTIC even for
    # payloads that normalize equal (same fingerprint, different raw text),
    # where a fingerprint-only tiebreak or a dropDuplicates subset would
    # let partition scan order pick the surviving text
    from pyspark.sql import Window

    # Round-robin the batch across the cluster BEFORE the per-row text work:
    # a file-source trigger delivers whole files, so a small-file micro-batch
    # otherwise reaches the tokenize+md5+shingle projection as ONE task with
    # every other core idle (guide §2.5 — measured on corpus_ingest_replay:
    # 2.5-6 s single-task stages per trigger). The exchange carries the
    # CHANGESET once — never the corpus. Gated on the batch's own scan
    # width (the spread_small contract, r12 ADVICE): a backlogged
    # availableNow batch 0 whose file scan already yields >= cluster-width
    # partitions is balanced as-is, and the unconditional form would both
    # pay a full raw-text shuffle and CAP it to defaultParallelism.
    spread = batch.sparkSession.sparkContext.defaultParallelism
    src = batch.select("doc_id", "text")
    if src.rdd.getNumPartitions() < spread:
        src = src.repartition(spread)
    b = _with_artifacts(src)
    b = (
        b.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("fingerprint", "text")
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # gate 1: in-batch exact (deterministic keeper)
    keep = b.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    b = b.join(keep, ["fingerprint", "doc_id"], "left_semi")
    if corpus is None:
        return b.select(*CORPUS_COLUMNS)
    # b feeds all three corpus gates AND the final anti-join; without a
    # materialization each consumer re-runs the whole tokenize+md5+shingle
    # pipeline inline (the executed plan carried THREE copies of it —
    # measured 2.5-6 s of duplicated single-task text work per trigger).
    # One changeset-sized localCheckpoint runs it once (the same trick the
    # ANN add/delete folds use for their read-then-append frames). NOTE
    # localCheckpoint is non-replayable storage: losing an executor
    # mid-trigger kills this batch and the STREAM retries it — the
    # foreachBatch at-least-once contract this loop is already built for
    # (the fingerprint anti-join absorbs the replay), so cheap local
    # blocks are the right trade at changeset granularity.
    b = b.localCheckpoint(eager=True)
    c = corpus if "shingles" in corpus.columns else _with_artifacts(
        corpus.select("doc_id", "text")
    )
    # gate 2: corpus exact — a column anti-join, no corpus text touched
    b = b.join(c.select("fingerprint"), "fingerprint", "left_anti")
    # gate 3: corpus near-dup — the incremental_dedup shape: new-side
    # shingles vs old-side STORED shingles, candidates linear in the batch
    bg = b.select("doc_id", F.explode("shingles").alias("bh")).alias("a")
    cg = c.select("doc_id", F.explode("shingles").alias("bh")).alias("o")
    b_sizes = b.select("doc_id", F.size("shingles").alias("na"))
    c_sizes = c.select("doc_id", F.size("shingles").alias("nb"))
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
    return b.join(kill, "doc_id", "left_anti").select(*CORPUS_COLUMNS)


def _read_corpus(spark, corpus_path: str, memo: dict | None = None) -> DataFrame | None:
    """Read the durable corpus, or None before the first append. Probed by
    attempting the read — NOT by driver-local os.path checks, which would
    silently report 'no corpus' for hdfs:///s3a:// paths and disable every
    corpus-side gate on exactly the deployments this loop targets.

    ``memo`` (one dict per owning stream) skips the per-trigger footer
    schema-inference job after the first successful read: the ingest loop
    is the corpus's only writer and appends CORPUS_COLUMNS rows verbatim,
    so the schema cannot change under the stream's own feet.

    The returned frame is spread (io.spread_small_path — input-gated,
    no-op at scale) because a young corpus is a handful of small files
    whose scan packs into 1-2 tasks, and the gate's three corpus
    consumers (fingerprint anti-join, shingle explode, sizes) each run
    their scan-side work at that width with the rest of the cluster
    idle."""
    from pyspark.errors.exceptions.captured import AnalysisException

    from ..io import spread_small_path

    schema = memo.get(corpus_path) if memo is not None else None
    try:
        if schema is not None:
            # Drift check (r12 ADVICE): an explicit-schema read of a corpus
            # some OTHER writer rewrote (migration, column rename) would
            # silently null the missing columns and disable the dedup gates
            # with no error. The single-writer contract makes that a
            # misconfiguration, so it must fail LOUDLY: every Nth memoized
            # read re-infers the footer schema and compares — one bounded
            # inference job per N triggers, not per trigger.
            n = memo["__memo_reads"] = memo.get("__memo_reads", 0) + 1
            if n % _DRIFT_CHECK_EVERY == 0:
                fresh = spark.read.parquet(corpus_path).schema
                if [(f.name, f.dataType) for f in fresh] != [
                    (f.name, f.dataType) for f in schema
                ]:
                    raise RuntimeError(
                        f"corpus schema at {corpus_path} drifted under the "
                        f"ingest stream's memo (expected {schema.simpleString()}, "
                        f"found {fresh.simpleString()}) — a second writer "
                        "violated the single-writer contract"
                    )
            return spread_small_path(
                spark.read.schema(schema).parquet(corpus_path), spark, corpus_path
            )
        df = spark.read.parquet(corpus_path)
        df.schema  # force analysis so an empty/missing path raises HERE
        if memo is not None:
            memo[corpus_path] = df.schema
        return spread_small_path(df, spark, corpus_path)
    except AnalysisException:
        return None


def corpus_ingest_stream(
    docs: DataFrame, corpus_path: str, jaccard_t: float = JACCARD_T
):
    """Wire ``dedup_gate`` into a streaming query: returns a DataStreamWriter
    whose foreachBatch reads the durable corpus, gates the batch, and
    appends survivors. Caller starts it with checkpointing:

        corpus_ingest_stream(stream, path).option("checkpointLocation", ck)
            .trigger(availableNow=True).start()

    Replays of a committed-but-uncheckpointed batch are idempotent: its
    survivors are already in the corpus, so the fingerprint anti-join
    drops every re-delivered row.
    """

    memo: dict = {}  # per-stream schema memo (see _read_corpus)

    def step(batch: DataFrame, _bid: int) -> None:
        spark = batch.sparkSession
        corpus = _read_corpus(spark, corpus_path, memo)
        survivors = dedup_gate(batch, corpus, jaccard_t)
        survivors.write.mode("append").parquet(corpus_path)

    return docs.select("doc_id", "text").writeStream.foreachBatch(step)
