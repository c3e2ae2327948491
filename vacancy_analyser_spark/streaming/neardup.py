"""Streaming near-dup: MinHash-LSH band state over a document stream.

The streaming generalization of ``minhash_lsh_dedup`` (plans/dedup.py) and
the per-ingest companion of ``incremental_dedup``: every arriving document
is checked against EVERYTHING seen so far, in O(its band buckets), not
O(corpus). The reference's seen-id set (get_vacancies.py:67-72) is the
exact-key special case of this operator.

Design:

1. **Signatures are row-local Column algebra** — the batch path computes
   MinHash via explode + groupBy(min); on a stream that aggregation would
   pin per-doc state forever. Instead each component is
   ``array_min(transform(hashes, mix_i))`` over the materialized bigram
   array: the same Carter-Wegman values (constants shared with the batch
   module), zero aggregation state, whole-stage codegen.
2. **State is keyed by (band_id, band_val)** — the LSH bucket. Per bucket,
   ``applyInPandasWithState`` keeps the (doc_id, signature) list seen so
   far; an arriving doc emits a pair per stored doc it collides with.
3. **Cross-band dedup without a second stateful stage** — a colliding pair
   would surface in every band it agrees on; both signatures are in hand,
   so a bucket emits the pair only when ITS band is the pair's
   first-agreeing band (the same narrow filter the batch simhash path
   uses). Exactly one bucket owns each pair.

Scale: state size is O(corpus × (1 id + N_MINHASH longs)) sharded by band
value across the state store — RocksDB-backed on a cluster, far smaller
than the corpus (no text is stored). Hot buckets (a band value shared by
many near-identical docs) concentrate in one key: production deployments
shard such buckets by salting the band value with a doc-hash suffix at
the cost of recall on the salted fraction, or TTL-expire state
(GroupStateTimeout) when the dedup horizon is bounded — both are knobs on
this operator, not rewrites. The batch twin is pinned equivalent in
tests/test_streaming.py (streamed pair set == minhash_lsh_dedup's).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..plans.dedup import BAND_ROWS, MINHASH_A, MINHASH_B, MINHASH_P, N_MINHASH, _bigrams

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

N_BANDS = N_MINHASH // BAND_ROWS

OUTPUT_SCHEMA = "a_id bigint, b_id bigint"
#: Flattened per-bucket corpus: ids[i] owns sigs[N_MINHASH*i : N_MINHASH*(i+1)].
STATE_SCHEMA = "ids array<bigint>, sigs array<bigint>"


def _mix(s: int, h: Column) -> Column:
    return (F.lit(MINHASH_A[s]) * h + F.lit(MINHASH_B[s])) % F.lit(MINHASH_P)


def minhash_banded(docs: DataFrame) -> DataFrame:
    """(doc_id, sig array<bigint>, band_id, band_val) — one row per band.

    Works on static AND streaming frames: no aggregation, no state — the
    signature is a pure function of the row. Docs with no bigrams (<2
    tokens) produce no rows, matching the batch path (their shingle set is
    empty; near-dup over nothing is undefined).
    """
    # guard on the PRE-array column (bigrams exist iff >= 2 tokens): a
    # size() filter on the derived bg array gets pushed below upstream
    # exchanges with the whole tokenize+bigram pipeline inlined into the
    # filter condition — the token_ngrams rule (functions/text.py), the
    # same O(len^2)-ish inlining r12 removed from repetition_ngram_ratio
    toks = docs.select("doc_id", tokens("text").alias("toks")).filter(
        F.size("toks") >= 2
    )
    bg = toks.select("doc_id", F.array_distinct(_bigrams("toks")).alias("bg"))
    hs = bg.select(
        "doc_id",
        F.transform(
            "bg", lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("bigint")
        ).alias("hs"),
    )
    def _mixer(s: int):
        # a SINGLE-param lambda: pyspark passes (element, index) to any
        # two-param lambda, so the `s=s` default-arg idiom would silently
        # bind s to the array index Column
        return lambda h: _mix(s, h)

    sigs = hs.select(
        "doc_id",
        F.array(*[F.array_min(F.transform("hs", _mixer(s))) for s in range(N_MINHASH)]).alias("sig"),
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band_id"),
                (
                    F.element_at("sig", band * BAND_ROWS + 1) * F.lit(MINHASH_P)
                    + F.element_at("sig", band * BAND_ROWS + 2)
                ).alias("band_val"),
            )
            for band in range(N_BANDS)
        ]
    )
    return sigs.select("doc_id", "sig", F.explode(band_structs).alias("bs")).select(
        "doc_id", "sig", F.col("bs.band_id").alias("band_id"), F.col("bs.band_val").alias("band_val")
    )


def _first_agreeing_band(sig_a: list[int], sig_b: list[int]) -> int | None:
    for band in range(N_BANDS):
        lo = band * BAND_ROWS
        if sig_a[lo : lo + BAND_ROWS] == sig_b[lo : lo + BAND_ROWS]:
            return band
    return None


#: Shard-mix constants: MINSTD multiplier over the Mersenne-31 modulus —
#: every intermediate stays < 2^47, identical arithmetic on the Column
#: (bigint) and Python (int) sides.
_SHARD_P = 2_147_483_647
_SHARD_A = 48_271
_SHARD_B = 9_973


def _shard(doc_id: int, band: int, salt: int) -> int:
    return ((doc_id % _SHARD_P) * _SHARD_A + band * _SHARD_B) % _SHARD_P % salt


def _owning_band(sig_a: list[int], sig_b: list[int], a: int, b: int, salt: int) -> int | None:
    """The ONE bucket allowed to emit the pair under salting: the first
    band where the signatures agree AND both docs hash to the same shard
    (co-sharding is exactly the condition for the pair to meet there)."""
    for band in range(N_BANDS):
        lo = band * BAND_ROWS
        if sig_a[lo : lo + BAND_ROWS] == sig_b[lo : lo + BAND_ROWS] and _shard(
            a, band, salt
        ) == _shard(b, band, salt):
            return band
    return None


def recommend_salt(history: DataFrame, max_bucket_rows: int = 100_000) -> int:
    """Pick ``bucket_salt`` for ``streaming_near_dup`` from data instead of
    by hand: probe the LSH bucket-size distribution of a representative
    STATIC corpus (yesterday's ingest, a sampled backfill) and return the
    smallest S whose expected shard size fits ``max_bucket_rows`` —
    S = ceil(max bucket / budget), 1 when every bucket already fits.

    This is the lsh_params-style planner for the hot-bucket knob: the
    trigger is automatic (derived from an observed size, not a guess) but
    decided BEFORE the stream starts, because the state key cannot change
    mid-stream — flipping a live bucket from unsalted to salted would
    strand its existing state under the old key and break the
    exactly-once emission contract (_owning_band needs every peer of a
    doc to be reachable from its shard). In-stream, the bounded-state
    levers remain TTL expiry (GroupStateTimeout) and restarting with a
    larger S from a new checkpoint; re-probing per deploy window keeps S
    tracking the corpus.

    Cost: one aggregate over minhash_banded(history) — the probe returns
    a single scalar to the driver; the banded frame itself is never
    collected."""
    if max_bucket_rows < 1:
        raise ValueError(f"max_bucket_rows must be >= 1, got {max_bucket_rows}")
    top = (
        minhash_banded(history)
        .groupBy("band_id", "band_val")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("m"))
        .first()["m"]
    )
    if top is None:
        return 1
    return max(1, -(-int(top) // max_bucket_rows))


def streaming_near_dup(docs: DataFrame, bucket_salt: int = 1) -> DataFrame:
    """Near-dup pairs over a document stream, emitted as they appear.

    ``docs`` is a streaming DataFrame with ``doc_id``/``text``. Output is
    append-mode (a_id < b_id) candidate pairs — with ``bucket_salt=1``
    (default) the same pair set the batch ``minhash_lsh_dedup`` computes
    over the union of all micro-batches (pinned by test).

    ``bucket_salt`` is the hot-bucket knob: S > 1 splits every LSH bucket
    into S state shards by a doc-hash (same band_val no longer means same
    task/state key), bounding per-key state and parallelizing a band
    value shared by a million near-identical docs. The price is recall: a
    pair is found only in a band where it ALSO co-shards, so a pair whose
    signatures agree on bands F is missed with probability
    Π_{f∈F}(1−1/S) — high-similarity pairs (agreeing on many bands)
    survive best. Deduplication stays exact: the emitting bucket is the
    pair's first agreeing AND co-sharded band, computable locally from
    the two (doc_id, signature) pairs in hand. The salted pair set is a
    deterministic function of (corpus, S), replayed exactly in the test.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if bucket_salt < 1:
        raise ValueError(f"bucket_salt must be >= 1, got {bucket_salt}")
    salt = bucket_salt

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: "GroupState"
    ) -> Iterator["pd.DataFrame"]:
        band_id = int(key[0])
        ids: list[int]
        sigs: list[int]
        if state.exists:
            stored_ids, stored_sigs = state.get
            ids, sigs = list(stored_ids), list(stored_sigs)
        else:
            ids, sigs = [], []
        out_a: list[int] = []
        out_b: list[int] = []
        seen = set(ids)
        for pdf in pdfs:
            for did, sig in zip(pdf["doc_id"], pdf["sig"]):
                did = int(did)
                # at-least-once delivery: a re-delivered doc is already in
                # state — appending it again would double its pairs on
                # every later match and grow state per DELIVERY, breaking
                # the one-bucket-one-pair append contract
                if did in seen:
                    continue
                sig = [int(x) for x in sig]
                for j, other in enumerate(ids):
                    osig = sigs[N_MINHASH * j : N_MINHASH * (j + 1)]
                    owner = (
                        _first_agreeing_band(sig, osig)
                        if salt == 1
                        else _owning_band(sig, osig, did, other, salt)
                    )
                    if owner == band_id:
                        a, b = (did, other) if did < other else (other, did)
                        out_a.append(a)
                        out_b.append(b)
                ids.append(did)
                sigs.extend(sig)
                seen.add(did)
        state.update((ids, sigs))
        yield pd.DataFrame({"a_id": out_a, "b_id": out_b})

    # Round-robin each micro-batch across the cluster BEFORE the signature
    # projection: a file-source trigger delivers whole files, so the
    # N_MINHASH array_min×transform sweep — this operator's dominant CPU —
    # otherwise runs at the batch's file-count parallelism (one task for a
    # one-file trigger, guide §2.5). The exchange carries the CHANGESET's
    # raw text once; the band explode behind it re-exchanges to the state
    # store either way, and state keys/width are untouched.
    spread = docs.sparkSession.sparkContext.defaultParallelism
    banded = minhash_banded(docs.repartition(spread))
    keys = ["band_id", "band_val"]
    if salt > 1:
        shard = (
            (F.pmod(F.col("doc_id"), F.lit(_SHARD_P)) * _SHARD_A + F.col("band_id") * _SHARD_B)
            % _SHARD_P
            % salt
        )
        banded = banded.withColumn("shard", shard.cast("int"))
        keys.append("shard")
    return banded.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
