"""Document chunking operators (SURVEY §2.10 UDTF surface, §2.11 [ext]).

The production path is the JVM-side plan in plans/textops.py::
doc_chunk_overlap (explode over a sequence + array slices — no Python).
This module adds the equivalent Python UDTF for the genuinely-custom case:
chunking logic that can't be expressed as array algebra (sentence-aware
boundaries, tokenizer-in-the-loop, chunk-level models). The UDTF is the
correct tier for one-row→many-rows Python logic — it streams rows through
a lateral join instead of materializing per-row lists in a collected
driver loop.

The test (tests/test_corpus_pipeline.py) pins the UDTF's output to the
JVM plan's semantics on the same inputs, so swapping tiers cannot drift.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, chunk_len int, chunk_text string")
class ChunkTokens:
    """Overlapping token-window chunker: yields one row per chunk of
    ``size`` whitespace tokens with ``size - stride`` overlap; the short
    tail is kept; empty/None text yields one empty chunk (mirroring the
    JVM plan's n<=size → 1 chunk rule)."""

    def eval(self, text: str | None, size: int, stride: int):  # noqa: D102
        # mirrors functions/text.py::tokens exactly, including the edge
        # where normalize_ws('') splits to [''] (one empty token)
        toks = " ".join((text or "").lower().split()).split(" ")
        n = len(toks)
        if n <= size:
            yield 0, n, " ".join(toks)
            return
        n_chunks = -(-(n - size) // stride) + 1  # ceil((n-size)/stride)+1
        for c in range(n_chunks):
            chunk = toks[c * stride : c * stride + size]
            yield c, len(chunk), " ".join(chunk)
