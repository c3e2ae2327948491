"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(SURVEY.md §2.11 [ext] — north-star requirement, no reference counterpart).

Design for 100 TB of media:
- media payloads are ``binary`` columns beside a typed metadata struct —
  parquet stores them row-group-compressed and column pruning means
  metadata-only queries never touch payload bytes;
- decode / feature-extract runs as mapInPandas over Arrow batches: payloads
  stream through Python in bounded batches (spark.sql.execution.arrow.
  maxRecordsPerBatch), never materializing a partition in one list;
- partition sizing for media tables wants maxRecordsPerFile tuned by payload
  size, not row count — writers should target ~128 MB files.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode step is injected; ``fake_image_features`` is the deterministic stand-
in used by tests — the Spark-side plumbing (schema, batching, UDF
signatures) is real and is what this module asserts.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def real_decode(payload: bytes, mime: str) -> list[float]:
    """The production decode hook — requires codec libraries."""
    raise NotImplementedError(
        "media codecs are not available in this environment; inject a "
        "decode_fn or use fake_image_features for plumbing tests"
    )


def fake_image_features(payload: bytes, mime: str, dim: int = 8) -> list[float]:
    """Deterministic stand-in decoder: sha256-seeded pseudo-embedding.
    Stable across processes/engines, so tests can assert exact values."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i] / 255.0 for i in range(dim)]


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], list[float]] = fake_image_features,
) -> DataFrame:
    """Decode+featurize media payloads via mapInPandas (Arrow batches).

    One Python roundtrip per batch, payload bytes pruned from the output —
    downstream similarity joins run on the small feature column.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_fn(p if p is not None else b"", m or "")
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "payload_sha": [
                        hashlib.sha256(p if p is not None else b"").hexdigest() for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def fake_resize(payload: bytes, mime: str, width: int, height: int) -> bytes:
    """Deterministic stand-in resizer: tags the payload hash with the target
    box. Output depends only on (payload, target), as a real resize would."""
    h = hashlib.sha256(payload or b"").digest()
    return b"RSZ|%dx%d|" % (width, height) + h[:16]


def resize_images(
    media: DataFrame,
    max_width: int = 512,
    max_height: int = 512,
    resize_fn: Callable[[bytes, str, int, int], bytes] = fake_resize,
) -> DataFrame:
    """Resize image payloads to fit a bounding box via mapInPandas.

    The aspect-preserving target geometry is computed JVM-side from metadata
    (pure Column arithmetic, codegen) so rows already inside the box skip
    Python entirely — at 100 TB the usual case is most images pass through
    untouched and only the oversized tail pays the Arrow round-trip. The
    decode-resize-encode itself is the injected ``resize_fn`` hook
    (real_decode's sibling; PIL is not in this container). Output schema ==
    input schema, so resize composes with extract_features / writers."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_width) / F.col("meta.width"),
        F.lit(max_height) / F.col("meta.height"),
    )
    target = media.select(
        "*",
        F.when(
            F.col("mime").startswith("image/") & (scale < 1.0),
            F.struct(
                F.floor(F.col("meta.width") * scale).cast("int").alias("w"),
                F.floor(F.col("meta.height") * scale).cast("int").alias("h"),
            ),
        ).alias("_target"),
    )
    passthrough = target.filter(F.col("_target").isNull()).drop("_target")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized, widths, heights = [], [], []
            for p, m, t in zip(pdf["payload"], pdf["mime"], pdf["_target"]):
                w, h = int(t["w"]), int(t["h"])
                resized.append(resize_fn(p if p is not None else b"", m or "", w, h))
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": resized,
                    "mime": pdf["mime"],
                    "meta": [
                        {"width": w, "height": h, "duration_ms": old["duration_ms"]}
                        for w, h, old in zip(widths, heights, pdf["meta"])
                    ],
                }
            )

    shrunk = target.filter(F.col("_target").isNotNull()).mapInPandas(run, MEDIA_SCHEMA)
    return passthrough.unionByName(shrunk)


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must never read payload bytes (column
    pruning; verify with .explain: ReadSchema excludes `payload`)."""
    return media.groupBy("mime").agg(
        F.count("*").alias("n_media"),
        F.avg(F.col("meta.width")).alias("avg_width"),
        F.avg(F.col("meta.duration_ms")).alias("avg_duration_ms"),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (explode over a sequence bounded by duration). The decode of
    each frame is the injected hook; the *plumbing* — row explosion sized by
    metadata, not by payload — is the part that matters at scale."""
    n_frames = F.greatest(F.lit(1), (F.col("meta.duration_ms") / every_ms).cast("int"))
    return media.select(
        "media_id",
        "mime",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).select(
        "media_id", "mime", "frame_idx", (F.col("frame_idx") * every_ms).alias("frame_offset_ms")
    )
