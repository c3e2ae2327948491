"""Driver-visible multimodal queries (SURVEY §2.11 [ext]).

The media table is synthesized from `documents` (payload = utf-8 bytes of
text, duration metadata derived from n_chars) because the harness testdata
carries no binary media — the point is that the PLUMBING under these
queries (binary columns, Arrow-batched mapInPandas, metadata-sized row
explosion) is the real 100 TB path; only the codec is a stand-in
(operators/multimodal.py: real_decode raises, fake_image_features is the
deterministic test double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.multimodal import extract_features, resize_images, sample_frames
from .registry import register


def _media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → MEDIA_SCHEMA frame: payload is the text's utf-8 bytes,
    duration_ms plays 10 ms per character (deterministic from n_chars)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


@register(
    "multimodal_feature_extract",
    oracle="""
        SELECT doc_id AS media_id,
               octet_length(encode(COALESCE(text, ''))) AS n_bytes,
               sha256(COALESCE(text, '')) AS payload_sha
        FROM documents
    """,
    tags=("ext-multimodal",),
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode/featurize over Arrow batches: payloads stream through
    mapInPandas in bounded batches; the output drops the payload column so
    downstream similarity joins move only small features.

    The oracle value-checks the Python path end-to-end — byte counts and
    sha256 digests computed INSIDE the mapInPandas batches must equal
    DuckDB's native octet_length/sha256 over the same bytes. The
    pseudo-embedding column is exercised by unit-test fixtures
    (tests/test_sources_multimodal.py pins exact values) but omitted here:
    the digest already proves the same bytes flowed through."""
    media = _media_from_documents(spark, sf_dir)
    return extract_features(media).select("media_id", "n_bytes", "payload_sha")


@register(
    "multimodal_resize",
    oracle="""
        WITH media AS (
            SELECT doc_id AS media_id,
                   octet_length(encode(COALESCE(text, ''))) AS n0,
                   CASE WHEN doc_id % 10 = 0 THEN 'application/octet-stream'
                        ELSE 'image/png' END AS mime,
                   CAST(200 + (doc_id % 30) * 20 AS INT) AS w,
                   CAST(150 + (doc_id % 23) * 20 AS INT) AS h
            FROM documents
        ),
        scaled AS (
            SELECT *,
                   LEAST(1.0, 512.0 / w, 512.0 / h) AS scale,
                   (mime = 'image/png' AND LEAST(1.0, 512.0 / w, 512.0 / h) < 1.0)
                       AS shrunk
            FROM media
        )
        SELECT media_id,
               CASE WHEN shrunk THEN CAST(FLOOR(w * scale) AS INT) ELSE w END
                   AS out_width,
               CASE WHEN shrunk THEN CAST(FLOOR(h * scale) AS INT) ELSE h END
                   AS out_height,
               CAST(CASE WHEN shrunk
                         THEN 22 + length(CAST(CAST(FLOOR(w * scale) AS INT) AS VARCHAR))
                                 + length(CAST(CAST(FLOOR(h * scale) AS INT) AS VARCHAR))
                         ELSE n0 END AS BIGINT) AS n_bytes
        FROM scaled
    """,
    tags=("ext-multimodal",),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounding-box image resize over the synthesized media table. The
    aspect-preserving geometry is JVM-side Column arithmetic; only rows that
    actually shrink pay the Arrow round-trip through the injected resizer
    (fake_resize here — its output length is 22 + digits(w) + digits(h), so
    the oracle can verify byte-for-byte WHICH rows went through Python and
    what geometry they carried, without codec libraries on either engine)."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 10 == 0, F.lit("application/octet-stream"))
        .otherwise(F.lit("image/png"))
        .alias("mime"),
        F.struct(
            (F.lit(200) + (F.col("doc_id") % 30) * 20).cast("int").alias("width"),
            (F.lit(150) + (F.col("doc_id") % 23) * 20).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    return resize_images(media, 512, 512).select(
        "media_id",
        F.col("meta.width").alias("out_width"),
        F.col("meta.height").alias("out_height"),
        F.length("payload").cast("bigint").alias("n_bytes"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
        SELECT doc_id AS media_id,
               'text/plain' AS mime,
               CAST(unnest(range(GREATEST(1, CAST(FLOOR(n_chars * 10 / 1000) AS INT))))
                    AS INT) AS frame_idx,
               CAST(unnest(range(GREATEST(1, CAST(FLOOR(n_chars * 10 / 1000) AS INT))))
                    * 1000 AS INT) AS frame_offset_ms
        FROM documents
    """,
    tags=("ext-multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling as a plan: one row per sampled timestamp,
    where the explosion is sized by METADATA (duration), never by decoding
    payload bytes — at 100 TB the payload column is column-pruned out of
    this query entirely (the scan reads doc_id and n_chars only). Frame
    decode itself is the injected hook downstream."""
    media = _media_from_documents(spark, sf_dir)
    return sample_frames(media, every_ms=1000).select(
        "media_id",
        "mime",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.col("frame_offset_ms").cast("int").alias("frame_offset_ms"),
    )
