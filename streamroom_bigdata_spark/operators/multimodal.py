"""Multimodal column plumbing (SURVEY.md §2.11 L5).

Images/audio/video are carried as opaque ``binary`` columns with a typed
metadata struct alongside. The Spark-side machinery — schema, Arrow batch
shape, ``mapInPandas`` signature, partitioning — is real and tested; the
actual byte decode is STUBBED (no image/audio libraries in this container):
``decode_features`` computes deterministic byte-level statistics where a real
pipeline would call the decoder, and ``decode_image`` raises
``NotImplementedError`` with the integration point documented.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def multimodal_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical multimodal layout: (asset_id, payload binary, meta
    struct<lang,source,n_chars>, embedding-ready text). Built here from the
    documents fixture (text bytes stand in for media bytes); a real ingest
    would read the bytes from object storage with the same schema."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct("lang", "source", "n_chars").alias("meta"),
    )


@register(
    "multimodal_manifest",
    """
    SELECT doc_id AS asset_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           sha256(text) AS content_hash,
           lang AS meta_lang,
           source AS meta_source
    FROM documents
    """,
)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest over binary payloads (L5): byte size, content hash, flattened
    metadata — the asset-catalog query every multimodal pipeline starts from."""
    assets = multimodal_table(spark, sf_dir)
    return assets.select(
        "asset_id",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2(F.col("payload").cast("string"), 256).alias("content_hash"),
        F.col("meta.lang").alias("meta_lang"),
        F.col("meta.source").alias("meta_source"),
    )


# mean byte is carried as integer micro-units (floor(sum*1e6 / n)) rather
# than a rounded double: floor is unambiguous across engines, while
# round-half differs (Python rounds half-to-even, DuckDB half-away) and
# power-of-two payload lengths make exact .5 ties representable.
DECODE_SCHEMA = (
    "asset_id long, n_bytes int, mean_byte_micro long, first_byte int, "
    "last_byte int, byte_checksum long"
)


def decode_image(payload: bytes) -> dict:
    """Real decoder integration point — wire Pillow/torchvision/ffmpeg here
    when the runtime has them. Deliberately unimplemented in this container."""
    raise NotImplementedError(
        "image/audio decode requires media libraries not present in this "
        "environment; decode_features() provides the deterministic stub"
    )


# The fixture corpus is pure ASCII (asserted in tests/test_multimodal
# plumbing tests), so per-character code points ARE the payload bytes and
# DuckDB can replay the byte-statistics kernel with unnest + ascii().
decode_features_oracle = """
WITH bytes AS (
  SELECT doc_id, sum(ascii(ch)) AS bsum
  FROM (
    SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
  )
  GROUP BY doc_id
)
SELECT d.doc_id AS asset_id,
       CAST(length(d.text) AS INT) AS n_bytes,
       CAST(CASE WHEN length(d.text) = 0 THEN 0
                 ELSE (b.bsum * 1000000) // length(d.text)
            END AS BIGINT) AS mean_byte_micro,
       CAST(CASE WHEN length(d.text) = 0 THEN -1
                 ELSE ascii(substr(d.text, 1, 1)) END AS INT) AS first_byte,
       CAST(CASE WHEN length(d.text) = 0 THEN -1
                 ELSE ascii(substr(d.text, length(d.text), 1)) END AS INT)
         AS last_byte,
       CAST(coalesce(b.bsum, 0) % 1000000007 AS BIGINT) AS byte_checksum
FROM documents d LEFT JOIN bytes b USING (doc_id)
"""


@register("multimodal_decode_features", decode_features_oracle)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas`` (L5): the
    per-batch Arrow plumbing is exactly what a real decode uses — iterate
    record batches, run a vectorized kernel per batch, emit a typed frame.
    The kernel here is a deterministic byte-statistics stub standing in for
    decode (see :func:`decode_image`)."""
    assets = multimodal_table(spark, sf_dir).select("asset_id", "payload")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "mean_byte_micro": payloads.map(
                        lambda b: (sum(b) * 1_000_000) // len(b) if len(b) else 0
                    ).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "last_byte": payloads.map(
                        lambda b: b[-1] if len(b) else -1
                    ).astype("int32"),
                    "byte_checksum": payloads.map(
                        lambda b: sum(b) % 1_000_000_007
                    ).astype("int64"),
                }
            )

    return assets.mapInPandas(extract, DECODE_SCHEMA)


FRAME_SIZE = 32     # bytes per "frame" of the payload
SAMPLE_EVERY = 4    # keep every 4th frame

frame_sample_oracle = f"""
WITH f AS (
  SELECT doc_id AS asset_id, text,
         unnest(range(0, CAST(floor(length(text) / {FRAME_SIZE}) AS BIGINT),
                      {SAMPLE_EVERY})) AS frame_idx
  FROM documents
  WHERE length(text) >= {FRAME_SIZE}
)
SELECT asset_id, CAST(frame_idx AS INT) AS frame_idx,
       sha256(substr(text, CAST(frame_idx * {FRAME_SIZE} + 1 AS BIGINT),
                     {FRAME_SIZE})) AS frame_hash
FROM f
"""


@register("multimodal_frame_sample", frame_sample_oracle)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided frame sampling over binary payloads (L5): treat the payload
    as FRAME_SIZE-byte frames and keep every SAMPLE_EVERY-th — the
    video-keyframe access pattern, as a pure-plan explode + binary substring
    (one row → many frames, no Python). The oracle slices the text and
    encodes it, which is byte-identical for the ASCII fixture; real media
    bytes would keep the Spark side unchanged."""
    assets = multimodal_table(spark, sf_dir).select("asset_id", "payload")
    n_frames = F.floor(F.octet_length("payload") / FRAME_SIZE)
    return (
        assets.filter(F.octet_length("payload") >= FRAME_SIZE)
        .select(
            "asset_id",
            "payload",
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    (n_frames - 1).cast("bigint"),
                    F.lit(SAMPLE_EVERY).cast("bigint"),
                )
            ).alias("frame_idx"),
        )
        .select(
            "asset_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.sha2(
                F.expr(
                    f"substring(payload, frame_idx * {FRAME_SIZE} + 1, {FRAME_SIZE})"
                ),
                256,
            ).alias("frame_hash"),
        )
    )
