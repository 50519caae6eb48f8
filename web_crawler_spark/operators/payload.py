"""Image-payload validation: the input_hint per-row invariant as a distributed op.

Joins crawled pages to the images payload table on image_id (broadcast when the
dim side is small; hash join otherwise — Catalyst decides) and runs the
decode/validate mapInPandas stage: decoded-pixel allclose vs the reference
decode (PSNR ≥ 40 dB for lossy formats), phash match, caption string equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import VALIDATION_SCHEMA, decode_validate


def validate_payload(crawl_log: DataFrame, images: DataFrame) -> DataFrame:
    """→ one validation row per crawled page with an image payload."""
    crawled = crawl_log.select(
        F.col("payload.image_id").alias("image_id"),
        F.col("payload.caption").alias("crawled_caption"),
    ).filter(F.col("image_id").isNotNull())
    joined = crawled.join(images, "image_id", "inner").select(
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash", "crawled_caption"
    )
    return joined.mapInPandas(decode_validate, VALIDATION_SCHEMA)


def payload_summary(validation: DataFrame) -> DataFrame:
    return validation.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("decode_ok"), 1).otherwise(0)).alias("n_decode_ok"),
        F.sum(F.when(F.col("pixels_ok"), 1).otherwise(0)).alias("n_pixels_ok"),
        F.sum(F.when(F.col("phash_ok"), 1).otherwise(0)).alias("n_phash_ok"),
        F.sum(F.when(F.col("caption_ok"), 1).otherwise(0)).alias("n_caption_ok"),
        F.min("psnr_db").alias("min_psnr_db"),
    )
