"""Multimodal-column operators: image bytes as opaque `binary` columns with
typed metadata, decode / validate / resize / feature-extract as Arrow-batched
`mapInPandas` stages.

The container has no real image libraries, so the codec is the clearly-marked
deterministic stand-in in core/imagecodec.py (WCSI container; swapping in
PIL/libvips changes only encode/decode). The Spark-side plumbing — binary
through Arrow, batch shapes, schemas, partitioning — is real and is what
these queries exercise.

These are the non-SQL-expressible entries: no DuckDB oracle (binary payloads
+ numpy decode), so the driver records the weaker rows-only check; exactness
is covered by tests/test_payload.py and tests/test_analytics.py instead.

The images here are synthesized deterministically from `documents.doc_id`
(one image per doc, seed-keyed) — no external data, same shape as the
input_hint images table.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import imagecodec
from ..functions import udfs
from ..schemas import IMAGES_SCHEMA
from .common import table

N_IMAGES = 200  # images synthesized per run (first N doc_ids)


def _images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic images table keyed on doc_id — exact input_hint shape."""
    ids = table(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(N_IMAGES)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                row = imagecodec.image_row(f"img-{doc_id}", seed=42)
                row["caption"] = f"caption for img-{doc_id}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGES_SCHEMA.fields])

    return ids.repartition(8, "doc_id").mapInPandas(gen, IMAGES_SCHEMA)


def multimodal_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + per-row invariant check (input_hint: pixel allclose / PSNR >= 40
    for lossy, phash match, caption equality), aggregated per format."""
    imgs = _images(spark, sf_dir).withColumn("crawled_caption", F.col("caption"))
    checked = imgs.mapInPandas(udfs.decode_validate, udfs.VALIDATION_SCHEMA)
    agg_ok = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0)).alias(c.replace("_ok", "_pass"))
    return (
        checked.groupBy("fmt")
        .agg(
            F.count("*").alias("n_images"),
            agg_ok("decode_ok"),
            agg_ok("pixels_ok"),
            agg_ok("phash_ok"),
            agg_ok("caption_ok"),
            F.min(F.coalesce("psnr_db", F.lit(99.0))).alias("min_psnr_db"),
        )
        .orderBy("fmt")
    )


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("brightness", T.DoubleType(), True),
        T.StructField("thumb8", T.ArrayType(T.DoubleType()), True),  # 8x8 gray resize
    ]
)


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: decode binary -> per-channel means + 8x8 block-mean resize.

    The resize is the frame-sample/thumbnail pattern: at 100 TB this stage is
    the one that owns the Arrow batch size (bytes are large — keep
    spark.sql.execution.arrow.maxRecordsPerBatch small)."""
    for pdf in batches:
        rows = []
        for r in pdf.itertuples(index=False):
            rec = dict(image_id=r.image_id, fmt=None, w=None, h=None, mean_r=None,
                       mean_g=None, mean_b=None, brightness=None, thumb8=None)
            try:
                px, w, h, fmt = imagecodec.decode(bytes(r.bytes))
                gray = px.astype(np.float64).mean(axis=2)
                ph, pw = (-h) % 8, (-w) % 8
                if ph or pw:
                    gray = np.pad(gray, ((0, ph), (0, pw)), mode="edge")
                thumb = gray.reshape(8, gray.shape[0] // 8, 8, gray.shape[1] // 8).mean(axis=(1, 3))
                rec.update(
                    fmt=fmt, w=w, h=h,
                    mean_r=float(px[:, :, 0].mean()),
                    mean_g=float(px[:, :, 1].mean()),
                    mean_b=float(px[:, :, 2].mean()),
                    brightness=float(gray.mean()),
                    thumb8=[float(x) for x in thumb.flatten()],
                )
            except (ValueError, NotImplementedError):
                pass  # corrupt/unsupported -> nulls, counted downstream
            rows.append(rec)
        yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = _images(spark, sf_dir)
    feats = imgs.mapInPandas(extract_features, FEATURES_SCHEMA)
    return (
        feats.groupBy("fmt")
        .agg(
            F.count("*").alias("n_images"),
            F.sum(F.when(F.col("brightness").isNotNull(), 1).otherwise(0)).alias("n_decoded"),
            F.min("w").alias("min_w"),
            F.max("w").alias("max_w"),
            F.min("h").alias("min_h"),
            F.max("h").alias("max_h"),
        )
        .orderBy("fmt")
    )


QUERIES = {
    "multimodal_validate": multimodal_validate,
    "multimodal_features": multimodal_features,
}

ORACLES: dict[str, str] = {}  # binary+numpy ops: rows-only driver check by design
