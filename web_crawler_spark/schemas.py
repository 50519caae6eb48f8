"""Typed schemas for every engine table (FIXTURES.md §§1-5).

The reference keeps pages as PostgreSQL rows with two JSONB documents whose
shape is fixed by convention (``Crawler/database.py:259-266``, SURVEY.md §1.2);
here those become real StructType columns so Catalyst can prune and push down
into them — JSON only ever appears at the export edge (``to_json``).
"""

from __future__ import annotations

from pyspark.sql import types as T

N_HOST_BUCKETS = 1024  # hash-partition width for frontier/seen at scale
N_SALTS = 16  # explicit salt fan-out for skewed (hot) hosts

METADATA_STRUCT = T.StructType(
    [
        T.StructField(f, T.StringType(), False)
        for f in (
            "description",
            "keywords",
            "og_title",
            "og_description",
            "og_image",
            "og_url",
            "viewport",
            "charset",
            "author",
            "robots",
        )
    ]
)

HEADINGS_TYPE = T.MapType(T.StringType(), T.ArrayType(T.StringType()), False)

CONTENT_STRUCT = T.StructType(
    [
        T.StructField("content_text", T.StringType(), False),
        T.StructField("word_count", T.IntegerType(), False),
        T.StructField("char_count", T.IntegerType(), False),
        T.StructField("links_count", T.IntegerType(), False),
        T.StructField("images_count", T.IntegerType(), False),
        T.StructField("forms_count", T.IntegerType(), False),
        T.StructField("paragraphs_count", T.IntegerType(), False),
    ]
)

LINK_STRUCT = T.StructType(
    [
        T.StructField("to_url", T.StringType(), False),
        T.StructField("link_text", T.StringType(), True),
        T.StructField("link_idx", T.IntegerType(), False),
    ]
)

# images payload table — exact input_hint shape (BASELINE.json)
IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("sr", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
    ]
)

VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fps", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("user_agent", T.StringType(), False),
        T.StructField("rule", T.StringType(), False),
        T.StructField("path_prefix", T.StringType(), False),
        T.StructField("parse_error", T.BooleanType(), False),
    ]
)

SEEDS_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.IntegerType(), False),
        T.StructField("start_url", T.StringType(), False),
        T.StructField("max_pages", T.IntegerType(), False),
        T.StructField("max_depth", T.IntegerType(), False),
        T.StructField("delay", T.DoubleType(), False),
        T.StructField("max_retries", T.IntegerType(), False),
        T.StructField("user_agent", T.StringType(), False),
    ]
)

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),  # global FIFO admission rank
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("host_bucket", T.IntegerType(), False),
        T.StructField("salt", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("parent_seq", T.LongType(), False),
        T.StructField("link_idx", T.IntegerType(), False),
        # retries are intra-fetch (reference-faithful, crawler.py:147-190), so
        # admissions never re-enter the frontier — no attempt counter here
        T.StructField("round_added", T.IntegerType(), False),
    ]
)

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.IntegerType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("round_added", T.IntegerType(), False),
    ]
)

PAYLOAD_STRUCT = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("caption", T.StringType(), True),  # alt text of first <img>
    ]
)

CRAWL_LOG_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.IntegerType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("schedule_rank", T.LongType(), False),  # == seq
        T.StructField("url", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("status_code", T.IntegerType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("metadata", METADATA_STRUCT, False),
        T.StructField("headings", HEADINGS_TYPE, False),
        T.StructField("content", CONTENT_STRUCT, False),
        T.StructField("payload", PAYLOAD_STRUCT, False),
    ]
)

LINKS_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.IntegerType(), False),
        T.StructField("from_url", T.StringType(), False),
        T.StructField("to_url", T.StringType(), False),
        T.StructField("link_text", T.StringType(), False),  # "" when absent
        T.StructField("link_idx", T.IntegerType(), False),
        T.StructField("from_depth", T.IntegerType(), False),
    ]
)

OUTCOMES_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.IntegerType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("outcome", T.StringType(), False),  # parsed|failed|disallowed
        T.StructField("status_code", T.IntegerType(), True),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("fetch_latency_ms", T.DoubleType(), False),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.IntegerType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("host_bucket", T.IntegerType(), False),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("latency_p50_ms", T.DoubleType(), True),
        T.StructField("latency_p95_ms", T.DoubleType(), True),
        T.StructField("latency_hist", T.ArrayType(T.LongType()), True),
    ]
)
