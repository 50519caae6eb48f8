"""Batch/stream parity: the streaming rollup over a static directory must
produce exactly the batch aggregation (same plan shape, readStream source)."""

import shutil

from pyspark.sql import functions as F

from web_crawler_spark.streaming import stream_rollup

SF_EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_stream_rollup_matches_batch(spark, tmp_path):
    src = tmp_path / "events_stream"
    src.mkdir()
    shutil.copy(SF_EVENTS, src / "part-0.parquet")

    q = stream_rollup.run_to_memory(
        stream_rollup.rollup_stream(spark, str(src), window="1 hour", watermark="2 hours"),
        name="rollup_t",
    )
    try:
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.table("rollup_t").collect()
        }
    finally:
        q.stop()

    batch = (
        spark.read.parquet(SF_EVENTS)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,10)")).cast("double").alias("total_value"),
        )
    )
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert got == want and len(got) > 0
