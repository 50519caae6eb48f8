"""Image+caption payload invariant (input_hint): crawl → join images table →
decode/validate. Every crawled page must pass pixels/phash/caption checks."""

from web_crawler_spark import datagen, engine
from web_crawler_spark.config import JobConfig
from web_crawler_spark.core import webgen
from web_crawler_spark.core.robots import generate_rules, rules_by_host
from web_crawler_spark.operators.payload import payload_summary, validate_payload

CFG = webgen.t1_config()


def test_payload_invariants_on_crawled_pages(spark, tmp_path):
    rules = rules_by_host(generate_rules(CFG))
    job = JobConfig(job_id=9, start_url="http://site0.test/p/0", max_pages=30, max_depth=2, delay=0.0)
    run = engine.crawl(spark, job, CFG, rules, str(tmp_path / "p"))
    images = datagen.images_df(spark, CFG, partitions=8)
    val = validate_payload(run.read(spark, "crawl_log"), images)
    s = payload_summary(val).first()
    assert s["n_rows"] > 5
    assert s["n_decode_ok"] == s["n_rows"]
    assert s["n_pixels_ok"] == s["n_rows"]
    assert s["n_phash_ok"] == s["n_rows"]
    assert s["n_caption_ok"] == s["n_rows"]
    assert s["min_psnr_db"] is None or s["min_psnr_db"] >= 40.0


def test_payload_detects_corruption(spark):
    """A corrupted byte column must fail decode_ok, not pass silently."""
    import pyspark.sql.functions as F

    images = datagen.images_df(spark, CFG, partitions=4).limit(5)
    crawled = images.select(
        F.struct(F.col("image_id"), F.col("caption")).alias("payload")
    )
    corrupted = images.withColumn("bytes", F.lit(b"corrupted!"))
    from web_crawler_spark.operators.payload import validate_payload

    val = validate_payload(crawled, corrupted)
    rows = val.collect()
    assert len(rows) == 5
    assert all(not r["decode_ok"] and not r["pixels_ok"] for r in rows)
    assert all(r["caption_ok"] for r in rows)  # captions untouched
