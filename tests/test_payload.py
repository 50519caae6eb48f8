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


# ---------------------------------------------------------------------------
# audio codec (WCSA): pure-python round-trip + invariant properties
# ---------------------------------------------------------------------------


def test_audiocodec_roundtrip_lossless():
    import numpy as np

    from web_crawler_spark.core import audiocodec

    s = audiocodec.reference_samples("aud-x", 2048)
    data = audiocodec.encode(s, 16000, "pcm")
    dec, sr, fmt = audiocodec.decode(data)
    assert sr == 16000 and fmt == "pcm"
    assert np.array_equal(dec, s)


def test_audiocodec_lossy_snr_and_corruption():
    import pytest

    from web_crawler_spark.core import audiocodec

    s = audiocodec.reference_samples("aud-y", 4000)
    data = audiocodec.encode(s, 8000, "pcm8")
    dec, sr, fmt = audiocodec.decode(data)
    assert fmt == "pcm8" and len(dec) == len(s)
    assert audiocodec.snr_db(s, dec) >= audiocodec.SNR_OK_DB
    with pytest.raises(ValueError):
        audiocodec.decode(b"corrupted!")
    with pytest.raises(ValueError):
        audiocodec.decode(data[:-3])  # truncated payload
    with pytest.raises(NotImplementedError):
        audiocodec.encode(s, 8000, "opus")  # real codecs absent in sandbox


def test_audio_features_deterministic():
    from web_crawler_spark.core import audiocodec

    r1 = audiocodec.audio_row("aud-7", seed=42)
    r2 = audiocodec.audio_row("aud-7", seed=42)
    assert r1 == r2
    dec, sr, _ = audiocodec.decode(r1["bytes"])
    f1 = audiocodec.features(dec, sr)
    f2 = audiocodec.features(dec, sr)
    assert f1 == f2
    assert f1["duration_s"] == len(dec) / sr
    assert 0 <= f1["n_clipped"] <= len(dec)
