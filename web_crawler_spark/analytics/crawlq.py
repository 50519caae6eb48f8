"""The crawl engine itself as a driver-checkable query entry.

`crawl_bfs` runs the full distributed frontier/scheduler loop (engine.py) on
the deterministic t1 synthetic web and returns the crawl log in reference
order. Iterative multi-round scheduling is not expressible as one SQL
statement, so there is no DuckDB oracle (rows-only driver check); exact
reference-ordering equality is enforced by tests/test_engine_golden.py
against the pure-Python reference-semantics simulator instead.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import engine
from ..config import JobConfig
from ..core import webgen
from ..core.robots import generate_rules, rules_by_host


def crawl_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfg = webgen.t1_config()
    rules = rules_by_host(generate_rules(cfg))
    job = JobConfig(
        job_id=900,
        start_url="http://site0.test/p/0",
        max_pages=30,
        max_depth=3,
        delay=0.0,
    )
    storage = tempfile.mkdtemp(prefix="wcs_crawlq_", dir=os.environ.get("TMPDIR", "/tmp"))
    try:
        run = engine.crawl(spark, job, cfg, rules, storage)
        log = run.read(spark, "crawl_log")
        out = log.select(
            "schedule_rank",
            "url",
            "depth",
            "status_code",
            "title",
            F.col("content.word_count").alias("word_count"),
            F.col("content.links_count").alias("links_count"),
            F.col("payload.image_id").alias("image_id"),
        ).orderBy("schedule_rank")
        # the returned plan must not read the deleted run directory: pin the
        # (30-row) result in memory before cleaning up the crawl storage
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(storage, ignore_errors=True)


QUERIES = {"crawl_bfs": crawl_bfs}
ORACLES: dict[str, str] = {}
