"""The crawl engine itself as a driver-checkable query entry.

`crawl_bfs` runs the full distributed frontier/scheduler loop (engine.py) on
the deterministic t1 synthetic web and returns the crawl log in reference
order. Iterative multi-round scheduling is not expressible as one SQL
statement over the input tables, but the expected result IS deterministic:
the pure-Python reference-semantics simulator (core/oracle.py — an
independent implementation of the reference's sequential loop,
crawler.py:619-645) produces the exact expected rows, which are inlined as a
DuckDB VALUES oracle (the same pattern the multimodal payload queries use).
So the driver's full rows+schema+hash gate now covers the engine too; full
multi-mode ordering equality (politeness modes, resume, kill-fuzz) remains
enforced by tests/test_engine_golden.py.
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
from .multimodal import _values

_JOB_KW = dict(
    job_id=900,
    start_url="http://site0.test/p/0",
    max_pages=30,
    max_depth=3,
    delay=0.0,
)


def crawl_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfg = webgen.t1_config()
    rules = rules_by_host(generate_rules(cfg))
    job = JobConfig(**_JOB_KW)
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


def _expected_crawl_log() -> list[tuple]:
    """Simulator-derived expected rows, same projection as crawl_bfs.

    core/oracle.simulate is a from-scratch sequential implementation of the
    reference's observable loop — an engine bug cannot leak into its own
    oracle. ~20 ms for the 30-page t1 job."""
    from ..core import oracle

    cfg = webgen.t1_config()
    rules = rules_by_host(generate_rules(cfg))
    res = oracle.simulate(JobConfig(**_JOB_KW), cfg, rules)
    return [
        (
            p["seq"], p["url"], p["depth"], p["status_code"], p["title"],
            p["content"]["word_count"], p["content"]["links_count"],
            p["image_id"],
        )
        for p in res.crawl_log
    ]


def _sql_crawl_bfs() -> str:
    return f"""
WITH expected(schedule_rank, url, depth, status_code, title,
              word_count, links_count, image_id) AS (
  VALUES {_values(_expected_crawl_log())}
)
SELECT CAST(schedule_rank AS BIGINT) AS schedule_rank,
       CAST(url AS VARCHAR) AS url,
       CAST(depth AS INT) AS depth,
       CAST(status_code AS INT) AS status_code,
       CAST(title AS VARCHAR) AS title,
       CAST(word_count AS INT) AS word_count,
       CAST(links_count AS INT) AS links_count,
       CAST(image_id AS VARCHAR) AS image_id
FROM expected ORDER BY schedule_rank
"""


QUERIES = {"crawl_bfs": crawl_bfs}


def __getattr__(name: str):
    # lazy like multimodal's oracle maps: the simulator run that derives the
    # VALUES oracle is driver-side work a fresh python worker must not pay
    if name == "ORACLES":
        return {"crawl_bfs": _sql_crawl_bfs()}
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
