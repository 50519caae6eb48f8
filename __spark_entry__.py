"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (one crawl scheduling round as a single
  declarative plan: anti-join seen-set -> per-host politeness window ->
  admission cap) at sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 plus the
  training-data-pipeline operators (dedup / similarity / text / multimodal)
  and the crawl engine itself.
- ``oracle_sql()``: DuckDB oracles for every entry except the iterative
  crawl engine (`crawl_bfs`, golden-tested against the pure-Python
  simulator instead). The binary-payload (multimodal) ops are oracle-paired
  too: their deterministic codecs let the expected per-payload metrics be
  precomputed driver-side and inlined as VALUES tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from web_crawler_spark import analytics  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return analytics.QUERIES["frontier_schedule"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(analytics.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(analytics.ORACLES)
