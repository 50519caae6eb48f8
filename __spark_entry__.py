"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (one crawl scheduling round as a single
  declarative plan: anti-join seen-set -> per-host politeness window ->
  admission cap) at sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 plus the
  training-data-pipeline operators (dedup / similarity / text / multimodal)
  and the crawl engine itself.
- ``oracle_sql()``: DuckDB oracles for EVERY entry. The iterative crawl
  engine (`crawl_bfs`) and the binary-payload (multimodal) ops are
  oracle-paired through deterministic VALUES tables: the pure-Python
  reference simulator (resp. the deterministic codecs) lets the expected
  rows be precomputed driver-side and inlined.
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


# The driver's CORRECTNESS file is a hard 8192-byte JSON budget (r02 held
# exactly 50 of 54 entries, cut in registry order). The registry is 48
# entries (redundant twins merged or demoted to the locally-verified
# LOCAL_QUERIES tier — see module notes), projecting to ~7.9 KB with ~300 B
# of margin (scripts/registry_budget.py) so no row can be truncated again.
# This explicit order puts the entries with the least prior driver evidence
# first: the three round-5 promotions (never driver-graded before), then
# crawl_bfs and the round-4 promotions, then the entries the r02 truncation
# bug once hid.
_FIRST = (
    "dedup_incremental",
    "span_dedup",
    "text_classify_quality",
    "crawl_bfs",
    "corpus_pipeline_full",
    "embed_semdedup",
    "doc_pack",
    "corpus_pipeline",
    "multimodal_video",
    "image_phash_neardup",
    "image_decontaminate",
    "events_profile",
    "text_quality",
    "text_fingerprint",
    "multimodal_image",
)


def _ordered(d: dict) -> dict:
    return {k: d[k] for k in _FIRST if k in d} | {
        k: v for k, v in d.items() if k not in _FIRST
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(analytics.QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(analytics.ORACLES)
