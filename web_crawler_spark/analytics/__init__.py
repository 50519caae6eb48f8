"""Analytics layer: every SURVEY.md §2 operator re-expressed as a
(PySpark DataFrame query, ANSI-SQL oracle) pair over the driver's test
tables, plus the training-data-pipeline operators (dedup, similarity,
text analysis, multimodal) the 100 TB deployment needs.

Each submodule exports ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, sql]``; names without an oracle get the driver's
weaker rows-only check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from . import crawlq, dedup, graph, multimodal, relational, similarity, text

_MODULES = (relational, dedup, text, graph, similarity, multimodal, crawlq)

QUERIES = {}
ORACLES = {}
# verified by scripts/check_parity.py and pytest but kept off the driver
# registry: the driver's CORRECTNESS file is a hard 8192-byte JSON budget
# (~50 entries), so redundant twins live here (see each module's note)
LOCAL_QUERIES = {}
LOCAL_ORACLES = {}
for _m in _MODULES:
    for _k, _v in _m.QUERIES.items():
        assert _k not in QUERIES, f"duplicate query name {_k}"
        QUERIES[_k] = _v
    ORACLES.update(getattr(_m, "ORACLES", {}))
    LOCAL_QUERIES.update(getattr(_m, "LOCAL_QUERIES", {}))
    LOCAL_ORACLES.update(getattr(_m, "LOCAL_ORACLES", {}))
