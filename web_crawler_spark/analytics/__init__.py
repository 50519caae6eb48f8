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
for _m in _MODULES:
    for _k, _v in _m.QUERIES.items():
        assert _k not in QUERIES, f"duplicate query name {_k}"
        QUERIES[_k] = _v
    ORACLES.update(getattr(_m, "ORACLES", {}))
