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
# verified by scripts/check_parity.py and pytest but kept off the driver
# registry: the driver's CORRECTNESS file is a hard 8192-byte JSON budget
# (~50 entries), so redundant twins live here (see each module's note)
LOCAL_QUERIES = {}
for _m in _MODULES:
    for _k, _v in _m.QUERIES.items():
        assert _k not in QUERIES, f"duplicate query name {_k}"
        QUERIES[_k] = _v
    LOCAL_QUERIES.update(getattr(_m, "LOCAL_QUERIES", {}))


def _oracle_maps() -> tuple[dict, dict]:
    """Aggregate per-module oracle SQL on first access (PEP 562 below).

    multimodal's oracles embed driver-side expected-metric VALUES tables
    that cost ~2 s of payload simulation — building them at import made
    every fresh python WORKER (which imports this package to unpickle any
    analytics UDF) pay that cost, and Spark's round-robin idle-worker pool
    re-pays it once per pooled worker. Oracles are driver-side only, so
    they build here, lazily, never in a worker."""
    oracles: dict = {}
    local_oracles: dict = {}
    for m in _MODULES:
        oracles.update(getattr(m, "ORACLES", {}))
        local_oracles.update(getattr(m, "LOCAL_ORACLES", {}))
    return oracles, local_oracles


def __getattr__(name: str):
    if name == "ORACLES":
        return _oracle_maps()[0]
    if name == "LOCAL_ORACLES":
        return _oracle_maps()[1]
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
