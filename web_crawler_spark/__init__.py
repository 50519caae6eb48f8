"""web_crawler_spark — a PySpark-native distributed URL-frontier / crawl-scheduler engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference crawler (``Pavel-Skibin/web-crawler``, surveyed in SURVEY.md): the
strictly-sequential FIFO-BFS crawl loop (reference ``Crawler/crawler.py:619-645``)
re-expressed as batch DataFrame scheduling rounds — frontier anti-join seen-set,
window-ranked admission with page cap and politeness budget, vectorized pandas
UDFs for URL canonicalization / HTML parse / image decode — over snapshot tables
(Iceberg-shaped commits; parquet-backed in this sandbox).

Nothing is ported from the reference's code; its observable semantics are
reproduced exactly (golden-tested against a pure-Python simulator in
``core/oracle.py``).
"""

__version__ = "0.1.0"
