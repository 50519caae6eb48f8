"""Reference-semantics simulator — the correctness oracle (SURVEY.md §5.1).

A faithful re-implementation of the OBSERVABLE behavior of the reference's
crawl loop, which despite its async scaffolding is strictly sequential FIFO BFS
(``Crawler/crawler.py:619-645``: each task is awaited immediately after
creation). Semantics reproduced exactly:

- queue seeded with (start_url, 0); start_url added to visited as-is
  (crawler.py:611-612)
- dequeue FIFO; robots gate AFTER dequeue — disallowed URLs still consume
  seen-set slots (crawler.py:502-504)
- fetch: only status 200 yields content; 3xx/4xx/5xx → None immediately;
  429 and timeouts → None after max_retries attempts (crawler.py:156-190)
- parse per htmlparse/urlnorm (title/meta/headings/content caps, link
  canonicalization + per-page first-occurrence dedup)
- enqueue gate: depth < max_depth and len(visited) < max_pages, checked per
  link as visited grows; add-to-visited AT ENQUEUE (crawler.py:553-559) — so
  the page cap binds admission, never processing: every admitted URL is
  eventually dequeued (outer `<=` cap at crawler.py:619 can never be exceeded)
- link rows store "" for missing link text (database.py:285-287)

The engine's (round, schedule_rank) output must equal this simulator's order;
golden files per FIXTURES.md §6.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Optional

from ..config import JobConfig
from . import htmlgen, htmlparse, webgen
from .robots import RulesByHost, allowed


@dataclass
class OracleResult:
    job: JobConfig
    # admission order == dequeue order == FIFO seq; seq 0 is the seed
    admissions: list[dict] = field(default_factory=list)  # seq,url,depth,parent_seq,link_idx
    outcomes: list[dict] = field(default_factory=list)  # seq,url,depth,outcome,status,attempts
    crawl_log: list[dict] = field(default_factory=list)  # parsed pages in seq order
    links: list[dict] = field(default_factory=list)
    visited: set[str] = field(default_factory=set)
    stats: dict = field(default_factory=dict)

    def crawl_order(self) -> list[str]:
        return [a["url"] for a in self.admissions]

    def golden(self) -> dict:
        """JSON-able golden snapshot (FIXTURES.md §6)."""
        return {
            "crawl_order": self.crawl_order(),
            "seen": sorted(self.visited),
            "crawl_log_urls": [p["url"] for p in self.crawl_log],
            "links": self.links,
            "stats": self.stats,
        }


def fetch_outcome(url: str, cfg: webgen.WebConfig, max_retries: int) -> tuple[Optional[str], int, int]:
    """(html, status_code, attempts) with the reference's fetch semantics.

    In this synthetic web the 'network' is htmlgen.render_html — deterministic,
    so retries of 429/timeout always exhaust (crawler.py:160-163,172-190).
    """
    status = webgen.status_of(url, cfg)
    if status == 200:
        return htmlgen.render_html(webgen.page_spec(url, cfg)), 200, 1
    if status in (429, 0):
        return None, 0, max_retries  # give up after retries → (None, 0) crawler.py:190
    return None, status, 1  # 3xx/4xx/5xx report immediately (crawler.py:164-170)


def simulate(job: JobConfig, cfg: webgen.WebConfig, rules: RulesByHost) -> OracleResult:
    res = OracleResult(job=job)
    domain = job.domain

    queue: deque[tuple[str, int, int]] = deque()  # (url, depth, seq)
    visited: set[str] = set()

    seq = 0
    queue.append((job.start_url, 0, seq))
    visited.add(job.start_url)
    res.admissions.append(
        {"seq": 0, "url": job.start_url, "depth": 0, "parent_seq": -1, "link_idx": -1}
    )
    seq += 1

    stats = {"pages_processed": 0, "pages_successful": 0, "pages_failed": 0, "links_found": 0}

    while queue:
        url, depth, my_seq = queue.popleft()

        if not allowed(url, job.user_agent, rules):
            res.outcomes.append(
                {"seq": my_seq, "url": url, "depth": depth, "outcome": "disallowed",
                 "status": None, "attempts": 0}
            )
            continue

        html, status, attempts = fetch_outcome(url, cfg, job.max_retries)
        if html is None:
            stats["pages_failed"] += 1
            res.outcomes.append(
                {"seq": my_seq, "url": url, "depth": depth, "outcome": "failed",
                 "status": status, "attempts": attempts}
            )
            continue

        page = htmlparse.parse_page(html, url, domain)
        image_id, caption = htmlparse.parse_payload(html)
        res.crawl_log.append(
            {
                "seq": my_seq,
                "url": page.url,
                "depth": depth,
                "status_code": status,
                "title": page.title,
                "metadata": page.metadata,
                "headings": page.headings,
                "content": page.content,
                "image_id": image_id,
                "caption": caption,
            }
        )
        for link in page.links:
            res.links.append(
                {
                    "from_url": page.url,
                    "to_url": link.to_url,
                    "link_text": link.link_text or "",
                    "link_idx": link.link_idx,
                    "from_depth": depth,
                }
            )
        stats["pages_processed"] += 1
        stats["pages_successful"] += 1
        stats["links_found"] += len(page.links)
        res.outcomes.append(
            {"seq": my_seq, "url": url, "depth": depth, "outcome": "parsed",
             "status": status, "attempts": attempts}
        )

        # enqueue gate — crawler.py:553-559
        if depth < job.max_depth and len(visited) < job.max_pages:
            for link in page.links:
                if link.to_url not in visited and len(visited) < job.max_pages:
                    visited.add(link.to_url)
                    queue.append((link.to_url, depth + 1, seq))
                    res.admissions.append(
                        {"seq": seq, "url": link.to_url, "depth": depth + 1,
                         "parent_seq": my_seq, "link_idx": link.link_idx}
                    )
                    seq += 1

    res.visited = visited
    res.stats = stats
    return res
