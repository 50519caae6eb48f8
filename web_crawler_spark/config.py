"""Job configuration — mirrors the reference's crawl-job parameters.

Reference: ``WebCrawler.__init__`` (``Crawler/crawler.py:44-98``) and the web-form
bounds (``Crawler/app.py:201-216``: http(s) URL, 1 ≤ max_pages ≤ 1000,
1 ≤ max_depth ≤ 10, 0 ≤ delay ≤ 10). The reference randomizes its User-Agent per
request (``crawler.py:126``) — a nondeterminism source we pin to a constant.
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import urlparse


@dataclass(frozen=True)
class JobConfig:
    job_id: int
    start_url: str
    max_pages: int = 100
    max_depth: int = 3
    delay: float = 1.0
    max_retries: int = 3
    user_agent: str = "MyCrawler/1.0"  # reference default, crawler.py:53

    @property
    def domain(self) -> str:
        """Crawl domain = netloc of the start URL (crawler.py:80)."""
        return urlparse(self.start_url).netloc

    def validate(self) -> None:
        """Reference web-form bounds (Crawler/app.py:201-216)."""
        if not self.start_url.startswith(("http://", "https://")):
            raise ValueError("start_url must be http(s)")
        if not 1 <= self.max_pages <= 1_000_000_000_000:
            # reference caps at 1000 for its UI; the engine itself has no such limit
            raise ValueError("max_pages out of range")
        if not 1 <= self.max_depth <= 100:
            raise ValueError("max_depth out of range")
        if not 0 <= self.delay <= 10:
            raise ValueError("delay out of range")
