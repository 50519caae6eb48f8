"""Vectorized pandas/Arrow UDFs — the engine's only Python-side operators.

Everything the reference does per page with BeautifulSoup + urllib
(``Crawler/crawler.py:398-480``) runs here as Arrow-batched stages
(SURVEY.md §2.10): one fetch+parse ``mapInPandas`` (the synthetic network +
parser), one robots-gate pandas UDF over broadcast rules, one canonicalization
UDF, one image decode/validate ``mapInPandas``. No row-at-a-time
``F.udf`` anywhere.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import types as T

from ..config import JobConfig
from ..core import htmlgen, htmlparse, imagecodec, webgen
from ..core.robots import RulesByHost, allowed
from ..core.urlnorm import canonicalize
from ..schemas import CONTENT_STRUCT, HEADINGS_TYPE, LINK_STRUCT, METADATA_STRUCT

FETCHED_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("host_bucket", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("outcome", T.StringType(), False),
        T.StructField("status_code", T.IntegerType(), True),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("fetch_latency_ms", T.DoubleType(), False),
        T.StructField("page_url", T.StringType(), True),  # unquote(url) for parsed rows
        T.StructField("title", T.StringType(), True),
        T.StructField("metadata", METADATA_STRUCT, True),
        T.StructField("headings", HEADINGS_TYPE, True),
        T.StructField("content", CONTENT_STRUCT, True),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("links", T.ArrayType(LINK_STRUCT), True),
        T.StructField("partition_id", T.IntegerType(), False),  # write-time lineage
    ]
)


def fetch_latency_ms(url: str, attempts: int, seed: int) -> float:
    """Deterministic synthetic fetch latency (metrics/lineage only)."""
    from ..core.hashing import stable_hash64

    base = 20.0 + (stable_hash64(seed, "lat", url) % 150)
    return base * attempts


def make_fetch_parse(cfg: webgen.WebConfig, job: JobConfig, rules: RulesByHost | None = None):
    """mapInPandas stage: frontier batch → gated/fetched/parsed rows
    (FETCHED_SCHEMA).

    The 'network' is the deterministic synthetic web; in a real deployment this
    function body is the aiohttp fetch + HTML5 parse, same batch shape. Fetch
    semantics mirror the reference exactly (crawler.py:156-190): only 200
    yields content; 429/timeouts exhaust max_retries then fail with status 0.

    The robots gate runs here too, BEFORE the fetch (crawler.py:502-504,
    fail-open) — fusing it into this stage keeps each scheduling round at one
    Python stage instead of two. ``rules`` should arrive via ``sc.broadcast``
    at scale; a closure is fine for small rule sets.
    """
    domain = job.domain
    max_retries = job.max_retries
    user_agent = job.user_agent
    seed = cfg.seed

    def fetch_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        for pdf in batches:
            rows = []
            for url, seq, depth, host, host_bucket in zip(
                pdf["url"], pdf["seq"], pdf["depth"], pdf["host"], pdf["host_bucket"]
            ):
                if rules is not None and not allowed(url, user_agent, rules):
                    rows.append({
                        "seq": seq, "url": url, "host": host, "host_bucket": host_bucket,
                        "depth": depth, "outcome": "disallowed", "status_code": None,
                        "attempts": 0, "fetch_latency_ms": 0.0, "page_url": None,
                        "title": None, "metadata": None, "headings": None,
                        "content": None, "image_id": None, "caption": None,
                        "links": None, "partition_id": pid,
                    })
                    continue
                status = webgen.status_of(url, cfg)
                if status == 200:
                    html = htmlgen.render_html(webgen.page_spec(url, cfg))
                    attempts = 1
                elif status in (429, 0):
                    html, status, attempts = None, 0, max_retries
                else:
                    html, attempts = None, 1
                lat = fetch_latency_ms(url, attempts, seed)
                base = {
                    "seq": seq, "url": url, "host": host, "host_bucket": host_bucket,
                    "depth": depth, "status_code": status, "attempts": attempts,
                    "fetch_latency_ms": lat, "page_url": None, "title": None,
                    "metadata": None, "headings": None, "content": None,
                    "image_id": None, "caption": None, "links": None,
                    "partition_id": pid,
                }
                if html is None:
                    base["outcome"] = "failed"
                    rows.append(base)
                    continue
                page = htmlparse.parse_page(html, url, domain)
                image_id, caption = htmlparse.parse_payload(html)
                base.update(
                    outcome="parsed",
                    page_url=page.url,
                    title=page.title,
                    metadata=page.metadata,
                    headings=page.headings,
                    content=page.content,
                    image_id=image_id,
                    caption=caption,
                    links=[
                        {"to_url": l.to_url, "link_text": l.link_text, "link_idx": l.link_idx}
                        for l in page.links
                    ],
                )
                rows.append(base)
            yield pd.DataFrame(rows, columns=[f.name for f in FETCHED_SCHEMA])

    return fetch_parse


def make_robots_gate(rules: RulesByHost, user_agent: str):
    """pandas UDF body: Series[url] → Series[bool] via broadcast robots rules.

    Fail-open semantics per the reference (crawler.py:134-140). ``rules`` should
    arrive via ``sc.broadcast`` at scale; a closure is fine for small rule sets.
    """

    def gate(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: allowed(u, user_agent, rules))

    return gate


def make_canonicalize(domain: str):
    """pandas UDF body: (href, base_url) → clean in-domain URL or None.

    The standalone form of the parse stage's link canonicalization (F5,
    crawler.py:407-427) for use over raw link tables.
    """

    def canon(hrefs: pd.Series, bases: pd.Series) -> pd.Series:
        return pd.Series(
            [canonicalize(h, b, domain) for h, b in zip(hrefs, bases)], dtype=object
        )

    return canon


VALIDATION_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("psnr_db", T.DoubleType(), True),  # vs reference pixels; None = lossless exact
        T.StructField("pixels_ok", T.BooleanType(), False),  # allclose / PSNR>=40 per input_hint
        T.StructField("phash_computed", T.LongType(), True),
        T.StructField("phash_ok", T.BooleanType(), False),
        T.StructField("caption_ok", T.BooleanType(), False),
        # decoded-feature projection, same decode pass (never decode twice:
        # at corpus scale the decode stage dominates, so validation and
        # feature extraction share one pixel buffer)
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("brightness", T.DoubleType(), True),
        T.StructField("thumb_var", T.DoubleType(), True),  # 8×8 block-mean resize variance
    ]
)


def decode_validate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas over images-table rows joined with crawled captions:
    decode bytes ONCE, check the input_hint per-row invariant (pixel
    allclose / PSNR ≥ 40 dB for lossy, phash match, caption equality) and
    project the decoded features (channel means, brightness, 8×8 resize
    variance) from the same pixel buffer.

    Expects columns: image_id, bytes, w, h, fmt, caption, phash, crawled_caption.
    """
    for pdf in batches:
        out = []
        for r in pdf.itertuples(index=False):
            rec = {
                "image_id": r.image_id, "fmt": None, "w": None, "h": None,
                "decode_ok": False, "psnr_db": None, "pixels_ok": False,
                "phash_computed": None, "phash_ok": False,
                "caption_ok": bool(r.crawled_caption == r.caption),
                "mean_r": None, "mean_g": None, "mean_b": None,
                "brightness": None, "thumb_var": None,
            }
            try:
                px, w, h, fmt = imagecodec.decode(bytes(r.bytes))
                rec.update(fmt=fmt, w=w, h=h, decode_ok=(w == r.w and h == r.h and fmt == r.fmt))
                ref = imagecodec.reference_pixels(r.image_id, w, h)
                if fmt in imagecodec.LOSSY_FMTS:
                    p = imagecodec.psnr(px, ref)
                    rec.update(psnr_db=None if np.isinf(p) else p, pixels_ok=bool(p >= 40.0))
                else:
                    rec.update(pixels_ok=bool(np.array_equal(px, ref)))
                ph = imagecodec.phash64(px)
                rec.update(phash_computed=ph, phash_ok=bool(ph == r.phash))
                rec.update(imagecodec.features(px))
            except (ValueError, NotImplementedError):
                pass
            out.append(rec)
        yield pd.DataFrame(out, columns=[f.name for f in VALIDATION_SCHEMA])
