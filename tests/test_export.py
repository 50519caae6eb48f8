"""Export query (SURVEY §3.3): nested doc shape + A4 statistics vs the
pure-Python oracle."""

import pytest

from web_crawler_spark import engine, export
from web_crawler_spark.config import JobConfig
from web_crawler_spark.core import oracle, webgen
from web_crawler_spark.core.robots import generate_rules, rules_by_host

CFG = webgen.t1_config()
RULES = rules_by_host(generate_rules(CFG))
JOB = JobConfig(job_id=5, start_url="http://site0.test/p/0", max_pages=25, max_depth=3, delay=0.0)


@pytest.fixture(scope="module")
def run_and_golden(spark, tmp_path_factory):
    res = oracle.simulate(JOB, CFG, RULES)
    run = engine.crawl(spark, JOB, CFG, RULES, str(tmp_path_factory.mktemp("exp") / "run"))
    return run, res


def test_export_doc_matches_oracle(spark, run_and_golden):
    run, res = run_and_golden
    doc = export.export_job_json(spark, run)

    stats = doc["job_info"]["statistics"]
    assert stats["total_pages"] == res.stats["pages_successful"]
    assert stats["total_links"] == len(res.links)
    exp_words = sum(p["content"]["word_count"] for p in res.crawl_log)
    assert stats["total_words"] == exp_words
    assert stats["avg_words_per_page"] == round(exp_words / len(res.crawl_log))

    pages = doc["crawled_data"]["pages"]
    assert [p["url"] for p in pages] == [p["url"] for p in res.crawl_log]
    # per-page links in insertion (link_idx) order with the reference's
    # text→""-coalescing, matching the oracle's per-page lists
    by_page = {}
    for l in res.links:
        by_page.setdefault(l["from_url"], []).append((l["link_idx"], l["to_url"], l["link_text"]))
    for p in pages:
        exp = [
            {"url": u, "text": t}
            for _, u, t in sorted(by_page.get(p["url"], []))
        ]
        assert p["links"] == exp


def test_preview_shape(spark, run_and_golden):
    run, res = run_and_golden
    prev = export.preview_export(spark, run)
    assert len(prev["pages_preview"]) == 3
    assert prev["n_pages"] == res.stats["pages_successful"]
    assert prev["pages_preview"][0]["url"] == res.crawl_log[0]["url"]
    assert prev["estimated_size_bytes"] > 0


def test_jsonl_export_matches_collected_doc(spark, run_and_golden, tmp_path):
    """Distributed jsonl export content == the driver-collected nested doc."""
    import glob
    import json as _json

    run, _ = run_and_golden
    out = str(tmp_path / "jsonl")
    export.export_job_jsonl(spark, run, out)
    lines = []
    for part in sorted(glob.glob(out + "/part-*")):
        with open(part) as f:
            lines.extend(_json.loads(ln) for ln in f if ln.strip())
    doc_pages = export.export_job_json(spark, run)["crawled_data"]["pages"]
    assert len(lines) == len(doc_pages)
    # part files concatenated in order give the global schedule_rank order
    assert [p["schedule_rank"] for p in lines] == sorted(p["schedule_rank"] for p in lines)
    by_rank = {p["schedule_rank"]: p for p in lines}
    for p in doc_pages:
        j = by_rank[p["schedule_rank"]]
        assert j["url"] == p["url"] and j["title"] == p["title"]
        assert j["depth"] == p["depth"] and j["status_code"] == p["status_code"]
        assert j["metadata"] == p["metadata"]
        assert j["headings"] == p["headings"]
        assert j["content"] == p["content"]
        assert j["links"] == p["links"]
