"""Uniform min-of-2 timing sweep of EVERY registered query at one sf dir.

One regime for the whole table (VERDICT r2 item 5): each query runs twice
back-to-back to a noop sink, the MIN is reported (spike-resistant on this
bimodal host — see bench.py's rationale), raw pairs are kept, and the
single-core canary is measured at both ends so the window's health is on
record. bench.py stays the driver-facing headline; this is the exhaustive
sweep used for BENCH.md §3 / §3a and for catching cliffs in un-benched
queries (memory rule: two latent cliffs hid in queries the headline never
timed).

Usage: python scripts/sweep_queries.py [--sf /dev/shm/wcs-sf1]
                                       [--out SWEEP_sf1.json] [--skip name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/dev/shm/wcs-sf1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip", nargs="*",
                    default=["crawl_bfs", "embed_neardup", "embed_dedup_clusters"],
                    help="queries to skip (crawl_bfs runs a full engine crawl — "
                         "its throughput is bench.py's crawl leg, not a query; "
                         "embed_neardup and the cluster verdict built on it are "
                         "the cardinality-guarded all-pairs BASELINES: measured "
                         "once at sf1 = 610 s vs 10 s for the bucketed "
                         "embed_neardup_lsh scale path, SWEEP_r3h — pass "
                         "--skip to override)")
    args = ap.parse_args()

    from canary import canary_sec

    from bench import run_query
    from web_crawler_spark.analytics import LOCAL_QUERIES, QUERIES
    from web_crawler_spark.session import get_spark

    QUERIES = {**QUERIES, **LOCAL_QUERIES}  # sweep both registry tiers

    canary_start = canary_sec()
    os.makedirs("/dev/shm/wcs-sweep", exist_ok=True)
    spark = get_spark(app_name="wcs-sweep",
                      extra_conf={"spark.local.dir": "/dev/shm/wcs-sweep"})
    QUERIES["export_stats"](spark, args.sf).collect()  # warm JVM/codegen path

    runs: dict[str, list[float]] = {}
    times: dict[str, float] = {}
    for name, fn in QUERIES.items():
        if name in args.skip:
            continue
        t0 = time.time()
        runs[name] = run_query(spark, fn, args.sf)
        times[name] = min(runs[name])
        print(f"{name}: {times[name]:.2f}s  (runs: {runs[name]})", flush=True)

    result = {
        "sf_dir": args.sf,
        "n_queries": len(times),
        "total_min_sec": round(sum(times.values()), 2),
        "queries": times,
        "query_runs": runs,
        "canary_start_sec": canary_start,
        "canary_end_sec": canary_sec(),
    }
    print(json.dumps({k: v for k, v in result.items() if k != "query_runs"}))
    if args.out:
        with open(os.path.join(REPO, args.out), "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
