"""Measure PAIR recall of the bucketed near-dup pair sources against the
exact O(n²) baseline, at guard scale (<= 1e5 vectors, where embed_neardup
runs).

Two bucketed sources bound their work and can therefore miss pairs:

- embed_neardup_lsh: candidate pairs must share a sign-LSH bucket in some
  table. Verification is exact on candidates, so its output is a SUBSET of
  embed_neardup's — recall = |lsh pairs| / |exact pairs|, precision = 1 by
  construction (asserted).
- embed_semdedup: drops a vector only when a LOWER-id duplicate shares its
  quantizer CELL. The exact drop set is derivable from embed_neardup
  directly: a vector is exact-dropped iff it appears as vec_b of any pair
  (pairs are emitted with vec_a < vec_b). SemDeDup's drops are a SUBSET of
  the exact drops (a cell mate with sim >= T is an exact pair), so
  drop recall = |sem drops| / |exact drops|, precision = 1 (asserted).

Like ann_recall.py, runs on the driver corpus (adversarial: true sims barely
over the 0.35 threshold, near-orthogonal — the worst case for any bucketing
scheme) AND on the clustered corpus with genuine near-dup structure
(--clustered; intra-cluster cosine ~0.93 — the regime these operators are
built for). Recorded in BENCH.md §3b.

Usage: python scripts/pair_recall.py [--sf SF_DIR] [--clustered]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ann_recall import make_clustered  # noqa: E402


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    if "--clustered" in sys.argv:
        sf_dir = make_clustered("/dev/shm/wcs-clustered")

    from web_crawler_spark.analytics import similarity as S
    from web_crawler_spark.session import get_spark

    spark = get_spark(app_name="pair-recall", master="local[8]", shuffle_partitions=8)

    exact_sim = {
        (r["vec_a"], r["vec_b"]): r["sim"]
        for r in S.embed_neardup(spark, sf_dir).collect()
    }
    exact_pairs = set(exact_sim)
    lsh_pairs = {
        (r["vec_a"], r["vec_b"])
        for r in S.embed_neardup_lsh(spark, sf_dir).collect()
    }
    assert lsh_pairs <= exact_pairs, "LSH emitted a pair the exact baseline lacks"

    # sign-LSH collision probability rises with cosine, so recall is a
    # function of pair similarity — report it per band. The contract claim
    # ("genuine near-dups collide") lives in the high band.
    def band_recall(lo: float, hi: float):
        in_band = {p for p, s in exact_sim.items() if lo <= s < hi}
        if not in_band:
            return None
        return {"exact": len(in_band),
                "recall": round(len(lsh_pairs & in_band) / len(in_band), 4)}

    exact_drops = {b for _, b in exact_pairs}
    sem_drops = {
        r["vec_id"]
        for r in S.QUERIES["embed_semdedup"](spark, sf_dir).collect()
        if not r["keep"]
    }
    assert sem_drops <= exact_drops, "SemDeDup dropped a vector with no exact dup"

    n_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    report = {
        "sf_dir": sf_dir,
        "n_vectors": n_vec,
        "threshold": S.NEARDUP_T,
        "exact_pairs": len(exact_pairs),
        "embed_neardup_lsh": {
            "pairs": len(lsh_pairs),
            "pair_recall": round(len(lsh_pairs) / len(exact_pairs), 4)
            if exact_pairs else None,
            "precision": 1.0,  # asserted subset
            "recall_by_sim": {
                "0.35-0.60": band_recall(0.35, 0.60),
                "0.60-0.80": band_recall(0.60, 0.80),
                "0.80-1.00": band_recall(0.80, 1.01),
            },
        },
        "embed_semdedup": {
            "exact_drops": len(exact_drops),
            "drops": len(sem_drops),
            "drop_recall": round(len(sem_drops) / len(exact_drops), 4)
            if exact_drops else None,
            "precision": 1.0,  # asserted subset
        },
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
