"""Measure ANN recall@k of the bucketed tiers against the exact baseline.

Runs the registered Spark queries (embed_cosine_topk = ground truth,
embed_lsh_ann / embed_ivf_ann = approximate tiers) at the given sf and
reports mean recall@TOP_K plus the candidate-set economics (how many
pair-dot-products each tier evaluated vs brute force).

`--clustered` instead measures on a synthesized corpus WITH genuine
near-neighbor structure (50 clusters x 10 members, intra-cluster cosine
~0.93): the driver corpus's true top-5 sims are only 0.25-0.49, which is
the adversarial regime for any bucketing scheme, so this second corpus
separates "the tiers are badly tuned" from "the corpus has no neighbors
to find". Deterministic (seeded), written to /dev/shm, same schema as
the driver's embeddings table.

Usage: python scripts/ann_recall.py [--sf SF_DIR] [--clustered]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_clustered(out_dir: str, n_clusters: int = 50, per_cluster: int = 10,
                   dim: int = 64, sigma: float = 0.05, seed: int = 7) -> str:
    """Write a clustered embeddings.parquet (vec_id, embedding, label) under
    *out_dir*; label = cluster id. Member = unit centroid + sigma*noise, so
    intra-cluster cosine ~ 1/sqrt(1 + dim*sigma^2) ~ 0.93."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_clusters, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    members = np.repeat(cents, per_cluster, axis=0)
    members = members + sigma * rng.standard_normal(members.shape)
    labels = np.repeat(np.arange(n_clusters), per_cluster)
    # shuffle so cluster members are not id-contiguous (the IVF seed cells are
    # the first 8 vec_ids; contiguity would hand them 8 pure clusters)
    perm = rng.permutation(len(members))
    members, labels = members[perm], labels[perm]

    os.makedirs(out_dir, exist_ok=True)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(members)), pa.int64()),
        "embedding": pa.array(
            [m.astype(np.float32) for m in members], pa.list_(pa.float32())
        ),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))
    return out_dir


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    if "--clustered" in sys.argv:
        sf_dir = make_clustered("/dev/shm/wcs-clustered")

    from web_crawler_spark.analytics import similarity
    from web_crawler_spark.session import get_spark

    spark = get_spark(app_name="ann-recall", master="local[8]", shuffle_partitions=8)

    def topk_sets(name: str) -> dict[int, set[int]]:
        rows = similarity.QUERIES[name](spark, sf_dir).collect()
        out: dict[int, set[int]] = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact_rows = similarity.QUERIES["embed_cosine_topk"](spark, sf_dir).collect()
    exact: dict[int, set[int]] = {}
    for r in exact_rows:
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    n_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    sims = [r["sim"] for r in exact_rows]
    report = {"sf_dir": sf_dir, "n_vectors": n_vec, "k": similarity.TOP_K,
              "n_queries": len(exact),
              "true_top5_sim_mean": round(sum(sims) / len(sims), 3),
              "true_top5_sim_min": round(min(sims), 3),
              "tiers": {}}
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
