"""Deterministic sf1-equivalent testdata (10x sf0.1) for the big-regime bench.

/root/testdata is read-only and tops out at sf0.1, where ~0.3-0.5 s of fixed
per-job overhead dominates several headline queries. This script synthesises
an sf1-equivalent directory from sf0.1 alone (no external data, per the build
brief): each table is replicated 10x with per-replica key offsets so every
foreign-key relationship still joins, and the text/vector payloads are
perturbed per replica so the dedup / ANN workloads scale like 10 independent
shards of sf0.1 rather than acquiring an artificial 10-way duplicate of every
document.

 - keys: replica r adds r*1e6 (dimension keys) / r*1e7 (order keys) — far
   above the sf0.1 key ranges, so replicas never collide.
 - region/nation: copied as-is (shared dimensions, like TPC-H's fixed dims).
 - documents.text: replica r>0 applies a per-replica bijective letter
   substitution (rotation of a common-letter alphabet). Length, token count
   and intra-replica duplicate structure are preserved exactly; cross-replica
   shingle overlap collapses to ~0, so minhash/simhash candidate volume
   scales linearly in replicas (as it would on real sf1), not quadratically.
 - embeddings.embedding: replica r>0 gets a deterministic per-replica,
   per-component scaling (1 + r*(i%5-2)/200) — replicas land in distinct
   directions, so ANN bucket occupancy grows like a larger corpus instead of
   10 coincident copies.

Output: --out (default /dev/shm/wcs-sf1). Run bench.py against it with
SPARK_GRAFT_SF_DIR=/dev/shm/wcs-sf1 (bench.py parses sf=1.0 from the name...
it splits on 'sf', so the default dir name yields sf=1.0).

Usage: python scripts/make_sf1.py [--out /dev/shm/wcs-sf1] [--replicas 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"

# per-replica bijective substitution alphabet (common English letters, so
# nearly every shingle contains one and cross-replica Jaccard collapses)
ALPHA = "etaoinshrd"

KEY_OFFSETS = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
    "events": {"event_id": 10_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}


def replicate(spark, table: str, replicas: int, out_dir: str) -> int:
    src = spark.read.parquet(f"{SRC}/{table}.parquet")
    if table in ("region", "nation"):
        src.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
        return src.count()

    reps = spark.range(replicas).select(F.col("id").cast("int").alias("_r"))
    df = src.crossJoin(F.broadcast(reps))
    for col, off in KEY_OFFSETS.get(table, {}).items():
        typ = dict(df.dtypes)[col]
        df = df.withColumn(col, (F.col(col) + F.col("_r").cast("long") * off).cast(typ))

    if table == "documents":
        # rotation r of ALPHA as the substitution image; r=0 is the identity.
        # translate() needs static alphabets, so branch per replica.
        cases = F.col("text")
        for r in range(replicas - 1, 0, -1):
            rot = ALPHA[r % len(ALPHA):] + ALPHA[: r % len(ALPHA)]
            cases = F.when(
                F.col("_r") == r, F.translate(F.col("text"), ALPHA, rot)
            ).otherwise(cases)
        df = df.withColumn("text", cases)
    elif table == "embeddings":
        # additive deterministic noise comparable to the component magnitudes
        # (~0.15), so replica directions are effectively independent — a mild
        # multiplicative scale would leave all 10 replicas ~0.999-cosine
        # coincident and the ANN corpus would behave like sf0.1 with 10-way
        # duplicated points, not a 10x corpus. r=0 stays the identity.
        # Interpreted HOF is fine for a one-time 20k-row generation step.
        rd = F.col("_r").cast("double")
        amp = F.when(F.col("_r") == 0, F.lit(0.0)).otherwise(F.lit(0.15))
        # phase keyed on (vec_id, replica): distinct quasi-random noise per
        # source vector, else every replica would collapse toward one shared
        # offset direction
        phase = F.col("vec_id").cast("double") * F.lit(0.6180339887) + rd * F.lit(7919.0)
        df = df.withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, i: (
                    x.cast("double")
                    + amp * F.sin((i.cast("double") + F.lit(1.0)) * phase)
                ).cast("float"),
            ),
        )

    df = df.drop("_r")
    # realistic multi-file layout: the replicated tables otherwise inherit
    # sf0.1's single-file layout through the broadcast crossJoin and every
    # downstream scan gets 1-3 tasks (a real sf1 export has many files /
    # row groups, which is what gives the scan its parallelism)
    df = df.repartition(32, *[F.col(c) for c in [df.columns[0]]])
    df.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
    return df.count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/dev/shm/wcs-sf1")
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()

    from web_crawler_spark.session import get_spark

    spark = get_spark(app_name="make-sf1")
    os.makedirs(args.out, exist_ok=True)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        n = replicate(spark, t, args.replicas, args.out)
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
