"""Measure the TEXT tier's bucketed-pair-source recall against its exact
baseline — the document sibling of pair_recall.py's embedding measurements
(BENCH.md §3b).

- dedup_minhash_lsh: candidates must share one of the 8 packed band keys;
  verification is exact Jaccard on candidates, so its pairs are a SUBSET of
  dedup_ngram_jaccard's (the exact shingle-join baseline, same JACCARD_T) —
  recall = |lsh| / |exact|, precision = 1 by construction (asserted).
  Caveat on the baseline: dedup_ngram_jaccard drops boilerplate shingles
  (df > SHINGLE_DF_CAP) before its self-join while the LSH verify does not,
  so Jaccard values can differ slightly for docs touching capped shingles;
  the comparison keys on pairs, not scores, and any pair the cap pushes
  across the threshold in either direction is reported separately instead
  of silently counted.
- dedup_incremental: flags a new-batch doc iff some band bucket pairs it
  with a corpus doc at Jaccard >= T. The exact reference set is the
  new-batch docs with >= 1 cross-batch exact pair — doc recall =
  |flagged ∩ exact-flagged| / |exact-flagged|.

The theoretical band-collision curve for s = Jaccard is
1 - (1 - s^ROWS_PER_BAND)^N_BANDS (r=2, b=8: 0.89 at s=0.5, 0.9996 at
s=0.8) — the per-similarity-band empirical recall below should track it.

Usage: python scripts/text_pair_recall.py [--sf SF_DIR]
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]

    from web_crawler_spark.analytics.dedup import (
        INCR_MOD,
        dedup_incremental,
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )
    from web_crawler_spark.session import get_spark

    spark = get_spark(app_name="text-pair-recall")

    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    # pairs the boilerplate cap moved across the threshold in one engine
    # only: exact pairs invisible to lsh for CAP reasons can't be told apart
    # from band misses, so report the lsh-only side explicitly and compute
    # recall over the exact set as-is
    cap_only_lsh = set(lsh) - set(exact)
    found = set(lsh) & set(exact)
    recall = len(found) / len(exact) if exact else 1.0

    bands: dict[str, list[int]] = {}
    for pair, j in exact.items():
        # representation-safe band edge: int(j*10) truncates 0.7*10=6.999…
        # into the band below; round to 9 places first so an exact-decimal
        # jaccard always lands on its own band boundary
        lo = min(math.floor(round(j * 10, 9)) / 10, 0.9)
        key = f"[{lo:.1f},{lo + 0.1:.1f})" if j < 1.0 else "[1.0]"
        hit, tot = bands.get(key, [0, 0])
        bands[key] = [hit + (pair in lsh), tot + 1]

    # incremental doc recall vs the exact cross-batch reference
    flagged = {r["doc_id"] for r in dedup_incremental(spark, sf_dir).collect()}
    exact_flagged = set()
    for (a, b) in exact:
        new = [d for d in (a, b) if d % INCR_MOD == INCR_MOD - 1]
        old = [d for d in (a, b) if d % INCR_MOD != INCR_MOD - 1]
        if len(new) == 1 and len(old) == 1:
            exact_flagged.add(new[0])
    inc_found = flagged & exact_flagged
    inc_recall = len(inc_found) / len(exact_flagged) if exact_flagged else 1.0
    inc_extra = flagged - exact_flagged  # cap-differences only (see caveat)

    out = {
        "sf_dir": sf_dir,
        "exact_pairs": len(exact),
        "lsh_pairs": len(lsh),
        "lsh_recall": round(recall, 4),
        "lsh_only_pairs_capdiff": sorted(cap_only_lsh),
        "recall_by_jaccard_band": {
            k: {"hit": h, "total": t, "recall": round(h / t, 4)}
            for k, (h, t) in sorted(bands.items())
        },
        "incremental_exact_flagged_docs": len(exact_flagged),
        "incremental_flagged_docs": len(flagged),
        "incremental_doc_recall": round(inc_recall, 4),
        "incremental_extra_docs_capdiff": sorted(inc_extra),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
