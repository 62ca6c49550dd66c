#!/usr/bin/env python
"""100× probe for the embedding near-dup family (VERDICT r8 'next round' #8).

Replicates sf0.1's embeddings 100× (id-shifted copies, vectors unchanged —
every vector gains 100 exact duplicates, the worst case for near-dup pair
generation: ~9.9M intra-copy pairs + ~6.7M replicated cross pairs) and runs:

- ``cosine_near_dup_pairs`` (the r9 blocked-all-pairs + star rewrite) at the
  catalog entry's parameters — at 200k vectors each of the 16 LSH buckets
  holds ~12.5k members, just under the 16384 default cap, so this exercises
  the FULL blocked expansion at its heaviest legal size;
- the same with ``max_bucket=4096`` forcing every bucket onto the star tier
  (the degenerate-bucket path at scale);
- ``embedding_dup_clusters`` (pairs → distributed components);
- ``semantic_dedup`` in its documented 100 TB regime: K ≈ √N (=448 here vs
  the catalog entry's fixed K=8 toy) so each cluster's pair block stays
  executor-sized.

Prints one JSON line with seconds + output rows per leg. Numbers land in
SCALE.md's round-9 section.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 100


def main() -> None:
    from pyspark.sql import functions as F

    from tesseract_spark.operators import similarity
    from tesseract_spark.session import get_spark

    spark = get_spark("probe_embed_100x")
    out = tempfile.mkdtemp(prefix=f"embed_x{N}_")
    try:
        emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
        parts = [
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
            for i in range(N)
        ]
        d = parts[0]
        for p in parts[1:]:
            d = d.unionByName(p)
        d.repartition(32).write.parquet(f"{out}/embeddings.parquet")
        big = spark.read.parquet(f"{out}/embeddings.parquet")
        n_vec = big.count()
        print(f"replica ready: {n_vec} vectors", file=sys.stderr)

        results: dict[str, dict] = {}

        def leg(name: str, thunk) -> None:
            # time CONSTRUCTION + count: several operators do bounded eager
            # work while building the plan (k-means training, the cluster
            # resolver's edge-count threshold probe) — timing only count()
            # would misattribute it
            t0 = time.time()
            rows = thunk().count()
            results[name] = {"sec": round(time.time() - t0, 2), "rows": rows}
            print(f"{name:34s} {results[name]['sec']:8.2f}s rows={rows}",
                  file=sys.stderr)

        # catalog-entry parameters (threshold/planes from q_ann_near_dup)
        leg(
            "cosine_near_dup_pairs_blocked",
            lambda: similarity.cosine_near_dup_pairs(big, threshold=0.35, planes=4),
        )
        # force the degenerate tier: every bucket > max_bucket -> star
        leg(
            "cosine_near_dup_pairs_star",
            lambda: similarity.cosine_near_dup_pairs(
                big, threshold=0.35, planes=4, max_bucket=4096
            ),
        )
        from tesseract_spark.operators import dedup

        leg(
            "embed_dup_clusters",
            lambda: dedup.resolve_duplicate_clusters(
                similarity.cosine_near_dup_pairs(big, threshold=0.35, planes=4),
                corpus_ids=big.select(F.col("vec_id").alias("id")),
            ),
        )
        k = max(8, int(n_vec ** 0.5))
        leg(
            f"semantic_dedup_k{k}",
            lambda: similarity.semantic_dedup(big, threshold=0.35, n_centroids=k),
        )
        print(json.dumps({"replication": N, "n_vectors": n_vec, "legs": results}))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
