#!/usr/bin/env python
"""Hostile degenerate-bucket probe for the blocked-pair scorer's star tier
(VERDICT r9 #7): plant a distribution where ONE LSH bucket holds ~ALL
vectors, so the hub-star expansion carries everything, and verify

- wall-time stays LINEAR in corpus size from 1× (20k) to 100× (2M) — the
  star tier scores each member against the bucket's min-id hub only, so a
  maximally-degenerate bucket must never go quadratic;
- the star tier's CONNECTIVITY CONTRACT holds at 100×: every member pairs
  with the hub, so cluster resolution over the emitted pairs must produce
  exactly ONE cluster containing the whole corpus (the property the
  clusters entry relies on when member–member pairs are capped away).

Construction: every vector is the same deterministic base direction scaled
by (1 + (i % 997)/1e4) — scaling never flips a hyperplane sign, so ALL
vectors share one bucket, and every pairwise cosine is exactly ~1.0 (all
qualify at any threshold): the absolute worst case for pair generation.

Prints one JSON line; numbers land in SCALE.md's round-10 section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [int(a) for a in sys.argv[1:]] or [20_000, 2_000_000]
DIM = 64


def main() -> None:
    from pyspark.sql import functions as F

    from tesseract_spark.operators import dedup, similarity
    from tesseract_spark.session import get_spark

    spark = get_spark("probe_star_degenerate")
    # deterministic base direction (no RNG): alternating-ish magnitudes
    base = [((i * 37 + 11) % 19) / 19.0 + 0.05 for i in range(DIM)]
    results: dict[str, dict] = {}
    for n in SIZES:
        scale = 1.0 + (F.col("vec_id") % 997).cast("double") / 1e4
        corpus = (
            spark.range(n)
            .select(F.col("id").alias("vec_id"))
            .withColumn(
                "embedding",
                F.transform(
                    F.array(*[F.lit(float(b)) for b in base]),
                    lambda x: (x * scale).cast("float"),
                ),
            )
            .repartition(32)
        )
        corpus.write.mode("overwrite").parquet(f"/tmp/star_degenerate_{n}.parquet")
        big = spark.read.parquet(f"/tmp/star_degenerate_{n}.parquet")

        t0 = time.time()
        pairs = similarity.cosine_near_dup_pairs(
            big, threshold=0.95, planes=4, log_oversize=True
        )
        n_pairs = pairs.count()
        t_pairs = round(time.time() - t0, 2)

        t0 = time.time()
        clusters = dedup.resolve_duplicate_clusters(
            similarity.cosine_near_dup_pairs(big, threshold=0.95, planes=4),
            corpus_ids=big.select(F.col("vec_id").alias("id")),
        )
        agg = clusters.groupBy("canonical_id").count().collect()
        t_clusters = round(time.time() - t0, 2)
        n_clusters = len(agg)
        max_cluster = max(r["count"] for r in agg)

        results[str(n)] = {
            "pairs_sec": t_pairs,
            "n_pairs": n_pairs,
            "clusters_sec": t_clusters,
            "n_clusters": n_clusters,
            "max_cluster": max_cluster,
        }
        print(
            f"n={n}: pairs {t_pairs}s ({n_pairs} rows, linear={n_pairs == n - 1}), "
            f"clusters {t_clusters}s ({n_clusters} clusters, largest {max_cluster})",
            file=sys.stderr,
        )
        assert n_pairs == n - 1, "star tier must emit exactly hub pairs"
        assert n_clusters == 1 and max_cluster == n, (
            "connectivity contract broken: hub star must keep the bucket "
            "one connected component"
        )
        import shutil

        shutil.rmtree(f"/tmp/star_degenerate_{n}.parquet", ignore_errors=True)
    if len(SIZES) == 2:
        a, b = (results[str(s)] for s in SIZES)
        factor = SIZES[1] / SIZES[0]
        results["linearity"] = {
            "data_factor": factor,
            "pairs_time_ratio": round(b["pairs_sec"] / max(a["pairs_sec"], 0.01), 1),
            "clusters_time_ratio": round(
                b["clusters_sec"] / max(a["clusters_sec"], 0.01), 1
            ),
        }
    print(json.dumps({"sizes": SIZES, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
