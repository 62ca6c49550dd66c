#!/usr/bin/env python
"""100× probe for the persistent ANN index tiers (round 10).

Replicates sf0.1's embeddings N× (default 100 → 2M vectors, id-shifted
copies) and times, per tier, the BUILD (training + encode + partitioned
write) and the SERVE (5 external query vectors) separately — at 100 TB the
build amortizes over every query, so the serving number is the one a
latency budget cares about:

- plain IVF-PQ (``build_ivfpq_index`` / ``query_ivfpq_index``);
- residual (IVFADC) form (``residual=True``);
- filtered serve on the plain index (``allowed`` = every 3rd id — the
  predicate semi-join ahead of the ADC ranking).

The coarse quantizer uses n_centroids ≈ √N/3 (the IVF sizing the
documented 100 TB regime calls for) so probed lists stay executor-sized.
Prints one JSON line; numbers land in SCALE.md's round-10 section.
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

    from tesseract_spark.operators import ann_index
    from tesseract_spark.session import get_spark

    spark = get_spark("probe_ann_index_100x")
    out = tempfile.mkdtemp(prefix=f"annix_x{N}_")
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
        n_centroids = max(8, int((n_vec**0.5) / 3))
        print(f"replica ready: {n_vec} vectors, K={n_centroids}", file=sys.stderr)

        qvecs = [
            (int(r.vec_id), [float(x) for x in r.embedding])
            for r in emb.filter(F.col("vec_id").isin([1, 3, 5, 7, 9]))
            .select("vec_id", "embedding")
            .collect()
        ]
        results: dict[str, dict] = {}

        for tier, kw in [("ivfpq", {}), ("ivfpq_residual", {"residual": True})]:
            path = f"{out}/{tier}"
            t0 = time.time()
            ann_index.build_ivfpq_index(
                big, path, n_centroids=n_centroids, **kw
            )
            t_build = time.time() - t0
            t0 = time.time()
            rows = ann_index.query_ivfpq_index(spark, path, qvecs).count()
            t_serve = time.time() - t0
            results[tier] = {
                "build_sec": round(t_build, 2),
                "serve_sec": round(t_serve, 2),
                "rows": rows,
            }
            print(f"{tier}: build {t_build:.1f}s serve {t_serve:.2f}s", file=sys.stderr)

        allowed = big.filter(F.col("vec_id") % 3 == 0).select(
            F.col("vec_id").alias("id")
        )
        t0 = time.time()
        rows = ann_index.query_ivfpq_index(
            spark, f"{out}/ivfpq", qvecs, allowed=allowed
        ).count()
        results["ivfpq_filtered_serve"] = {
            "serve_sec": round(time.time() - t0, 2),
            "rows": rows,
        }
        print(f"filtered serve: {results['ivfpq_filtered_serve']}", file=sys.stderr)

        print(json.dumps({"n_vectors": n_vec, "n_centroids": n_centroids, "tiers": results}))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
