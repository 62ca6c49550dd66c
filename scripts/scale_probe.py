#!/usr/bin/env python
"""Scale probe: replicate the sf0.1 testdata N× (default 10 → ~sf1: 6M
lineitem rows, 50k docs, 100k events) into a temp dir, run a headline-query
subset there, and print per-query seconds next to the sf0.1 numbers.

Replication semantics per table:
- lineitem: unmodified copies (facts multiply, dims stay — the realistic
  growth axis; all FK joins stay valid, aggregates scale 10x).
- documents/embeddings: id-shifted copies, text/vector unchanged — every doc
  gains 10 exact duplicates, stressing the dedup bucket paths.
- events: id-shifted copies with ts shifted by 35*i days, so per-user
  timelines (asof/range joins, sessions) grow 10x without colliding.

Usage: python scripts/scale_probe.py [N] [--keep] [--all] [query names...]

``--all`` (VERDICT r6 #7, the full-catalog scale gate): sweep EVERY catalog
entry, timing each at sf0.1 (1×) and at the N× replica in the same session,
and flag any entry whose time grows faster than data+output. Flag rule,
documented in SCALE.md: an entry is flagged when

    t_Nx > 1.2 * N * t_1x + 2.0 s

i.e. more than N× growth with 20% slack plus a 2 s fixed-overhead floor
(Spark job-launch noise dominates sub-second queries; without the floor
every 0.2 s → 2.5 s entry would false-positive). Linear-in-data operators
sit well under the line; anything super-linear (an accidental all-pairs
join, a lost pushdown) blows past it.
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
PROBE_QUERIES = [
    "q_agg_year",
    "q_cut_semijoin",
    "q_top_brands_per_region",
    "q_rca_region_flag",
    "q_median_order",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_text_analysis",
    "q_ann_lsh_topk",
    "q_asof_purchase_click",
    "q_range_join_activity",
    "q_events_window",
    "q_corpus_curation",
    "q_tfidf_topk_terms",
    "q_pack_sequences",
    "q_chunk_documents",
    "q_redact_pii",
    "q_epoch_shuffle",
    "q_fuzzy_name_match",
    "q_pagerank_dups",
    "q_source_overlap",
    "q_split_leakage",
    "q_embedding_dim_stats",
    "q_events_json_props",
    "q_quantiles_distributed",
    "q_price_quartile_counts",
    "q_multimodal_decode",
    "q_events_sessionize",
    # round-5 operators
    "q_decontaminate_bloom",
    "q_semantic_dedup",
    "q_stratified_sample",
    "q_key_skew_profile",
    "q_embed_projection",
    "q_vocab_coverage",
    "q_embed_dup_clusters",
    # round-6 operators
    "q_lm_bigram_score",
    "q_dsir_importance",
    "q_boilerplate_fraction",
    "q_token_budget_plan",
]


def build(spark, n: int, out: str) -> None:
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in ["region", "nation", "customer", "supplier", "part", "orders"]:
        os.symlink(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")

    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    lis = li
    for _ in range(n - 1):
        lis = lis.unionByName(li)
    lis.repartition(32).write.parquet(f"{out}/lineitem.parquet")

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = [docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000)) for i in range(n)]
    d = parts[0]
    for p in parts[1:]:
        d = d.unionByName(p)
    d.repartition(32).write.parquet(f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    id_col = "vec_id"
    parts = [emb.withColumn(id_col, F.col(id_col) + F.lit(i * 10_000_000)) for i in range(n)]
    e = parts[0]
    for p in parts[1:]:
        e = e.unionByName(p)
    e.repartition(32).write.parquet(f"{out}/embeddings.parquet")

    # read through the vintage-normalizing reader (current testdata stores
    # timestamp[us]/NTZ; older vintages stored INT64 nanos) — shift copies by
    # 35 days so replicas don't stack on the same timeline
    from tesseract_spark.streaming.events import read_events

    ev = read_events(spark, BASE)
    parts = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000)).withColumn(
            "ts", F.timestamp_micros(F.unix_micros(F.col("ts")) + i * 35 * 86400 * 10**6)
        )
        for i in range(n)
    ]
    v = parts[0]
    for p in parts[1:]:
        v = v.unionByName(p)
    v.repartition(8).write.parquet(f"{out}/events.parquet")


def main() -> None:
    # args: an optional leading replication factor (digits), then any number
    # of query names, flags anywhere. `scale_probe.py q_foo` (no factor)
    # must treat q_foo as a filter, not silently run the full set (ADVICE r5)
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(pos.pop(0)) if pos and pos[0].isdigit() else 10
    keep = "--keep" in sys.argv
    sweep_all = "--all" in sys.argv
    only = pos
    global PROBE_QUERIES

    from tesseract_spark import catalog
    from tesseract_spark.session import get_spark

    if sweep_all:
        PROBE_QUERIES = sorted(catalog.ENTRIES)
    if only:
        # honor the explicit list verbatim — intersecting with the default
        # PROBE_QUERIES silently dropped any requested entry not already in
        # the default set (r8: q_dedup_verified/q_ann_ivf_index skipped)
        unknown = [q for q in only if q not in catalog.ENTRIES]
        if unknown:
            raise SystemExit(f"unknown entries: {unknown}")
        PROBE_QUERIES = only

    spark = get_spark("scale_probe")
    out = tempfile.mkdtemp(prefix=f"scale_x{n}_")
    print(f"building {n}x replica of sf0.1 in {out} ...", file=sys.stderr)
    t0 = time.time()
    build(spark, n, out)
    print(f"built in {time.time() - t0:.1f}s", file=sys.stderr)

    # warm workers like bench.py
    def _warm_iter(batches):
        yield from batches

    spark.range(32).repartition(32).mapInPandas(_warm_iter, "id long").count()

    results = {}
    n_flagged = 0
    for name in PROBE_QUERIES:
        fn = catalog.ENTRIES[name].spark_fn
        rec = {}
        if sweep_all:
            # 1x baseline in the same session — the flag compares same-box,
            # same-JVM timings, not cross-round numbers
            t0 = time.time()
            rec["rows_1x"] = fn(spark, BASE).count()
            rec["sec_1x"] = round(time.time() - t0, 2)
        t0 = time.time()
        df = fn(spark, out)
        nrows = df.count()
        rec["sec"] = round(time.time() - t0, 2)
        rec["rows"] = nrows
        if sweep_all:
            # flag rule (see module docstring): > N x growth with 20% slack
            # + 2 s fixed-overhead floor
            rec["flag"] = rec["sec"] > 1.2 * n * rec["sec_1x"] + 2.0
            n_flagged += rec["flag"]
            mark = " <<< FLAG" if rec["flag"] else ""
            print(
                f"{name:32s} 1x={rec['sec_1x']:6.2f}s  {n}x={rec['sec']:7.2f}s"
                f"  ratio={rec['sec'] / max(rec['sec_1x'], 0.01):5.1f}"
                f"  rows={nrows}{mark}",
                file=sys.stderr,
            )
        else:
            print(f"{name:28s} {rec['sec']:7.2f}s  rows={nrows}", file=sys.stderr)
        results[name] = rec
    summary = {"replication": n, "queries": results}
    if sweep_all:
        summary["flagged"] = n_flagged
        print(f"flagged: {n_flagged}/{len(PROBE_QUERIES)}", file=sys.stderr)
    print(json.dumps(summary))
    if not keep:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
