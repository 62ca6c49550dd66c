#!/usr/bin/env python
"""100× probe for the two r11 scale debuts (VERDICT r11 'next round' #8):

1. **Bucketed fact-fact SortMergeJoin** — replicates sf0.1's lineitem and
   orders 100× (orderkey-shifted copies: ~60M lineitem rows ⋈ ~15M orders),
   writes both sides bucketed on the join key, and times the merge join +
   aggregate against the same join over NON-bucketed parquet (the shuffle
   bucketing kills). Asserts the bucketed plan has zero join-side Exchange.
   Bucket-count math for the report: buckets must be ≥ executor-core count
   to keep the whole cluster busy (each bucket pair is one task) and small
   enough that a bucket fits executor memory — at 100 TB with 1000
   executors × 4 cores, 8192 buckets ≈ 12 GB/bucket raw (≈1-2 GB columnar
   after pruning); here 64 buckets ≈ 1M lineitem rows/bucket.

2. **Global lag-N growth array carry** — the q_growth_yoy entry's
   distributed path (range partitions + within-partition lag(mea, N) +
   trailing-N array carry) over a 100×-LONGER time series: the 100 copies
   shift l_shipdate by 7 years each, giving ~8300 distinct months spanning
   700 years. The carry table is bounded by #partitions × N rows
   (32 × 12 = 384 structs here) regardless of series length — the probe
   reports the measured times for offset 1 (scalar carry), offset 12
   (array carry), and the r12 calendar-join variant on the same series.

Prints one JSON line; numbers land in SCALE.md's round-12 section.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 100


def main() -> None:
    from pyspark.sql import functions as F

    from tesseract_spark import (
        PlanBuilder,
        Query,
        testdata_registry,
        testdata_schema,
    )
    from tesseract_spark.session import get_spark
    from tesseract_spark.sources.bucketing import drop_bucketed, write_bucketed

    spark = get_spark("probe_bucketed_growth_100x")
    out = tempfile.mkdtemp(prefix=f"bg_x{N}_")
    results: dict[str, dict] = {}
    try:
        # ---------------- replica build (shared by both probes) ----------------
        li = spark.read.parquet(f"{BASE}/lineitem.parquet").select(
            "l_orderkey", "l_quantity", "l_shipdate"
        )
        orders = spark.read.parquet(f"{BASE}/orders.parquet").select(
            "o_orderkey", "o_orderpriority"
        )
        shift = 100_000_000
        li_parts = [
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * shift))
            .withColumn("l_shipdate", F.date_add("l_shipdate", i * 7 * 365))
            for i in range(N)
        ]
        ord_parts = [
            orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * shift))
            for i in range(N)
        ]
        big_li, big_ord = li_parts[0], ord_parts[0]
        for p in li_parts[1:]:
            big_li = big_li.unionByName(p)
        for p in ord_parts[1:]:
            big_ord = big_ord.unionByName(p)
        big_li.repartition(64).write.parquet(f"{out}/lineitem.parquet")
        big_ord.repartition(32).write.parquet(f"{out}/orders.parquet")
        bl = spark.read.parquet(f"{out}/lineitem.parquet")
        bo = spark.read.parquet(f"{out}/orders.parquet")
        n_li, n_ord = bl.count(), bo.count()
        print(f"replica ready: {n_li} lineitem, {n_ord} orders", file=sys.stderr)

        # ---------------- 1. bucketed SMJ vs shuffled SMJ ----------------
        def join_agg(a, b):
            j = a.join(b.hint("merge"), a["l_orderkey"] == b["o_orderkey"])
            return j.groupBy("o_orderpriority").agg(
                F.sum("l_quantity").alias("q"), F.count(F.lit(1)).alias("n")
            )

        t0 = time.perf_counter()
        shuffled = join_agg(bl.select("l_orderkey", "l_quantity"), bo)
        rows_shuf = shuffled.collect()
        t_shuf = time.perf_counter() - t0

        lt, ot = f"probe_bx{N}_li", f"probe_bx{N}_ord"
        drop_bucketed(spark, lt)
        drop_bucketed(spark, ot)
        t0 = time.perf_counter()
        write_bucketed(bl.select("l_orderkey", "l_quantity"), lt, ["l_orderkey"], 64)
        write_bucketed(bo, ot, ["o_orderkey"], 64)
        t_build = time.perf_counter() - t0
        a, b = spark.table(lt), spark.table(ot)
        bucketed = join_agg(a, b)
        t0 = time.perf_counter()
        rows_buck = bucketed.collect()
        t_serve = time.perf_counter() - t0
        assert sorted(map(tuple, rows_buck)) == sorted(map(tuple, rows_shuf))
        plan = bucketed._jdf.queryExecution().executedPlan().toString()
        # a join-side exchange would hash-partition on a JOIN key; the only
        # legal exchange in this plan is the final group-by's (on
        # o_orderpriority) — splitting the plan text at the SMJ over-counts
        # because AQE's toString repeats the initial plan
        n_join_exchange = plan.count("Exchange hashpartitioning(l_orderkey") + plan.count(
            "Exchange hashpartitioning(o_orderkey"
        )
        results["bucketed_smj"] = {
            "rows": n_li,
            "buckets": 64,
            "etl_build_sec": round(t_build, 2),
            "bucketed_join_sec": round(t_serve, 2),
            "shuffled_join_sec": round(t_shuf, 2),
            "join_side_exchanges": n_join_exchange,
            "smj": "SortMergeJoin" in plan,
        }
        assert n_join_exchange == 0, "bucketed join must have no join-side exchange"
        drop_bucketed(spark, lt)
        drop_bucketed(spark, ot)

        # ---------------- 2. growth lag-N carry over ~8300 months ----------------
        reg = testdata_registry(spark, BASE)

        def fact_100x(s):
            f = s.read.parquet(f"{out}/lineitem.parquet")
            return f.withColumns(
                {
                    "l_shipyear": F.year("l_shipdate"),
                    "l_shipmonth": F.month("l_shipdate"),
                }
            )

        reg.register("lineitem_enriched", fact_100x, broadcastable=False)
        builder = PlanBuilder(spark, testdata_schema(), reg)

        def growth_q(extra):
            params = {
                "drilldowns": ["Ship Date.Month"],
                "measures": ["Quantity"],
                "parents": "true",
                "growth": "Ship Date.Ship Date.Month,Quantity",
            }
            params.update(extra)
            return Query.from_params(params)

        for tag, extra in (
            ("offset1_scalar_carry", {"growth_offset": "1"}),
            ("offset12_array_carry", {"growth_offset": "12"}),
            ("offset12_calendar_join", {"growth_offset": "12", "growth_calendar": "true"}),
        ):
            t0 = time.perf_counter()
            n = builder.dataframe("lineitem_sales", growth_q(extra)).count()
            results[f"growth_{tag}"] = {
                "sec": round(time.perf_counter() - t0, 2),
                "periods": n,
            }
        print(json.dumps(results))
    finally:
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
