#!/usr/bin/env python
"""100× probe for the L5 single-plan multi-cut (VERDICT r12 'missing' #4).

At sf0.1 the single plan measured at PARITY with the reference-shaped
fan-out because AQE exchange reuse dedupes the fan's subtrees at that
size; its claimed win — ONE fact scan + ONE shuffle instead of N — is
exactly the term that dominates at 100 TB but had no measured probe.

This probe replicates sf0.1's lineitem+orders 100× (orderkey-shifted, so
the FK join stays valid — same replica recipe as the bucketed-SMJ probe),
points the real PlanBuilder/LogicLayer at the replica, and runs one
4-branch multi-cut (2 geo cut levels × 2 ship-date cut levels, all
drilled) through BOTH paths:

- single plan (default dispatch): OR-of-cuts pre-filter + post-agg
  multiplicity explode;
- reference fan-out (dispatch forced to the pinned fallback): 4
  aggregations unioned by position.

It asserts the two produce the same row multiset, then reports wall
times and the plan-shape counts that tell the 100 TB story: fact scans,
exchanges, reused exchanges. Prints one JSON line; numbers land in
SCALE.md's round-13 section.
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

PARAMS = {
    "cube": "lineitem_sales",
    "drilldowns": "Return Flag,Region,Nation,Year,Month",
    "measures": ["Quantity"],
    # two multi-cut dimensions -> 2 x 2 = 4 fan branches
    "Region": "1",
    "Nation": "5,6",
    "Year": "1995,1996",
    "Month": "3,6,9",
}


def main() -> None:
    from pyspark.sql import functions as F

    from tesseract_spark import PlanBuilder, testdata_registry, testdata_schema
    from tesseract_spark.logic.layer import LogicLayer
    from tesseract_spark.session import get_spark

    spark = get_spark("probe_multicut_100x")
    out = tempfile.mkdtemp(prefix=f"mc_x{N}_")
    try:
        # ---------------- replica build ----------------
        li = spark.read.parquet(f"{BASE}/lineitem.parquet")
        orders = spark.read.parquet(f"{BASE}/orders.parquet")
        shift = 100_000_000
        li_parts = [
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * shift))
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
        for name in (
            "region nation customer supplier part events documents embeddings"
        ).split():
            os.symlink(f"{BASE}/{name}.parquet", f"{out}/{name}.parquet")
        n_li = spark.read.parquet(f"{out}/lineitem.parquet").count()
        print(f"replica ready: {n_li} lineitem rows", file=sys.stderr)

        builder = PlanBuilder(
            spark, testdata_schema(), testdata_registry(spark, out)
        )

        def plan_counts(df) -> dict:
            plan = df._jdf.queryExecution().executedPlan().toString()
            return {
                "fact_scans": plan.count("lineitem.parquet"),
                "exchanges": plan.count("Exchange "),
                "reused_exchanges": plan.count("ReusedExchange"),
                "unions": plan.count("Union"),
            }

        def run(label: str, force_fanout: bool) -> tuple[list, dict]:
            layer = LogicLayer(builder)
            if force_fanout:
                # the pinned fallback: dispatch as if a branch were not
                # single-plan eligible (same switch the parity test uses)
                orig = LogicLayer._try_single_plan
                LogicLayer._try_single_plan = lambda *a, **k: None
            try:
                t0 = time.perf_counter()
                df = layer.data(dict(PARAMS))
                rows = df.collect()
                wall = time.perf_counter() - t0
            finally:
                if force_fanout:
                    LogicLayer._try_single_plan = orig
            info = plan_counts(df)
            info["wall_sec"] = round(wall, 2)
            info["rows"] = len(rows)
            return rows, info

        rows_fan, fan = run("fanout", force_fanout=True)
        rows_sp, sp = run("single_plan", force_fanout=False)
        assert sorted(map(tuple, rows_sp)) == sorted(map(tuple, rows_fan)), (
            "single plan and fan-out disagree at 100x"
        )
        print(
            json.dumps(
                {
                    "probe": "multicut_single_plan_100x",
                    "replication": N,
                    "lineitem_rows": n_li,
                    "fan_branches": 4,
                    "fanout_union": fan,
                    "single_plan": sp,
                    "speedup": round(fan["wall_sec"] / max(sp["wall_sec"], 1e-9), 2),
                }
            )
        )
    finally:
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
