"""Scale-path utilities: bucketed shuffle-free joins, skew salting."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


def _shuffles(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan))


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path_factory):
    from tesseract_spark.sources.bucketing import write_bucketed

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    write_bucketed(li.select("l_orderkey", "l_quantity"), "b_li", ["l_orderkey"], 8)
    write_bucketed(
        orders.select("o_orderkey", "o_totalprice"), "b_orders", ["o_orderkey"], 8
    )
    a = spark.table("b_li")
    b = spark.table("b_orders")
    joined = a.join(b, a.l_orderkey == b.o_orderkey).groupBy().count()
    # disable auto-broadcast so the join strategy decision is structural
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        n = _shuffles(a.join(b, a.l_orderkey == b.o_orderkey))
        assert n == 0, f"bucketed join should be shuffle-free, saw {n} exchanges"
        assert joined.collect()[0]["count"] == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_li")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_salted_aggregate_matches_plain(spark, sf_dir):
    from tesseract_spark.operators.skew import salted_aggregate

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {
        (r.l_returnflag): (r.q, r.n)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("q"), F.count("l_quantity").alias("n"))
        .collect()
    }
    salted = {
        (r.l_returnflag): (r.q, r.n)
        for r in salted_aggregate(
            li,
            ["l_returnflag"],
            [("sum", "l_quantity", "q"), ("count", "l_quantity", "n")],
            salt_from="l_orderkey",
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark, sf_dir):
    from tesseract_spark.operators.skew import salted_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey").count()
    salted = salted_join(li, orders, "l_orderkey", salt_from="l_quantity").count()
    assert plain == salted


def test_salted_rejects_non_decomposable(spark, sf_dir):
    from tesseract_spark.operators.skew import salted_aggregate

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with pytest.raises(ValueError):
        salted_aggregate(
            li, ["l_returnflag"], [("median", "l_quantity", "m")], salt_from="l_orderkey"
        )


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """SURVEY §4 row 1 claims Catalyst DPP covers the reference's semi-join
    pushdown (primary_agg.rs:123-160) at partitioned scale — prove it: a
    year-partitioned fact store joined to a dim with a selective predicate
    must carry `dynamicpruningexpression` in the fact scan's
    PartitionFilters, i.e. fact partitions prune from the DIM FILTER at
    runtime, before any fact rows are read. (Predicate-shape gotcha, pinned
    here: a bare boolean dim column is not 'likely selective' to the
    PartitionPruning rule and silently yields NO pruning — comparisons and
    IN-lists qualify.)"""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "l_shipyear", F.year("l_shipdate")
    )
    fact_path = str(tmp_path / "fact_by_year")
    li.write.partitionBy("l_shipyear").parquet(fact_path)
    dim_path = str(tmp_path / "years_dim")
    spark.createDataFrame(
        [(y,) for y in range(1995, 2002)], "year int"
    ).write.parquet(dim_path)

    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter("year >= 1999")
    q = fact.join(dim, fact.l_shipyear == dim.year).agg(
        F.sum("l_quantity").alias("q")
    )
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruningexpression" in plan.lower(), (
        "dim-filtered star query did not plan dynamic partition pruning "
        "on the partitioned fact scan"
    )
    want = li.filter("l_shipyear >= 1999").agg(F.sum("l_quantity")).collect()[0][0]
    assert q.collect()[0]["q"] == want


def test_aqe_skew_join_splits_hot_partition(spark):
    """Planted key skew (90% of rows on one join key) under a forced
    SortMergeJoin: AQE's OptimizeSkewedJoin must split the hot partition —
    `SortMergeJoin(skew=true)` / `AQEShuffleRead ... skewed` in the FINAL
    adaptive plan — with results identical to the unskewed computation.
    This is the runtime half of the skew story (operators/skew.py's salted
    aggregate is the compile-time half)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32k",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 500_000).select(
            F.when(F.col("id") < 450_000, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            (F.col("id") * 7919 % 1000003).alias("v"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        rows = j.collect()  # materialize so the ADAPTIVE plan is final
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "hot partition was not skew-split"
        assert "skewed" in plan, "no AQEShuffleRead marked skewed"
        assert len(rows) == 500_000
        assert sum(r.w for r in rows) == 450_000 * 14 + sum(
            2 * (i % 1000) for i in range(450_000, 500_000)
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.mark.parametrize(
    "params, branches",
    [
        # 2 x 2 = 4 fan branches (the probe's shape)
        (
            {
                "cube": "lineitem_sales",
                "drilldowns": "Return Flag,Region,Nation,Year,Month",
                "measures": ["Quantity"],
                "Region": "1",
                "Nation": "5,6",
                "Year": "1995,1996",
                "Month": "3,6,9",
            },
            4,
        ),
        # 3 x 2 x 2 = 12 branches — wider fan, same one-scan contract
        (
            {
                "cube": "lineitem_sales",
                "drilldowns": "Return Flag,Region,Nation,Year",
                "measures": ["Quantity"],
                "Region": "0,1,2",
                "Nation": "5,6",
                "Year": "1995,1996",
            },
            12,
        ),
    ],
)
def test_multicut_single_plan_one_fact_scan(spark, sf_dir, params, branches):
    """Standing gate for the 100x probe's plan-shape claim (VERDICT r13
    next-round #7): the L5 single-plan multi-cut dispatch must read the
    fact table ONCE and contain NO Union at ANY fan width — the one-scan/
    one-shuffle term is exactly what separates it from the reference-
    shaped fan-out at 100 TB (measured 2.54x at 100x in SCALE.md r13;
    scripts/probe_multicut_100x.py stays the wall-clock evidence)."""
    from tesseract_spark import PlanBuilder, testdata_registry, testdata_schema
    from tesseract_spark.logic.layer import LogicLayer

    builder = PlanBuilder(spark, testdata_schema(), testdata_registry(spark, sf_dir))
    df = LogicLayer(builder).data(dict(params))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") == 1, (
        f"single-plan dispatch must scan the fact once, got "
        f"{plan.count('lineitem.parquet')} (fan {branches})"
    )
    assert "Union" not in plan, "single-plan dispatch must not union branches"
    assert "explode(array_repeat" in plan.lower() or "explode" in plan.lower(), (
        "multiplicity explode missing — fan-out fallback was dispatched"
    )
