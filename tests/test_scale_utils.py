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
