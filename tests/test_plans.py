"""Physical-plan quality gates: the properties that make queries survive a
100× scale-up (SURVEY.md §4). These assert on the OPTIMIZED plan, not timings —
timings at toy scale don't predict cluster behavior, plan shapes do."""

from __future__ import annotations

import re

import pytest

from tesseract_spark import catalog


def _formatted_plan(df):
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _shuffle_exchanges(plan: str) -> int:
    # count real shuffles only (hash/range repartitions), not BroadcastExchange
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan))


def test_cut_pushed_to_parquet_scan(spark, sf_dir):
    df = catalog.ENTRIES["q_cut_include"].spark_fn(spark, sf_dir)
    plan = _formatted_plan(df)
    assert "EqualTo(l_returnflag,R)" in plan, "cut must reach PushedFilters"


def test_semijoin_cut_pushes_dim_filter(spark, sf_dir):
    df = catalog.ENTRIES["q_cut_semijoin"].spark_fn(spark, sf_dir)
    plan = _formatted_plan(df)
    assert re.search(r"In\(n_regionkey, \[1,2\]", plan), (
        "region cut must push into the nation dim scan"
    )


def test_small_dims_broadcast(spark, sf_dir):
    df = catalog.ENTRIES["q_agg_brand"].spark_fn(spark, sf_dir)
    plan = _formatted_plan(df)
    assert "BroadcastHashJoin" in plan, "part dim join must broadcast"
    assert "SortMergeJoin" not in plan


def test_single_shuffle_simple_agg(spark, sf_dir):
    """Degenerate-drill aggregate: exactly 1 shuffle for the groupBy plus the
    final ordering's range exchange — nothing else."""
    df = catalog.ENTRIES["q_agg_year"].spark_fn(spark, sf_dir)
    n = _shuffle_exchanges(_formatted_plan(df))
    assert n <= 2, f"expected ≤2 shuffles (agg + order), saw {n}"


def test_broadcast_join_agg_single_shuffle(spark, sf_dir):
    """Joined-dim aggregate with broadcast dims: still ≤2 shuffles."""
    df = catalog.ENTRIES["q_agg_brand"].spark_fn(spark, sf_dir)
    n = _shuffle_exchanges(_formatted_plan(df))
    assert n <= 2, f"expected ≤2 shuffles, saw {n}"


def test_column_pruning_reaches_scan(spark, sf_dir):
    """A 2-column aggregate must not read the whole lineitem schema."""
    df = catalog.ENTRIES["q_agg_year"].spark_fn(spark, sf_dir)
    plan = _formatted_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "no ReadSchema found"
    cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert set(cols) <= {"l_shipdate", "l_quantity", "l_extendedprice"}, cols


def test_fact_scaled_dim_not_forced_broadcast(builder):
    """order_geo is order-grain (scales with the fact) — the logical plan must
    not carry a broadcast hint for it; AQE decides at runtime."""
    from tesseract_spark.query.model import Query

    q = Query.from_params(
        {"drilldowns": ["Customer Geography.Geography.Region"], "measures": ["Quantity"]}
    )
    df = builder.dataframe("lineitem_sales", q)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    # the part/supplier-style hint appears as ResolvedHint/broadcast in logical
    # plans; for the order_geo join no hint may be present
    assert "UnresolvedHint" not in logical


def test_exact_scale_sums_match_plain_and_stay_double(builder):
    """exact_scale measures: decimal-exact sums fold back to double and agree
    with the plain double sums to float tolerance, in BOTH plan shapes."""
    from pyspark.sql import types as T

    from tesseract_spark.query.model import Query

    flat = builder.dataframe(
        "lineitem_sales",
        Query.from_params(
            {
                "drilldowns": ["Return Flag.Return Flag"],
                "measures": ["Extended Price", "Extended Price Exact"],
            }
        ),
    )
    assert isinstance(flat.schema["Extended Price Exact"].dataType, T.DoubleType)
    for r in flat.collect():
        assert abs(r["Extended Price"] - r["Extended Price Exact"]) < 1e-4

    # a median in the query forces the explicit two-phase plan for all measures
    two_phase = builder.dataframe(
        "lineitem_sales",
        Query.from_params(
            {
                "drilldowns": ["Return Flag.Return Flag"],
                "measures": [
                    "Median Qty By Order",
                    "Extended Price",
                    "Extended Price Exact",
                    "Weighted Price Exact",
                    "Tax MOE Exact",
                    "Custom Net Exact",
                ],
            }
        ),
    )
    for name in (
        "Extended Price Exact",
        "Weighted Price Exact",
        "Tax MOE Exact",
        "Custom Net Exact",
    ):
        assert isinstance(two_phase.schema[name].dataType, T.DoubleType), name
    for r in two_phase.collect():
        assert abs(r["Extended Price"] - r["Extended Price Exact"]) < 1e-4


def test_drillthrough_returns_the_cell_fact_rows(spark, builder, duck):
    """Drill-through must return exactly the (limited, deterministically
    ordered) fact rows behind an aggregate cell, labeled with the drill
    columns — verified against a hand-written DuckDB query AND against the
    cell's own aggregate (summing the drill-through page at full limit
    reproduces the cell value)."""
    from tesseract_spark.query.model import Query

    q = Query.from_params(
        {
            "drilldowns": ["Return Flag.Return Flag"],
            "measures": ["Extended Price"],
            "cuts": ["Return Flag.Return Flag.R"],
        }
    )
    df = builder.drillthrough("lineitem_sales", q, limit=50)
    got = [tuple(r) for r in df.collect()]
    want = [
        tuple(r)
        for r in duck.execute(
            """
            SELECT l_returnflag AS "Return Flag",
                   l_extendedprice AS "Extended Price"
            FROM lineitem WHERE l_returnflag = 'R'
            ORDER BY 1, 2 LIMIT 50
            """
        ).fetchall()
    ]
    assert got == want and len(got) == 50

    # full page sums back to the aggregate cell
    full = builder.drillthrough("lineitem_sales", q, limit=10_000_000)
    spark_sum = round(sum(r["Extended Price"] for r in full.collect()), 2)
    cell = builder.dataframe("lineitem_sales", q).collect()
    assert len(cell) == 1
    assert round(cell[0]["Extended Price"], 2) == spark_sum


def test_drillthrough_labels_joined_dimension_levels(builder, duck):
    """A snowflake drill (Region) labels each fact row through the
    customer→nation→region join path, exactly as the aggregate joins it."""
    from tesseract_spark.query.model import Query

    q = Query.from_params(
        {
            "drilldowns": ["Customer Geography.Geography.Region"],
            "measures": ["Quantity"],
            "cuts": ["Customer Geography.Geography.Region.1"],
        }
    )
    df = builder.drillthrough("lineitem_sales", q, limit=20)
    rows = df.collect()
    assert len(rows) == 20
    assert set(df.columns) == {"Region ID", "Region", "Quantity"}
    assert all(r["Region ID"] == 1 and r["Region"] == "AMERICA" for r in rows)


def test_drillthrough_pagination_is_prefix_stable(builder):
    """Deterministic paging: limit=N returns exactly the first N rows of
    limit=M (N<M) — the property a user paging through a cell relies on."""
    from tesseract_spark.query.model import Query

    q = Query.from_params(
        {
            "drilldowns": ["Return Flag.Return Flag"],
            "measures": ["Extended Price"],
            "cuts": ["Return Flag.Return Flag.A"],
        }
    )
    small = [tuple(r) for r in builder.drillthrough("lineitem_sales", q, limit=25).collect()]
    big = [tuple(r) for r in builder.drillthrough("lineitem_sales", q, limit=80).collect()]
    assert big[:25] == small and len(big) == 80


def test_binned_quantile_auto_boundaries_resolve(spark, sf_dir):
    """VERDICT r9 #5, cube tier: a BinnedQuantile measure declared with only
    n_bins (no boundaries) must (a) fail loudly if planned unresolved, and
    (b) after resolve_binned_boundaries, produce exactly the estimate the
    standalone operator gives with derive_bin_edges' boundaries."""
    import pytest as _pt

    from tesseract_spark import PlanBuilder, testdata_registry, testdata_schema
    from tesseract_spark.operators.sketch import (
        binned_quantile_rollup,
        binned_quantiles,
        derive_bin_edges,
    )
    from tesseract_spark.query.model import Query
    from tesseract_spark.schema.aggregator import BinnedQuantile
    from tesseract_spark.schema.parse import schema_from_json

    from tesseract_spark.fixtures import LINEITEM_SCHEMA_JSON
    import copy

    from pyspark.sql import functions as F

    raw = copy.deepcopy(LINEITEM_SCHEMA_JSON)
    cube0 = next(c for c in raw["cubes"] if c["name"] == "lineitem_sales")
    cube0["measures"].append(
        {
            "name": "P90 Price Auto",
            "column": "l_extendedprice",
            "aggregator": {"binned_quantile": {"p": 0.9, "n_bins": 8}},
        }
    )
    schema = schema_from_json(raw)
    b = PlanBuilder(spark, schema, testdata_registry(spark, sf_dir))
    q = Query.from_params(
        {
            "drilldowns": ["Return Flag.Return Flag"],
            "measures": ["P90 Price Auto"],
        }
    )
    with _pt.raises(ValueError, match="resolve_binned_boundaries"):
        b.dataframe("lineitem_sales", q).collect()

    b.resolve_binned_boundaries("lineitem_sales")
    agg = next(
        m.aggregator
        for m in b.schema.cube("lineitem_sales").measures
        if m.name == "P90 Price Auto"
    )
    assert isinstance(agg, BinnedQuantile) and len(agg.boundaries) == 7
    got = {
        r["Return Flag"]: r["P90 Price Auto"]
        for r in b.dataframe("lineitem_sales", q).collect()
    }

    fact = b.registry.load("lineitem_enriched").select(
        F.col("l_returnflag").alias("g"), F.col("l_extendedprice").alias("v")
    )
    edges = derive_bin_edges(fact, "v", n_bins=8)
    assert tuple(edges) == agg.boundaries
    want = {
        r["g"]: r["q"]
        for r in binned_quantiles(
            binned_quantile_rollup(fact, ["g"], "v", edges), ["g"], [0.9], ["q"]
        ).collect()
    }
    assert got == want and len(got) == 3
    # idempotent re-entry keeps the resolved boundaries
    b.resolve_binned_boundaries("lineitem_sales")
    assert (
        next(
            m.aggregator
            for m in b.schema.cube("lineitem_sales").measures
            if m.name == "P90 Price Auto"
        ).boundaries
        == agg.boundaries
    )


def test_binned_quantile_measure_two_phase_equals_single_pass(builder):
    """BinnedQuantile's array partials (two-phase path, forced by a median
    measure in the mix) must reproduce the single-pass estimate bit-exactly
    — counts add and bounds widen losslessly across the fk-grain pre-agg."""
    from tesseract_spark.query.model import Query

    q1 = Query.from_params(
        {
            "drilldowns": ["Return Flag.Return Flag"],
            "measures": ["P90 Price Binned"],
        }
    )
    single = {
        r["Return Flag"]: r["P90 Price Binned"]
        for r in builder.dataframe("lineitem_sales", q1).collect()
    }
    q2 = Query.from_params(
        {
            "drilldowns": ["Return Flag.Return Flag"],
            "measures": ["P90 Price Binned", "Median Qty By Order"],
        }
    )
    two = {
        r["Return Flag"]: r["P90 Price Binned"]
        for r in builder.dataframe("lineitem_sales", q2).collect()
    }
    assert two == single and len(single) == 3


def test_conditional_cut_null_group_keys_agree_across_strategies(spark, sf_dir):
    """Both conditional-cut strategies must share the IN-subquery's NULL
    semantics: a fact row whose GROUP key is NULL belongs to no qualifying
    group (NULL ∉ any IN set) even when the row itself matches the member
    cut. Regression: the window branch pooled all NULL keys into one
    pseudo-group and kept them whenever any NULL-key row matched, so the
    two strategies (and the oracle) disagreed on NULL-key facts."""
    from pyspark.sql import functions as F

    from tesseract_spark import PlanBuilder, Query, testdata_registry, testdata_schema

    reg = testdata_registry(spark, sf_dir)
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    b13 = [
        r.p_partkey
        for r in part.filter("p_brand = 'Brand#13'").limit(5).collect()
    ]
    base = reg.load("lineitem_enriched")
    poison = (
        base.filter(F.col("l_partkey").isin(b13))
        .limit(2)
        .withColumn("l_suppkey", F.lit(None).cast("bigint"))
    )
    spiked = base.unionByName(poison)
    reg.register("lineitem_enriched", lambda s: spiked)
    b = PlanBuilder(spark, testdata_schema(), reg)
    q = Query.from_params(
        {
            "drilldowns": ["Return Flag.Return Flag"],
            "measures": ["Quantity"],
            "conditional_cuts": [
                "Part.Part.Brand.Brand#13@Supplier.Supplier.Supplier"
            ],
        }
    )
    bounded = sorted(map(tuple, b.dataframe("lineitem_sales", q).collect()))
    # flip the group dim non-broadcastable → the window strategy fires
    reg.register(
        "supplier",
        lambda s: s.read.parquet(f"{sf_dir}/supplier.parquet"),
        broadcastable=False,
    )
    window = sorted(map(tuple, b.dataframe("lineitem_sales", q).collect()))
    assert bounded == window and len(bounded) > 0
