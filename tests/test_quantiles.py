"""Distributed exact quantiles: equivalence to Spark's builtin percentile
(bit-for-bit, including ties / frac==0 exact-rank hits / singleton groups) and
the scale contract (no ObjectHashAggregate buffering whole groups)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tesseract_spark.operators.quantiles import exact_quantiles

PROBS = [0.1, 0.25, 0.5, 0.75, 0.9]


def _reference(spark_df, probs):
    return spark_df.groupBy("g").agg(
        *[
            F.expr(f"percentile(v, {p})").alias(f"q_{p}")
            for p in probs
        ]
    )


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("small_threshold", [0, 2_000_000])
def test_matches_builtin_percentile(spark, seed, small_threshold):
    # small_threshold=0 forces the bucketed de-skew path; the default takes
    # the direct per-group window — both must be bit-equal to the builtin
    rng = random.Random(seed)
    rows = []
    # mixed group sizes incl. 1-row group; duplicated values to force ties
    for g, size in [("a", 1), ("b", 2), ("c", 7), ("d", 40), ("e", 101)]:
        pool = [round(rng.uniform(0, 1000), 2) for _ in range(max(2, size // 2))]
        rows += [(g, rng.choice(pool)) for _ in range(size)]
    df = spark.createDataFrame(rows, "g string, v double")

    got = {
        r["g"]: r.asDict()
        for r in exact_quantiles(
            df, ["g"], "v", PROBS, small_threshold=small_threshold
        ).collect()
    }
    want = {r["g"]: r.asDict() for r in _reference(df, PROBS).collect()}
    assert got.keys() == want.keys()
    for g in want:
        for p in PROBS:
            assert got[g][f"q_{p}"] == want[g][f"q_{p}"], (g, p)


def test_exact_rank_hits(spark):
    # n = 5, p = 0.25 -> h = 1.0 exactly: result must be the rank-1 value
    df = spark.createDataFrame(
        [("g", float(v)) for v in [10, 20, 30, 40, 50]], "g string, v double"
    )
    out = exact_quantiles(df, ["g"], "v", [0.0, 0.25, 1.0]).collect()[0]
    assert out["q_0.0"] == 10.0
    assert out["q_0.25"] == 20.0
    assert out["q_1.0"] == 50.0


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("g", 1.0), ("g", None), ("g", 3.0)], "g string, v double"
    )
    out = exact_quantiles(df, ["g"], "v", [0.5]).collect()[0]
    assert out["q_0.5"] == 2.0


def test_scale_safe_plan(spark, sf_dir):
    """Two scale contracts:

    1. no unbounded aggregation buffer: the only ObjectHashAggregate allowed
       is the approx_percentile boundary sketch (fixed-size GK state per
       group); the builtin exact ``percentile``'s whole-group value buffer
       must not appear;
    2. no single-task-per-group sort: the data-sized rank window must
       partition on (group, bucket), not group alone (VERDICT r4 #3 — with
       3 groups, a group-partitioned window sorts a third of the corpus in
       one task).
    """
    import re

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plan = (
        exact_quantiles(
            li,
            ["l_returnflag"],
            "l_extendedprice",
            [0.25, 0.5],
            small_threshold=0,  # force the large-scale (bucketed) path
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "ObjectHashAggregate" in line:
            assert "approx_percentile" in line, f"value-buffering agg: {line}"
    # the window ranking __v (the data-sized one) must include __b in its
    # partition spec; the only group-only window is over the tiny carry table
    data_windows = [
        ln for ln in plan.splitlines() if "windowspecdefinition" in ln and "__v" in ln and "__hi_b" in ln
    ]
    assert data_windows, "rank window missing from plan"
    for ln in data_windows:
        assert re.search(r"windowspecdefinition\([^)]*__b", ln), (
            f"rank window not bucket-partitioned: {ln.strip()[:200]}"
        )


def test_adaptive_small_path_plan(spark, sf_dir):
    """Below the distinct-count threshold the bucket/carry machinery must be
    absent: no ``__b`` bucket column, no broadcast carry join — just the
    direct per-group sort window over the checkpointed distinct table
    (VERDICT r5 #2: the machinery cost 1.7× at small scale)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = exact_quantiles(
        li, ["l_returnflag"], "l_extendedprice", [0.25, 0.5]
    )  # default threshold; test SFs are far below it
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__b#" not in plan and "__before" not in plan, (
        "bucket/carry machinery present on the small-input path"
    )
    assert "BroadcastHashJoin" not in plan, (
        "small path should have zero joins"
    )
    # and it still produces the exact result
    got = {r["Return Flag"] if "Return Flag" in r else r["l_returnflag"]: r for r in df.collect()}
    from pyspark.sql import functions as F

    want = {
        r["l_returnflag"]: r
        for r in li.where(F.col("l_extendedprice").isNotNull())
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.25)").alias("q_0.25"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("q_0.5"),
        )
        .collect()
    }
    assert got.keys() == want.keys()
    for g in want:
        assert got[g]["q_0.25"] == want[g]["q_0.25"]
        assert got[g]["q_0.5"] == want[g]["q_0.5"]


def test_matches_duckdb_quantile_cont(spark):
    """Interpolation parity pinned against DuckDB itself (ADVICE r4): ties,
    exact-rank hits, singleton groups, negative/huge values — the same corpus
    shapes the hypothesis fuzz draws, compared bit-exactly to quantile_cont."""
    import duckdb
    import random

    rng = random.Random(7)
    rows = []
    for g, size in [("s1", 1), ("t2", 2), ("ties", 30), ("big", 120)]:
        pool = [round(rng.uniform(-1e6, 1e6), 3) for _ in range(max(2, size // 3))]
        rows += [(g, rng.choice(pool)) for _ in range(size)]
    rows += [("exact5", float(v)) for v in (10, 20, 30, 40, 50)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: r.asDict()
        for r in exact_quantiles(df, ["g"], "v", PROBS).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    qcols = ", ".join(f'quantile_cont(v, {p}) AS "q_{p}"' for p in PROBS)
    want = {
        rec[0]: dict(zip([f"q_{p}" for p in PROBS], rec[1:]))
        for rec in con.execute(f"SELECT g, {qcols} FROM t GROUP BY g").fetchall()
    }
    assert got.keys() == want.keys()
    for g in want:
        for p in PROBS:
            assert got[g][f"q_{p}"] == want[g][f"q_{p}"], (g, p)


def test_quantiles_hypothesis_fuzz(spark):
    """Property fuzz vs the builtin: arbitrary group sizes, heavy ties,
    negative/huge values, probs spanning the exact-rank and interpolated
    cases. (settings tuned for one Spark job per example batch — examples
    are pooled into one DataFrame.)"""
    from hypothesis import given, settings, strategies as st

    from pyspark.sql import functions as F

    from tesseract_spark.operators.quantiles import exact_quantiles

    values = st.lists(
        st.one_of(
            st.integers(min_value=-1000, max_value=1000).map(float),
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False, width=64,
            ),
        ),
        min_size=1,
        max_size=60,
    )

    @settings(max_examples=12, deadline=None)
    @given(st.lists(values, min_size=1, max_size=4), st.data())
    def run(groups, data):
        probs = data.draw(
            st.lists(
                st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]),
                min_size=1, max_size=4, unique=True,
            )
        )
        small_threshold = data.draw(st.sampled_from([0, 2_000_000]))
        rows = [(f"g{gi}", v) for gi, vs in enumerate(groups) for v in vs]
        df = spark.createDataFrame(rows, "g string, v double")
        got = {
            r["g"]: r.asDict()
            for r in exact_quantiles(
                df, ["g"], "v", probs, small_threshold=small_threshold
            ).collect()
        }
        want = {
            r["g"]: r.asDict()
            for r in df.groupBy("g")
            .agg(*[F.expr(f"percentile(v, {p})").alias(f"q_{p}") for p in probs])
            .collect()
        }
        assert got.keys() == want.keys()
        for g in want:
            for p in probs:
                assert got[g][f"q_{p}"] == want[g][f"q_{p}"], (g, p, groups)

    run()
