from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from tesseract_spark.session import get_spark

    s = get_spark("tesseract_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def builder(spark, sf_dir):
    from tesseract_spark import PlanBuilder, testdata_registry, testdata_schema

    return PlanBuilder(spark, testdata_schema(), testdata_registry(spark, sf_dir))


@pytest.fixture(scope="session")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def assert_df_matches_sql(spark_df, duck, sql, *, atol=1e-9, rtol=1e-9):
    """Compare a Spark DataFrame against a DuckDB oracle query: same columns
    (by name), same row count, same values after sorting both by all columns.
    Float columns compare with tolerance; everything else exact."""
    import math

    sdf = spark_df.toPandas()
    ddf = duck.execute(sql).fetchdf()
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"columns differ: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
    )
    cols = sorted(sdf.columns)
    sdf = sdf[cols].sort_values(by=cols, ignore_index=True)
    ddf = ddf[cols].sort_values(by=cols, ignore_index=True)
    assert len(sdf) == len(ddf), f"row counts differ: spark={len(sdf)} duck={len(ddf)}"
    for c in cols:
        sv, dv = sdf[c].tolist(), ddf[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            # null on both sides: None, float NaN, or pandas NaT (x != x is
            # True exactly for NaN/NaT)
            a_null = a is None or a != a
            b_null = b is None or b != b
            if a_null and b_null:
                continue
            if isinstance(a, float) or isinstance(b, float):
                assert a is not None and b is not None, f"{c}[{i}]: {a!r} != {b!r}"
                assert math.isclose(a, b, rel_tol=rtol, abs_tol=atol), (
                    f"{c}[{i}]: {a!r} != {b!r}"
                )
            else:
                assert a == b, f"{c}[{i}]: {a!r} != {b!r}"
