"""Run every catalog entry against its DuckDB oracle — the local mirror of the
driver's CORRECTNESS gate (sf configurable via SPARK_GRAFT_TEST_SF_DIR)."""

from __future__ import annotations

import pytest

from tesseract_spark import catalog

from .conftest import assert_df_matches_sql

ORACLE_NAMES = sorted(catalog.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(name, spark, sf_dir, duck):
    # zero tolerance: every entry is engineered to be BIT-EXACT against its
    # oracle (exact decimal sums, mirrored rounding, portable hashing — see
    # scripts/audit_bitexact.py); the driver's value-hash requires it, so a
    # tolerance here would hide exactly the regressions that gate failures
    entry = catalog.ENTRIES[name]
    df = entry.spark_fn(spark, sf_dir)
    assert_df_matches_sql(df, duck, entry.oracle, rtol=0.0, atol=0.0)


def test_all_queries_have_entry_or_weak_check():
    # every catalog entry carries a full SQL oracle — the formerly-weak pair
    # (q_ann_lsh_topk, q_approx_distinct_count) now has exact mirrors too
    weak = {n for n, e in catalog.ENTRIES.items() if e.oracle is None}
    assert weak == set(), f"unexpectedly oracle-less: {weak}"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
