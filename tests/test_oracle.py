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


#: DuckDB result types a driver-checked oracle may emit. The driver's value
#: hash is dtype-sensitive: HUGEINT (what DuckDB returns for sum() over any
#: integer type) fetches to pandas as float64, so a Spark BIGINT vs oracle
#: HUGEINT column hashes differently even when every value is identical —
#: this exact mismatch was ALL NINE r4 hash-fails (and q_two_phase_mixed's
#: r2/r3 fails): 9/9 failing entries had a HUGEINT output column, 0/98 green
#: entries did. Every integer-sum output column must CAST(... AS BIGINT).
#: DECIMAL(22,1) is grandfathered: q_histogram_quantity emits it and is
#: driver-green (r4).
_DRIVER_SAFE_TYPES = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "TIMESTAMP",
                      "BOOLEAN", "DATE", "DECIMAL(22,1)"}


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_output_types_are_driver_safe(name, duck):
    rel = duck.sql(catalog.ENTRIES[name].oracle)
    bad = [
        f"{c}: {t}"
        for c, t in zip(rel.columns, [str(x) for x in rel.types])
        if str(t) not in _DRIVER_SAFE_TYPES
    ]
    assert not bad, (
        f"{name} oracle emits driver-unsafe output types {bad} — "
        "HUGEINT/other exotic types fetch with a different dtype than the "
        "Spark side and fail the driver's value hash; CAST the column "
        "(integer sums -> BIGINT)"
    )


#: DuckDB-version-risky oracle constructs (README "DuckDB-version
#: sensitivity"): semantics have churned across DuckDB releases or are
#: engine-discretionary, so each use must be a conscious decision — safe in
#: integer-count thresholds, allowed in OUTPUT columns only where a driver
#: row has proven the construct in the target environment (quantile_cont
#: outputs: driver-green r4 via q_quantiles_distributed). This inventory
#: pins the current usage sites; a new entry reaching for one of these
#: must be added here deliberately, with the justification in its oracle.
_VERSION_RISKY_USES = {
    r"\bmedian\s*\(": {"q_median_order", "q_two_phase_mixed"},
    r"\bquantile_cont\s*\(": {
        "q_approx_percentile",
        "q_curriculum_order",  # r8: tier thresholds, bit-audited vs the
        # operator's exact-quantile boundaries (integer length scores)
        "q_binned_auto_edges",  # r10: the edges CTE re-derives the rank
        # fold's boundaries with quantile_cont (the proven-equivalent pair)
        "q_custom_percentile_inline",  # r10: q_percentiles' successor —
        # quantile_cont over the 12 literal VALUES rows (construct proven
        # driver-green since r4)
        "q_price_quartile_counts",
        "q_quality_gate",
        "q_quantiles_distributed",
    },
    r"\bjson_extract\s*\(": {"q_events_json_props"},
    # round(x, n) on doubles is half-up vs half-even territory; 10 of these
    # 12 were driver-green in r4 (values land far from .5 boundaries by
    # construction — scaled integer numerators), so the construct is proven
    r"\bround\s*\(": {
        "q_ann_cosine_topk",
        "q_ann_int8_topk",  # r6: same round-6 cosine rescore as the ANN family
        "q_ann_ivf_topk",
        "q_ann_ivf_index",  # r7: reuses the ivf_topk oracle verbatim
        "q_ann_lsh_topk",
        "q_ann_near_dup",
        "q_avg_fk_grain",
        "q_corr_price_qty",
        "q_dedup_ngram_jaccard",
        "q_dedup_verified",
        "q_embed_dup_clusters",  # r5: cosine threshold only, not an output
        "q_embed_projection",  # r5: rounded JL projections, construct proven r4
        "q_embedding_dim_stats",
        "q_outlier_orders",
        "q_quality_gate",
        "q_semantic_dedup",  # r5: threshold comparison only, not an output
        "q_text_analysis",
        # r8 debuts, all bit-audited at sf0.01+sf0.1 this round:
        "q_ann_ivf_query_vectors",  # same round-6 cosine rescore as the family
        "q_best_in_cluster",  # round(quality,6) mirrors the Spark-side round
        "q_hard_negative_band",  # cosine rescore
        "q_minhash_vs_index",  # jaccard round, same as q_dedup_verified
        # late r8 debut, bit-audited at sf0.01+sf0.1:
        "q_hybrid_rrf",  # inherits the cosine leg's round(,6) INSIDE the
        # rank subquery only — outputs are integer ranks and rrf_ppm, so
        # the construct never reaches a hashed output column
        # r10 debuts, bit-audited at sf0.001+sf0.01+sf0.1:
        "q_ann_pq_topk",  # same round-6 cosine rescore as the ANN family
        "q_ann_ivfpq_index",  # same round-6 cosine rescore
        "q_ann_ivfpq_residual",  # same round-6 cosine rescore (IVFADC form)
        "q_ann_ivfpq_filtered",  # same round-6 cosine rescore, filtered scan
        # r11 debut:
        "q_ann_recall_pq",  # composes the brute-force + PQ CTEs; round(,6)
        # stays INSIDE the two top-k subqueries — the hashed output columns
        # are query_id and recall_at_k (a count ratio), never the rounded
        # cosine itself
    },
}


def test_version_risky_constructs_pinned():
    import re

    for pat, expected in _VERSION_RISKY_USES.items():
        actual = {
            n
            for n, e in catalog.ENTRIES.items()
            if e.oracle and re.search(pat, e.oracle)
        }
        assert actual == expected, (
            f"oracle usage of version-risky construct {pat!r} changed: "
            f"added={sorted(actual - expected)} "
            f"removed={sorted(expected - actual)} — update the pin "
            "deliberately (README: DuckDB-version sensitivity)"
        )


def test_all_queries_have_entry_or_weak_check():
    # every catalog entry carries a full SQL oracle — since r10 with NO
    # exceptions: q_bpe_merges (the iterative merge loop, formerly the one
    # rows-only entry) is now pinned as fingerprint-keyed VALUES because
    # the loop is a pure function of the bit-exactly-oracled
    # word-frequency table on fixed testdata (operators/bpe.py
    # merges_oracle_sql; scripts/gen_bpe_pins.py). Anything appearing
    # here is a regression.
    weak = {n for n, e in catalog.ENTRIES.items() if e.oracle is None}
    assert weak == set(), f"unexpected oracle-less set: {weak}"


def test_bpe_merges_oracle_rejects_unknown_corpus(duck):
    # the fingerprint-keyed oracle must fail LOUDLY (zero rows) on a
    # corpus it was not pinned for — never silently pass
    sql = catalog.ENTRIES["q_bpe_merges"].oracle
    patched = sql.replace(
        "FROM documents",
        "FROM (SELECT doc_id, text || 'x' AS text FROM documents)",
    )
    assert duck.execute(patched).fetchall() == []


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
