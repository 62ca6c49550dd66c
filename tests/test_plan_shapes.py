"""Physical-plan regression guard for every catalog entry.

Correctness tests can't see a plan regress from one shuffle to five, or a
join silently degrade to a cartesian product — at bench scale everything
still "passes". These tests pin the plan SHAPE: the property that has to
hold at 1000× the data.
"""

from __future__ import annotations

import re

import pytest

from tesseract_spark import catalog

# entries where a BroadcastNestedLoopJoin is the intended physical plan: a
# deliberately tiny broadcast side (literal query-vector table, 1-row grand
# total) crossed against the data — bounded work per row, scale-safe
BNLJ_WHITELIST = {
    "q_ann_cosine_topk",
    "q_ann_recall_pq",  # composes the brute-force leg's broadcast-query cross
    "q_ann_ivf_topk",
    "q_ann_ivf_index",  # same broadcast-centroid probe shape, index-served
    "q_ann_lsh_topk",
    "q_growth_year",
    "q_growth_div0_inf",  # same global-lag pid<pid' carry shape as q_growth_year
    "q_growth_div0_null",  # same carry shape, opt-in NULL div0 mode
    "q_growth_yoy",  # same pid<pid' carry shape, array-valued at offset 12
    "q_rca_debug",
    "q_rca_region_flag",
    "q_sort_by_growth",
    "q_tfidf_topk_terms",
    "q_dense_yearly",
    "q_mixture_temperature",  # 1-row broadcast grand-total crossed into rates
    "q_semantic_dedup",  # broadcast-centroid assignment (same shape as ivf)
    "q_stratified_sample",  # 1-row broadcast grand-total crossed into seats
    "q_key_skew_profile",  # 1-row broadcast grand-total crossed into top-k
    "q_vocab_coverage",  # 1-row broadcast token total crossed into top-k
    "q_cms_join_size",  # 1-row broadcast estimate crossed into 1-row true size
    "q_hll_distinct",  # 1-row broadcast register summary crossed into exact
    "q_lm_bigram_score",  # 1-row broadcast vocabulary size crossed into lik
    # round-8 debuts — all bounded-broadcast crosses, small side <= k rows:
    "q_curriculum_order",  # n_tiers-1 threshold rows crossed into the corpus
    "q_hard_negative_band",  # <=k query vectors broadcast over the corpus
    "q_ann_ivf_query_vectors",  # <=k query vectors x n_centroids probe
    "q_bm25_topk",  # 1-row broadcast corpus stats (N, total_dl) crossed in
    # late round-8 debuts:
    "q_hybrid_rrf",  # inherits the bm25 leg's 1-row corpus-stats cross
}

# exchange-node ceilings (shuffles + broadcasts in the INITIAL adaptive plan;
# AQE's ReuseExchange dedupes identical subtrees at runtime). Measured at
# sf0.001 with 2x slack — the guard is against order-of-magnitude plan
# regressions, not exchange-count golden values
EXCHANGE_CEILING = {
    "q_ann_ivf_topk": 30,
    "q_ann_ivf_index": 30,  # build (train+assign+partitioned write) + probe
    "q_semantic_dedup": 48,  # k-means train + assign + in-cluster pair scan
    "q_stratified_sample": 24,  # seat math (tiny) + bucketed rank + manifest
    "q_pagerank_dups": 98,  # 3 unrolled iterations × (join+groupBy) + LSH sig
    "q_multi_cut_union": 44,
    "q_rca_debug": 54,
    "q_rca_region_flag": 54,
    "q_cut_like": 22,
    "q_growth_year": 24,
    "q_growth_div0_inf": 24,
    "q_growth_div0_null": 24,
    # bounded-buffer LSH (r8): size/min window + small/star branch union,
    # both branches hanging off the same (band,bucket) shuffle (AQE reuses)
    "q_dedup_verified": 16,
    "q_sort_by_growth": 22,
    "q_cut_semijoin": 14,
    "q_top_brands_per_region": 16,
    "q_top_where": 16,
    # two full pipelines composed (LSH+verify over the tagged union of the
    # new batch and the index side) — the honest sum of q_dedup_verified's
    # branches plus the cross-side anti-duplication split
    "q_minhash_vs_index": 24,
    # two audited retrieval legs composed (BM25's tf/df/dl aggs + cosine
    # top-k) + the rank-fusion outer join; measured 14 at sf0.001
    "q_hybrid_rrf": 28,
    # r11: two full ANN tiers composed (brute-force + PQ train/encode/ADC)
    # + the intersection join/group; measured 14 at sf0.001
    "q_ann_recall_pq": 28,
}
DEFAULT_CEILING = 12

#: entries allowed to carry built-in exact `percentile` (a buffering
#: ObjectHashAggregate). Since r10 (VERDICT r9 #3) NO entry buffers raw
#: fact values — the whitelist holds only structurally-bounded shapes:
#: - q_custom_percentile_inline: the Custom-template exercise over the
#:   12-row literal score_samples inline fact — the buffer is bounded by
#:   the fixture's row count at ANY sf (machine-checked below: its plan
#:   must contain no file scan at all);
#: - q_median_order / q_two_phase_mixed: BasicGroupedMedian's pass 2 is
#:   `F.median` over PASS-1 PRE-AGGREGATED rows (one row per hidden-drill
#:   group), so the buffer is bounded by grain cardinality, not data size
#:   — the reference's two-phase median (aggregator.rs median-of-groups)
#:   has the same shape. Scale-safe by construction.
EXACT_PERCENTILE_WHITELIST = {
    "q_custom_percentile_inline",
    "q_median_order",
    "q_two_phase_mixed",
}


def test_custom_percentile_inline_reads_no_files(spark, sf_dir):
    """The one entry whose plan may buffer a group's raw values must be
    structurally bounded: its physical plan reads NO files — the fact is
    the literal 12-row fixture, so the buffer cannot scale with sf."""
    df = catalog.ENTRIES["q_custom_percentile_inline"].spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan and "parquet" not in plan.lower(), (
        "q_custom_percentile_inline touches file data — its percentile "
        "buffer is no longer structurally bounded"
    )


@pytest.mark.parametrize("name", sorted(catalog.ENTRIES))
def test_plan_shape(name, spark, sf_dir):
    df = catalog.ENTRIES[name].spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()

    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if name not in BNLJ_WHITELIST:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unexpected nested-loop join (non-equi or missing key?)"
        )
    if name not in EXACT_PERCENTILE_WHITELIST:
        # VERDICT r6 #2 generalized in r9 (VERDICT r8 #7), tightened in r10
        # (VERDICT r9 #3): built-in exact `percentile` is an
        # ObjectHashAggregate whose buffer holds EVERY value of a group —
        # the one aggregate shape in the package that does not survive a
        # 100× group. It is allowed ONLY over structurally-bounded inputs
        # (the whitelist above — never raw fact data); every other entry
        # must source quantiles from the distributed exact_quantiles rank
        # fold (operators/quantiles.py) or a bounded sketch
        # (approx_percentile's GK buffer is fine and unmatched by this
        # regex, as is DuckDB-side quantile_cont).
        exact_pct = re.findall(r"(?<!approx_)percentile\(", plan)
        assert not exact_pct, (
            f"{name}: exact `percentile` aggregate in the plan — per-group "
            "value buffering outside the structurally-bounded whitelist; "
            "use operators/quantiles.exact_quantiles or approx_percentile"
        )
    n_exchange = len(re.findall(r"\bExchange\b", plan))
    ceiling = EXCHANGE_CEILING.get(name, DEFAULT_CEILING)
    assert n_exchange <= ceiling, (
        f"{name}: {n_exchange} exchange nodes (ceiling {ceiling}) — plan "
        f"regressed; inspect df.explain('formatted')"
    )


#: entries allowed to carry a single-partition Window node (bounded input
#: by construction). Kept EMPTY on purpose: the package's bounded rankings
#: all use the array-fold pattern now, so any entry appearing here again
#: is a regression to the shape whose warning masks real scale bugs.
UNPARTITIONED_WINDOW_WHITELIST: set[str] = set()


@pytest.mark.parametrize("name", sorted(catalog.ENTRIES))
def test_no_unpartitioned_windows(name, spark, sf_dir):
    """No entry's physical plan may contain a WindowExec without partition
    columns (or partitioned by a literal — Spark 4.1 warns identically and
    executes identically: ALL rows to one partition). The load-bearing
    claim: a 'No Partition Defined' warning in any log is a real bug."""
    if name in UNPARTITIONED_WINDOW_WHITELIST:
        pytest.skip("documented bounded exception")
    df = catalog.ENTRIES[name].spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = []
    for m in re.finditer(r"windowspecdefinition\(([^,)]+)[,)]", plan):
        first = m.group(1).strip()
        # unpartitioned: the first argument is already an ORDERING expr;
        # literal-partitioned: the first argument is a bare literal
        if " ASC" in first or " DESC" in first or re.fullmatch(r"\d+", first):
            bad.append(first)
    assert not bad, (
        f"{name}: single-partition window spec(s) {bad} — rank bounded "
        "top-k rows via the array-fold pattern instead"
    )


def test_bucketed_join_entry_is_shuffle_free(spark, sf_dir):
    """q_bucketed_join_priority's fact-fact join must be a SortMergeJoin
    over bucketed scans with ZERO join-side Exchange — the only shuffle in
    the whole plan is the final 5-group aggregate. This is the one Catalyst
    behavior class (bucketed co-located joins) the reference surface never
    exercises and the 100 TB fact-fact story depends on."""
    import re

    df = catalog.ENTRIES["q_bucketed_join_priority"].spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, "merge-hinted bucketed join lost SMJ"
    exchanges = re.findall(r"Exchange \w+partitioning\([^\n]*", plan)
    assert len(exchanges) == 1 and "o_orderpriority" in exchanges[0], (
        f"expected the final aggregate's exchange only, saw: {exchanges}"
    )
    assert "SelectedBucketsCount" in plan and "Bucketed: true" in plan
