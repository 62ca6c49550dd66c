"""The straddling-rank fold of :mod:`.quantiles`, in CONSTANT plan size.

The original fold unrolled one filter predicate + two conditional aggregates
per probability; past ~8 probs the plan's analysis/codegen cost grew
superlinearly (measured on the 16-edge ``derive_bin_edges`` call: 7.2 s at
15 probs vs 1.0 s at 1 over 583k distinct values, ~2 s of it pure driver-side
plan work repeated per query) — the same expression-size tax the r9
binned-measure fold rewrite killed. This long-format form keeps every
expression constant-size regardless of ``len(probs)``:

1. per row, ONE ``transform``+``filter`` over the literal probs array emits
   the (prob index, lo/up role) pairs the row's rank interval straddles —
   a runtime loop, not an unrolled predicate;
2. rows with no hits are dropped (≤ 2·|probs| survivors per group), the
   hits explode to long format;
3. a 3-aggregate ``groupBy(group, prob)`` picks each prob's straddling
   values, the interpolation runs per long row (one small expression), and
   a final one-``when``-per-prob pivot restores the wide output columns.

Numerically IDENTICAL to the unrolled form: same covers() predicate, same
max-per-(prob, role) fold, same ``(k + 1 − h)·lo + (h − k)·up`` blend with
the exact-rank / tied-value shortcuts — bit-equal to Spark's builtin
``percentile`` and DuckDB ``quantile_cont`` (the whole oracle family
re-proves it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fold_straddlers(
    ranked: DataFrame,
    group_cols: list[str],
    probs: list[float],
    out_names: list[str],
) -> DataFrame:
    """Requires columns ``__v __c __hi __n`` (value, multiplicity,
    cumulative count, group total); returns ``group_cols + out_names``."""
    # Every plan piece is built as ONE SQL string per projection/aggregate
    # (r16 did the pre-filter; r17 the rest): constructing ~10 Column
    # objects per (prob, role) through py4j costs ~1 ms per call on the
    # driver — measured 0.67 s of pure plan-BUILD per fold call at 15
    # probs, on top of the 2-4 s the r16 unroll already removed. Each SQL
    # string mirrors the former Column form exactly (same double literals
    # via repr, same FLOOR/LEAST/CAST arithmetic, same function order), so
    # the expression trees — and therefore the results — are unchanged.
    def k_sql(i: int) -> str:
        # h = p·(n−1) in double, k = floor(h) — identical to Spark
        # percentile / DuckDB quantile_cont
        return (
            f"CAST(FLOOR({float(probs[i])!r}D * "
            f"CAST(__n - 1 AS DOUBLE)) AS BIGINT)"
        )

    def k1_sql(i: int) -> str:
        return f"LEAST({k_sql(i)} + 1, __n - 1)"

    def cov_sql(r: str) -> str:
        return f"({r} >= __hi - __c AND {r} < __hi)"

    # boolean pre-filter first (no struct allocation), so the struct-building
    # array runs only on the ≤ 2·|probs| survivors per group. UNROLLED as
    # a plain OR chain rather than an `exists` over the probs array: array
    # higher-order functions evaluate their lambda INTERPRETED per element
    # (measured r16: ~5 s single-threaded over 583k distinct values × 30
    # lambda evals), while the OR chain whole-stage-codegens — fast enough
    # that the few-group direct path no longer needs to repartition the
    # ranked table just to spread this filter (quantiles.py r16).
    relevant = F.expr(
        " OR ".join(
            f"({cov_sql(k_sql(i))} OR {cov_sql(k1_sql(i))})"
            for i in range(len(probs))
        )
    )
    # per surviving row, one CASE per (prob index, lo/up role) emits the
    # straddle hits; filter(IS NOT NULL) + explode reproduces the former
    # flatten(transform(idx, …filter…)) + size()>0 + explode chain exactly
    # (same elements, same (i asc, role 0 then 1) order; explode of an
    # empty array already emits nothing, so the size() guard was redundant)
    hits_elems = ", ".join(
        f"CASE WHEN {cov_sql(k_sql(i) if role == 0 else k1_sql(i))} "
        f"THEN named_struct('i', {i}, 'role', {role}) END"
        for i in range(len(probs))
        for role in (0, 1)
    )
    gcols = [F.col(g) for g in group_cols]
    long = ranked.where(relevant).select(
        *gcols,
        F.col("__v"),
        F.col("__n"),
        F.expr(
            f"explode(filter(array({hits_elems}), s -> s IS NOT NULL))"
        ).alias("__h"),
    ).select(
        *gcols,
        F.col("__v"),
        F.col("__n"),
        F.expr("__h.i").alias("__i"),
        F.expr("__h.role").alias("__role"),
    )
    # both shuffles below run over the ≤ 2·|probs| survivors per group,
    # never the distinct-value table
    per_prob = long.groupBy(*group_cols, "__i").agg(
        F.expr("max(CASE WHEN __role = 0 THEN __v END)").alias("__lo"),
        F.expr("max(CASE WHEN __role = 1 THEN __v END)").alias("__up"),
        F.expr("first(__n)").alias("__n"),
    )
    plist = ", ".join(f"{float(p)!r}D" for p in probs)
    h = f"(element_at(array({plist}), __i + 1) * CAST(__n - 1 AS DOUBLE))"
    lo = "CAST(__lo AS DOUBLE)"
    up = "CAST(__up AS DOUBLE)"
    # Spark's Percentile.getPercentile symmetric weighting — bit-equal to
    # the builtin (and, transitively, DuckDB quantile_cont):
    #   (higher - pos) * lower + (pos - lower) * higher
    # exact-rank hit (frac == 0) or equal straddling values (tie): both
    # engines return the value itself rather than interpolating — Spark's
    # counts-map puts both ranks in one bucket, DuckDB shortcuts lo == up
    val = (
        f"CASE WHEN {h} = FLOOR({h}) OR {lo} = {up} THEN {lo} "
        f"ELSE (FLOOR({h}) + 1 - {h}) * {lo} + ({h} - FLOOR({h})) * {up} END"
    )
    scored = per_prob.withColumn("__q", F.expr(val))
    return scored.groupBy(*group_cols).agg(
        *[
            F.expr(f"max(CASE WHEN __i = {i} THEN __q END)").alias(name)
            for i, name in enumerate(out_names)
        ]
    )
