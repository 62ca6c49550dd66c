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
    parr = F.array(*[F.lit(float(p)) for p in probs])
    idx = F.array(*[F.lit(i) for i in range(len(probs))])
    n1 = (F.col("__n") - F.lit(1)).cast("double")
    lo_edge = F.col("__hi") - F.col("__c")

    def covers(r):
        return (r >= lo_edge) & (r < F.col("__hi"))

    def k_of(i):
        # h = p·(n−1) in double, k = floor(h) — identical to Spark
        # percentile / DuckDB quantile_cont
        return F.floor(F.element_at(parr, i + 1) * n1).cast("long")

    def k1_of(i):
        return F.least(k_of(i) + F.lit(1), F.col("__n") - F.lit(1))

    hit = lambda i, role, r: F.when(  # noqa: E731
        covers(r), F.struct(i.alias("i"), F.lit(role).alias("role"))
    )
    hits = F.flatten(
        F.transform(
            idx,
            lambda i: F.filter(
                F.array(hit(i, 0, k_of(i)), hit(i, 1, k1_of(i))),
                lambda s: s.isNotNull(),
            ),
        )
    )
    # boolean pre-filter first (no struct allocation), so the struct-building
    # transform runs only on the ≤ 2·|probs| survivors per group. UNROLLED as
    # a plain OR chain rather than an `exists` over the probs array: array
    # higher-order functions evaluate their lambda INTERPRETED per element
    # (measured r16: ~5 s single-threaded over 583k distinct values × 30
    # lambda evals), while the OR chain whole-stage-codegens — fast enough
    # that the few-group direct path no longer needs to repartition the
    # ranked table just to spread this filter (quantiles.py r16). Plan size
    # stays linear and SMALL: one ~5-op covers() term per (prob, role), not
    # the per-prob conditional AGGREGATES whose unrolled form this module
    # replaced. Survival semantics are identical to the `exists` form: same
    # k_of/k1_of arithmetic on the same double literals, OR over the same
    # predicate set; `hits` (on survivors only) keeps the HOF form.
    # built as ONE SQL string parsed JVM-side: constructing ~10 Column
    # objects per (prob, role) through py4j costs ~1 ms per call on the
    # driver (measured: 2-4 s of plan-BUILD time for 15 probs), while one
    # expr() is a single round trip. The SQL mirrors the Column form
    # exactly: same double literals, same floor/least/cast arithmetic.
    def k_sql(i: int) -> str:
        return (
            f"CAST(FLOOR({float(probs[i])!r}D * "
            f"CAST(__n - 1 AS DOUBLE)) AS BIGINT)"
        )

    def cov_sql(r: str) -> str:
        return f"({r} >= __hi - __c AND {r} < __hi)"

    relevant = F.expr(
        " OR ".join(
            f"({cov_sql(k_sql(i))} OR "
            f"{cov_sql(f'LEAST({k_sql(i)} + 1, __n - 1)')})"
            for i in range(len(probs))
        )
    )
    long = (
        ranked.where(relevant)
        .withColumn("__hits", hits)
        .where(F.size("__hits") > 0)
        .select(
            *group_cols,
            "__v",
            "__n",
            F.explode("__hits").alias("__h"),
        )
        .select(
            *group_cols,
            "__v",
            "__n",
            F.col("__h.i").alias("__i"),
            F.col("__h.role").alias("__role"),
        )
    )
    # both shuffles below run over the ≤ 2·|probs| survivors per group,
    # never the distinct-value table
    per_prob = long.groupBy(*group_cols, "__i").agg(
        F.max(F.when(F.col("__role") == 0, F.col("__v"))).alias("__lo"),
        F.max(F.when(F.col("__role") == 1, F.col("__v"))).alias("__up"),
        F.first("__n").alias("__n"),
    )
    h = F.element_at(parr, F.col("__i") + 1) * (
        (F.col("__n") - F.lit(1)).cast("double")
    )
    lo_rank = F.floor(h)
    lo = F.col("__lo").cast("double")
    up = F.col("__up").cast("double")
    # Spark's Percentile.getPercentile symmetric weighting — bit-equal to
    # the builtin (and, transitively, DuckDB quantile_cont):
    #   (higher - pos) * lower + (pos - lower) * higher
    interp = (lo_rank + F.lit(1) - h) * lo + (h - lo_rank) * up
    # exact-rank hit (frac == 0) or equal straddling values (tie): both
    # engines return the value itself rather than interpolating — Spark's
    # counts-map puts both ranks in one bucket, DuckDB shortcuts lo == up
    val = F.when((h == lo_rank) | (lo == up), lo).otherwise(interp)
    scored = per_prob.withColumn("__q", val)
    return scored.groupBy(*group_cols).agg(
        *[
            F.max(F.when(F.col("__i") == i, F.col("__q"))).alias(name)
            for i, name in enumerate(out_names)
        ]
    )
