"""Aggregator → Spark Column expressions.

The reference compiles every aggregator into a two-phase SQL form (pass-1 at
foreign-key grain before dim joins, pass-2 at drill grain after joins —
tesseract-clickhouse/src/sql/aggregator.rs:28-223). All of them except ``avg``
and ``basic_grouped_median`` are sum-decomposable, so a single Spark aggregate
produces identical results while letting Catalyst's partial→final
HashAggregate do the two-phase work physically (SURVEY.md §4). That is the
default plan: with broadcast dim joins it needs exactly one shuffle.

When a query contains a non-decomposable aggregator (``basic_grouped_median``
always; ``avg`` under ``avg_grain="fk"`` reference-parity mode), the builder
switches to an explicit two-phase plan and uses the ``pass1_cols``/``pass2_col``
forms here for *all* measures in the query — mirroring the reference's plan
shape (primary_agg.rs:93-121, 215-231).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schema.aggregator import (
    Aggregator,
    ApproxDistinctCount,
    Average,
    BasicGroupedMedian,
    BinnedQuantile,
    Count,
    Custom,
    DistinctCount,
    Max,
    Min,
    Moe,
    ReplicateWeightMoe,
    Sum,
    WeightedAverage,
    WeightedAverageMoe,
    WeightedSum,
)
from ..schema.model import Measure


def needs_two_phase(agg: Aggregator, avg_grain: str = "flat") -> bool:
    if isinstance(agg, BasicGroupedMedian):
        return True
    return isinstance(agg, Average) and avg_grain == "fk"


def _moe_sum_sq(col: Column, cv: float, scale: int | None = None) -> Column:
    # Square via multiplication, not pow(x, 2): *,/ are IEEE-deterministic
    # cross-engine, pow is a libm call whose last ulp varies by build.
    if scale is None:
        ratio = col / F.lit(cv)
        return F.sum(ratio * ratio)
    # Exact mode: cast the RAW column to decimal, not the computed square.
    # Rounding a computed double (arbitrary digits) to decimal lands near
    # scale boundaries where engines/versions disagree on the last digit
    # (Spark goes through the shortest string repr, DuckDB scales the exact
    # binary value); raw data values are "nice" decimals that sit far from
    # any boundary, so the cast is identical everywhere. The /cv² fold moves
    # after aggregation (_moe_fold) where it is a single IEEE double divide.
    dec = col.cast(f"decimal(18,{_raw_scale(scale)})")
    return F.sum(dec * dec)


def _raw_scale(scale: int) -> int:
    # squared terms carry 2× the raw cast's scale, so honor the measure's
    # declared exact_scale by casting the raw column at scale/2 (clamped so
    # decimal(18,s)² stays inside 38 digits of precision in both engines)
    return max(1, min(scale // 2, 9))


def _moe_fold(sub: Column, cv: float, scale: int | None) -> Column:
    """cv * sqrt(sum((col/cv)²)) from the aggregated sum-of-squares."""
    if scale is None:
        return F.lit(cv) * F.sqrt(sub)
    # sub is Σ col² in exact decimal; ÷cv² restores Σ (col/cv)² — both the
    # decimal→double cast (unscaled value < 2^53 at these magnitudes) and the
    # divide/sqrt/multiply are deterministic IEEE double ops cross-engine
    return F.lit(cv) * F.sqrt(sub.cast("double") / (F.lit(cv) * F.lit(cv)))


def _sq(expr: Column) -> Column:
    """IEEE-deterministic square (see _moe_sum_sq)."""
    return expr * expr


def _exact_sum(expr: Column, scale: int | None) -> Column:
    """Sum that is order-independent when ``scale`` is set.

    Double addition is non-associative: plan reorderings (semi-join pushdown,
    two-phase pre-agg, AQE) shift results by ulps. Casting each term to
    decimal(38, scale) makes the sum exact decimal arithmetic — associative,
    hence bit-stable across plans AND engines. The per-row double expression
    itself is IEEE-deterministic, so cross-engine parity holds end-to-end."""
    if scale is None:
        return F.sum(expr)
    return F.sum(expr.cast(f"decimal(38,{scale})"))


def _d(out: Column, scale: int | None) -> Column:
    """Fold an exact decimal aggregate back to the measure's double type."""
    return out.cast("double") if scale is not None else out


def _sq_diff_sum(terms: list[Column]) -> Column:
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total


def _bq_bin(col: Column, agg: BinnedQuantile) -> Column:
    """Bin index = number of boundaries <= value (mirrors
    operators/sketch._bin_col — identical CASE comparisons in the SQL
    oracle). NULL values yield a NULL index, which every conditional
    aggregate below excludes."""
    if not agg.boundaries:
        raise ValueError(
            "BinnedQuantile measure has no boundaries — an auto (n_bins) "
            "measure must be resolved first via "
            "PlanBuilder.resolve_binned_boundaries(cube_name)"
        )
    v = col.cast("double")
    b = F.lit(0)
    for bound in agg.boundaries:
        b = b + F.when(v >= F.lit(float(bound)), 1).otherwise(0)
    return b


def _bq_cell_aggs(
    col: Column, agg: BinnedQuantile
) -> tuple[list[Column], list[Column], list[Column]]:
    """Per-bin (count, min, max) AGGREGATE expressions — the fixed-size
    partial state (nb = len(boundaries)+1 cells per group, corpus-size
    independent)."""
    v = col.cast("double")
    b = _bq_bin(col, agg)
    nb = len(agg.boundaries) + 1
    cs = [
        F.sum(F.when(b == j, F.lit(1)).otherwise(F.lit(0)).cast("long"))
        for j in range(nb)
    ]
    mins = [F.min(F.when(b == j, v)) for j in range(nb)]
    maxs = [F.max(F.when(b == j, v)) for j in range(nb)]
    return cs, mins, maxs


def _bq_estimate(
    cs: list[Column], mins: list[Column], maxs: list[Column], p: float
) -> Column:
    """quantile_cont's rank blend over within-bin interpolated order
    statistics — post-aggregation expressions only, the SAME IEEE chain as
    operators/sketch.binned_quantiles and its DuckDB mirror (floor/least/
    CASE/fold arithmetic is identical cross-engine). An all-NULL group has
    n = 0 → no bin matches → NULL, like quantile_cont.

    Shape note: the per-rank bin lookup is a single ``F.aggregate`` fold
    carrying (running start, first match) over zipped (c, lo, hi) structs
    — NOT an unrolled when-chain over per-bin aggregate expressions. The
    unrolled form duplicated every aggregate subtree O(nb²) times; with
    11 bins that cost ~3.5 s of PLAN CONSTRUCTION + ANALYSIS per query
    (measured round 9), a fixed tax no data-side speed fixes. The fold
    references each array-of-aggregates ONCE per lookup and evaluates
    interpreted over nb elements per output row — trivially cheap at any
    group count. Same values bit-for-bit: integer starts accumulate in
    the same order, the interpolation chain is unchanged, and
    first-match-wins coalesce equals the when-chain's ordering."""
    bc = F.array(*cs)
    blo = F.array(*mins)
    bhi = F.array(*maxs)
    n = F.aggregate(bc, F.lit(0).cast("long"), lambda a, x: a + x)
    h = F.lit(float(p)) * (n - 1).cast("double")
    k = F.floor(h).cast("long")
    k1 = F.least(k + F.lit(1), n - 1)

    def value_at(r: Column) -> Column:
        zipped = F.transform(
            bc,
            lambda c, i: F.struct(
                c.alias("c"),
                F.element_at(blo, i + 1).alias("lo"),
                F.element_at(bhi, i + 1).alias("hi"),
            ),
        )
        acc0 = F.struct(
            F.lit(0).cast("long").alias("start"),
            F.lit(None).cast("double").alias("val"),
        )
        est = lambda acc, s: F.when(  # noqa: E731 — local fold step
            s["c"] > 1,
            s["lo"]
            + (s["hi"] - s["lo"])
            * ((r - acc["start"]).cast("double") / (s["c"] - 1)),
        ).otherwise(s["lo"])
        folded = F.aggregate(
            zipped,
            acc0,
            lambda acc, s: F.struct(
                (acc["start"] + s["c"]).alias("start"),
                F.coalesce(
                    acc["val"],
                    F.when(
                        (acc["start"] <= r) & (r < acc["start"] + s["c"]),
                        est(acc, s),
                    ),
                ).alias("val"),
            ),
        )
        return folded["val"]

    vk, vk1 = value_at(k), value_at(k1)
    return (k + 1 - h) * vk + (h - k) * vk1


def single_pass_agg(measure: Measure) -> Column:
    """One flat aggregate expression, aliased to the measure name.

    Exact-equal to the reference's two-phase result for every decomposable
    aggregator (the two-phase forms compose sums, aggregator.rs:28-223).
    """
    agg = measure.aggregator
    col = F.col(measure.column)
    es = measure.exact_scale
    if isinstance(agg, Sum):
        out = _d(_exact_sum(col, es), es)
    elif isinstance(agg, Count):
        out = F.count(col)
    elif isinstance(agg, Average):
        out = _d(_exact_sum(col, es), es) / F.count(col) if es is not None else F.avg(col)
    elif isinstance(agg, Max):
        out = F.max(col)
    elif isinstance(agg, Min):
        out = F.min(col)
    elif isinstance(agg, DistinctCount):
        out = F.count_distinct(col)
    elif isinstance(agg, ApproxDistinctCount):
        out = F.approx_count_distinct(col, rsd=agg.rsd)
    elif isinstance(agg, WeightedSum):
        out = _d(_exact_sum(col * F.col(agg.weight_column), es), es)
    elif isinstance(agg, WeightedAverage):
        out = _d(_exact_sum(col * F.col(agg.weight_column), es), es) / _d(
            _exact_sum(F.col(agg.weight_column), es), es
        )
    elif isinstance(agg, Moe):
        # cv * sqrt(sum(pow(col / cv, 2))) — aggregator.rs:64-70,193-198
        out = _moe_fold(_moe_sum_sq(col, agg.critical_value, es), agg.critical_value, es)
    elif isinstance(agg, ReplicateWeightMoe):
        # cv * sqrt(df/n_sec * Σ_i pow(sum(col) - sum(sec_i), 2)) — :52-63,177-192
        factor = agg.design_factor / len(agg.secondary_columns)
        total = _sq_diff_sum(
            [_sq(F.sum(col) - F.sum(F.col(sec))) for sec in agg.secondary_columns]
        )
        out = F.lit(agg.critical_value) * F.sqrt(F.lit(factor) * total)
    elif isinstance(agg, WeightedAverageMoe):
        # cv * sqrt(df/n * Σ_i pow(wavg(col, primary) - wavg(col, sec_i), 2)) — :71-93,199-217
        factor = agg.design_factor / len(agg.secondary_weight_columns)
        primary = F.sum(col * F.col(agg.primary_weight)) / F.sum(F.col(agg.primary_weight))
        total = _sq_diff_sum(
            [
                _sq(primary - F.sum(col * F.col(sec)) / F.sum(F.col(sec)))
                for sec in agg.secondary_weight_columns
            ]
        )
        out = F.lit(agg.critical_value) * F.sqrt(F.lit(factor) * total)
    elif isinstance(agg, BinnedQuantile):
        out = _bq_estimate(*_bq_cell_aggs(col, agg), agg.p)
    elif isinstance(agg, Custom):
        # template with {} placeholder — schema/aggregator.rs:91-92; under
        # exact_scale the template is expected to yield a decimal (the user
        # embeds the cast) and we fold back to double here
        out = F.expr(agg.template.replace("{}", measure.column))
        out = _d(out, es)
    elif isinstance(agg, BasicGroupedMedian):
        raise ValueError(
            "basic_grouped_median requires the two-phase plan path (hidden drilldown)"
        )
    else:
        raise ValueError(f"unsupported aggregator {agg!r}")
    return out.alias(measure.name)


def pass1_cols(measure: Measure, avg_grain: str = "flat") -> list[Column]:
    """Pass-1 (fk / hidden-dim grain) aggregate columns — aggregator.rs:28-99.

    Intermediate columns are suffixed ``{measure}__*``; ``pass2_col`` consumes
    them. ``avg`` under flat grain carries (sum, count) so pass-2 yields the
    true average rather than the reference's average-of-averages.
    """
    agg = measure.aggregator
    n = measure.name
    col = F.col(measure.column)
    es = measure.exact_scale
    if isinstance(agg, Sum):
        # exact mode: pass-1 KEEPS the decimal type so pass-2's re-sum is
        # still exact; the fold to double happens only in pass2_col
        return [_exact_sum(col, es).alias(n)]
    if isinstance(agg, (Max, Min)):
        fn = {Max: F.max, Min: F.min}[type(agg)]
        return [fn(col).alias(n)]
    if isinstance(agg, Count):
        return [F.count(col).alias(n)]
    if isinstance(agg, Average):
        if avg_grain == "fk":
            return [F.avg(col).alias(n)]
        return [_exact_sum(col, es).alias(f"{n}__num"), F.count(col).alias(f"{n}__cnt")]
    if isinstance(agg, BasicGroupedMedian):
        group_fn = getattr(F, agg.group_aggregator)
        return [group_fn(col).alias(n)]
    if isinstance(agg, BinnedQuantile):
        # fixed-size array partials: counts sum, bounds min/max — exactly
        # decomposable at any coarser grain (the aggnav rollup contract)
        cs, mins, maxs = _bq_cell_aggs(col, agg)
        return [
            F.array(*cs).alias(f"{n}__bc"),
            F.array(*mins).alias(f"{n}__bmin"),
            F.array(*maxs).alias(f"{n}__bmax"),
        ]
    if isinstance(agg, WeightedSum):
        return [_exact_sum(col * F.col(agg.weight_column), es).alias(n)]
    if isinstance(agg, WeightedAverage):
        return [
            _exact_sum(col * F.col(agg.weight_column), es).alias(f"{n}__num"),
            _exact_sum(F.col(agg.weight_column), es).alias(f"{n}__den"),
        ]
    if isinstance(agg, Moe):
        return [_moe_sum_sq(col, agg.critical_value, es).alias(f"{n}__sub")]
    if isinstance(agg, ReplicateWeightMoe):
        cols = [F.sum(col).alias(f"{n}__p")]
        cols += [
            F.sum(F.col(sec)).alias(f"{n}__s{i}")
            for i, sec in enumerate(agg.secondary_columns)
        ]
        return cols
    if isinstance(agg, WeightedAverageMoe):
        cols = [
            F.sum(col * F.col(agg.primary_weight)).alias(f"{n}__pnum"),
            F.sum(F.col(agg.primary_weight)).alias(f"{n}__pden"),
        ]
        for i, sec in enumerate(agg.secondary_weight_columns):
            cols.append(F.sum(col * F.col(sec)).alias(f"{n}__snum{i}"))
            cols.append(F.sum(F.col(sec)).alias(f"{n}__sden{i}"))
        return cols
    if isinstance(agg, Custom):
        return [F.expr(agg.template.replace("{}", measure.column)).alias(n)]
    raise ValueError(f"unsupported aggregator {agg!r}")


def pass2_col(measure: Measure, avg_grain: str = "flat") -> Column:
    """Pass-2 (drill grain) over pass-1 columns — aggregator.rs:157-223."""
    agg = measure.aggregator
    n = measure.name
    es = measure.exact_scale
    if isinstance(agg, (Sum, Count, WeightedSum, Custom)):
        # exact mode: pass-1 emitted decimals, so this re-sum is exact too;
        # fold to double only here at the very end
        return _d(F.sum(F.col(n)), es).alias(n)
    if isinstance(agg, Max):
        return F.max(F.col(n)).alias(n)
    if isinstance(agg, Min):
        return F.min(F.col(n)).alias(n)
    if isinstance(agg, Average):
        if avg_grain == "fk":
            return F.avg(F.col(n)).alias(n)  # reference avg-of-averages, :163
        return (_d(F.sum(f"{n}__num"), es) / F.sum(f"{n}__cnt")).alias(n)
    if isinstance(agg, BasicGroupedMedian):
        return F.median(F.col(n)).alias(n)
    if isinstance(agg, BinnedQuantile):
        nb = len(agg.boundaries) + 1
        cs = [F.sum(F.element_at(F.col(f"{n}__bc"), j + 1)) for j in range(nb)]
        mins = [
            F.min(F.element_at(F.col(f"{n}__bmin"), j + 1)) for j in range(nb)
        ]
        maxs = [
            F.max(F.element_at(F.col(f"{n}__bmax"), j + 1)) for j in range(nb)
        ]
        return _bq_estimate(cs, mins, maxs, agg.p).alias(n)
    if isinstance(agg, WeightedAverage):
        return (_d(F.sum(f"{n}__num"), es) / _d(F.sum(f"{n}__den"), es)).alias(n)
    if isinstance(agg, Moe):
        return _moe_fold(F.sum(f"{n}__sub"), agg.critical_value, es).alias(n)
    if isinstance(agg, ReplicateWeightMoe):
        factor = agg.design_factor / len(agg.secondary_columns)
        total = _sq_diff_sum(
            [
                _sq(F.sum(f"{n}__p") - F.sum(f"{n}__s{i}"))
                for i in range(len(agg.secondary_columns))
            ]
        )
        return (F.lit(agg.critical_value) * F.sqrt(F.lit(factor) * total)).alias(n)
    if isinstance(agg, WeightedAverageMoe):
        factor = agg.design_factor / len(agg.secondary_weight_columns)
        primary = F.sum(f"{n}__pnum") / F.sum(f"{n}__pden")
        total = _sq_diff_sum(
            [
                _sq(primary - F.sum(f"{n}__snum{i}") / F.sum(f"{n}__sden{i}"))
                for i in range(len(agg.secondary_weight_columns))
            ]
        )
        return (F.lit(agg.critical_value) * F.sqrt(F.lit(factor) * total)).alias(n)
    raise ValueError(f"unsupported aggregator {agg!r}")
