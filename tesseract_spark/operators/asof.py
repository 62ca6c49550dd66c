"""As-of join: for each left row, the most recent right row at-or-before it.

The reference has no as-of operator (its join surface is equi-joins only —
SURVEY.md §2.3); this is the classic time-series/feature-store primitive a
training-data pipeline needs (point-in-time-correct feature lookup: join each
example to the latest feature snapshot ≤ its timestamp, never a future one).

Spark lacks a native ASOF JOIN, so it is composed from existing operators —
the **union + keyed last-ignore-nulls window** formulation:

1. tag left (1) and right (0) rows and union them (missing columns → NULL);
2. one window partitioned by the join key, ordered by (ts, tag) — the right
   row sorts BEFORE a left row at the same timestamp, giving inclusive
   (``left.ts >= right.ts``) semantics;
3. ``last(col, ignorenulls=True)`` carries each right column forward;
4. keep only left rows.

Scale shape: ONE shuffle on the join key (the window), no range or theta
join, no per-key state; skewed keys behave like any keyed window (salt the
key upstream if one entity dominates). This beats the naive
``l JOIN r ON l.k = r.k AND r.ts <= l.ts`` + argmax plan, which explodes to
O(|l per key| × |r per key|) pairs before pruning.

DuckDB has a native ``ASOF LEFT JOIN`` — the oracle uses it, pinning this
composition against an independent first-class implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right row with
    ``right_ts <= left_ts`` for the same ``on`` key (NULLs when none).

    ``right_cols`` are the carried payload columns (default: all non-key,
    non-ts columns of ``right``); each is emitted as ``<name><suffix>``, and
    the matched right timestamp as ``<right_ts><suffix>``."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    carried = [right_ts, *right_cols]

    l_tag = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    r_tag = (
        right.select(*on, right_ts, *right_cols)
        .withColumn("__ts", F.col(right_ts))
        .withColumn("__is_left", F.lit(0))
    )
    # right's payload columns must not collide with left's schema in the union
    for c in carried:
        r_tag = r_tag.withColumnRenamed(c, f"__r_{c}")
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in carried:
        u = u.withColumn(
            f"{c}{suffix}", F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    return u.filter(F.col("__is_left") == 1).select(
        *left.columns, *[f"{c}{suffix}" for c in carried]
    )
