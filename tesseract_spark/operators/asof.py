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


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    bucket: str = "30 days",
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Hot-key-safe as-of join: identical semantics to :func:`asof_join`, but
    no task ever holds a whole key's history.

    :func:`asof_join`'s single window puts ALL rows of a join key in one
    task — correct until one entity dominates (a bot user, a null key). This
    variant sub-partitions time into fixed buckets:

    1. the same union + last-ignore-nulls window, but partitioned by
       (key, bucket) — each task sees one key-bucket, volume bounded by the
       bucket width;
    2. a per-(key, bucket) "carry" table — the last right-row state at each
       bucket's end (computed map-side by aggregating the bucket window's
       final values: ~keys × buckets rows, tiny relative to events);
    3. a window over the carry table (per key, ordered by bucket) rolls
       state forward, so bucket b knows the latest right row from ALL
       earlier buckets;
    4. left rows with no in-bucket match fill from the previous bucket's
       rolled-up carry via an equi-join on (key, bucket).

    Cost: two keyed shuffles of the data + one tiny carry shuffle, vs one
    shuffle for the plain version — pay it when keys are skewed.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    carried = [right_ts, *right_cols]

    bucket_expr = F.window(F.col("__ts"), bucket)["start"]

    l_tag = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    r_tag = (
        right.select(*on, right_ts, *right_cols)
        .withColumn("__ts", F.col(right_ts))
        .withColumn("__is_left", F.lit(0))
    )
    for c in carried:
        r_tag = r_tag.withColumnRenamed(c, f"__r_{c}")
    u = l_tag.unionByName(r_tag, allowMissingColumns=True).withColumn(
        "__bucket", bucket_expr
    )

    w = (
        Window.partitionBy(*on, "__bucket")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in carried:
        u = u.withColumn(
            f"__in_{c}", F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    # the windowed union feeds THREE consumers (the carry aggregate, the
    # bucket spine, and the left-row output) whose differing column needs
    # defeat ReusedExchange — left lazy, each consumer re-ran the full
    # union + (key, bucket) shuffle + window sort (measured: 3 Windows /
    # 3 Unions / 12 parquet scans in one plan). Materialize it ONCE
    # (r16, guide §2.4 "share one computation"): bounded by the rows that
    # already cross the bucket-window shuffle, pruned to the columns the
    # consumers read (the raw __r_ inputs are dead once __in_ is computed).
    u = u.select(
        *left.columns,
        "__ts",
        "__is_left",
        "__bucket",
        *[f"__in_{c}" for c in carried],
    ).localCheckpoint(eager=False)

    # per-(key, bucket) final right state = the in-bucket carry at the last
    # right row (max_by over right rows only; NULL-safe when bucket has none)
    carry = (
        u.filter(F.col("__is_left") == 0)
        .groupBy(*on, "__bucket")
        .agg(
            *[
                F.max_by(F.col(f"__in_{c}"), F.col("__ts")).alias(f"__end_{c}")
                for c in carried
            ]
        )
    )
    wc = (
        Window.partitionBy(*on)
        .orderBy(F.col("__bucket").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # state rolled up to the END of the PREVIOUS bucket, keyed by this bucket
    prev = carry.select(
        *on,
        "__bucket",
        *[F.col(f"__end_{c}").alias(f"__prevsrc_{c}") for c in carried],
    )
    # roll forward over ALL buckets each key has (left or right): build the
    # full bucket spine first so gaps (buckets with no right rows) still see
    # older state
    spine = u.select(*on, "__bucket").distinct()
    rolled = spine.join(prev, [*on, "__bucket"], "left")
    for c in carried:
        rolled = rolled.withColumn(
            f"__prev_{c}",
            F.last(F.col(f"__prevsrc_{c}"), ignorenulls=True).over(wc),
        )
    rolled = rolled.select(
        *on, "__bucket", *[f"__prev_{c}" for c in carried]
    )

    out = (
        u.filter(F.col("__is_left") == 1)
        .join(rolled, [*on, "__bucket"], "left")
    )
    for c in carried:
        out = out.withColumn(
            f"{c}{suffix}", F.coalesce(F.col(f"__in_{c}"), F.col(f"__prev_{c}"))
        )
    return out.select(*left.columns, *[f"{c}{suffix}" for c in carried])
