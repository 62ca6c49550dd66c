"""Range (interval) join: left rows matched to right rows whose timestamp
falls in a bounded window before the left timestamp.

The reference's join surface is equi-joins only (SURVEY.md §2.3 — "Not
present: theta/range/as-of/interval joins"); this is the time-series
companion to :mod:`.asof` (as-of = latest one; range = all within a window).

Spark executes a raw ``l.k = r.k AND r.ts BETWEEN l.ts - w AND l.ts`` join as
an equi-join on the key followed by a per-key filter — fine when keys are
selective, catastrophic when a key holds millions of rows (the pair blow-up
precedes the filter). The scalable formulation used here is **bucketing**:

1. both sides bucket timestamps into epoch-aligned buckets of width == the
   window length, so every right match of a left row lives in the left row's
   bucket or the one before it;
2. the left side explodes to those 2 candidate buckets;
3. equi-join on ``(key..., bucket)`` — a plain shuffled/broadcast hash join
   whose per-task pair count is bounded by bucket population, not key
   population;
4. the exact ``BETWEEN`` predicate filters bucket-level false positives.

One shuffle per side, no theta join, linear in matches. This is the same
decomposition Flink's interval join and range-join optimizers use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    window_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_r",
) -> DataFrame:
    """Inner range join: all (left, right) pairs with the same ``on`` key and
    ``left_ts - window <= right_ts <= left_ts`` (inclusive both ends).
    Right's non-key columns are emitted with ``suffix``."""
    w_us = window_seconds * 1_000_000

    l_us = F.unix_micros(F.col(left_ts))
    lb = F.floor(l_us / w_us)
    l = left.withColumn("__bucket", F.explode(F.array(lb - 1, lb)))

    r = right
    for c in r.columns:
        if c not in on:
            r = r.withColumnRenamed(c, f"{c}{suffix}")
    r_us = F.unix_micros(F.col(f"{right_ts}{suffix}"))
    r = r.withColumn("__bucket", F.floor(r_us / w_us))

    r_us_j = F.unix_micros(F.col(f"{right_ts}{suffix}"))
    l_us_j = F.unix_micros(F.col(left_ts))
    return (
        l.join(r, [*on, "__bucket"], "inner")
        .filter((r_us_j >= l_us_j - w_us) & (r_us_j <= l_us_j))
        .drop("__bucket")
    )


def recent_activity(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
    window_seconds: int = 3600,
) -> DataFrame:
    """Per left-type event: count and exact-decimal value sum of right-type
    events by the same user within the preceding window (events with no
    matches kept with 0s — left-join semantics via join-back on event_id)."""
    purchases = events.filter(F.col("event_type") == left_type).select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == right_type).select(
        "user_id", "ts", "value"
    )
    pairs = range_join(purchases, clicks, ["user_id"], window_seconds)
    per_event = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        # decimal sum: per-group double addition order differs between
        # engines → ulp drift; decimal is associative, folded once at the end
        F.sum(F.col("value_r").cast("decimal(38,6)"))
        .cast("double")
        .alias("match_value"),
    )
    return (
        purchases.join(per_event, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
            F.coalesce("match_value", F.lit(0.0)).alias("match_value"),
        )
    )


def recent_activity_oracle_sql(
    table: str = "events",
    left_type: str = "purchase",
    right_type: str = "click",
    window_seconds: int = 3600,
) -> str:
    return f"""
    SELECT p.event_id, p.user_id,
           count(c.user_id) AS n_matches,
           CAST(coalesce(sum(CAST(c.value AS DECIMAL(38,6))), 0) AS DOUBLE)
             AS match_value
    FROM {table} p
    LEFT JOIN {table} c
      ON p.user_id = c.user_id
     AND c.event_type = '{right_type}'
     AND epoch_us(c.ts) >= epoch_us(p.ts) - {window_seconds}::BIGINT * 1000000
     AND epoch_us(c.ts) <= epoch_us(p.ts)
    WHERE p.event_type = '{left_type}'
    GROUP BY 1, 2
    """
