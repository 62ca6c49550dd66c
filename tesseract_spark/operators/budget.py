"""Token-budget mixture planning — the "data recipe" computation.

Before a large pretraining run, the pipeline turns (per-source token
inventory, target mixture weights, total token budget) into a concrete
plan: how many tokens to draw from each source, at what sampling rate, and
how many epochs (repeats) that implies. This is the planning complement of
the execution-side operators already in the package (`temperature_mixture`
resamples, `epoch_shuffle` orders, `pack_sequences` materializes): those
APPLY a recipe, this COMPUTES one.

Everything is integer-exact and engine-portable:

- inventory = per-source sum of whitespace token counts (the same
  tokenizer as `operators/text.py`);
- the budget splits across sources by the largest-remainder (Hamilton)
  method over the target weights — the same allocator as
  ``stratified_sample_exact``, so ``sum(target_tokens) == budget`` exactly
  whenever the weighted sources exist;
- ``rate_ppm = min(10^6, target·10^6 DIV available)`` is the subsampling
  rate for over-supplied sources; ``epochs_ppk = target·1000 DIV
  available`` expresses repeats for under-supplied ones (1000 = exactly
  one pass, 3500 = 3.5 epochs — the up-sampling regime public pretraining
  recipes report).

Scale: the data-sized work is ONE map-side-combined aggregation over the
corpus (per-source token sums); the allocation math runs on a
source-count-sized table (windows over dozens of rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import _sql_token_count, token_count_col


def plan_token_budget(
    df: DataFrame,
    weights: dict[str, int],
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source training-mix plan:
    ``(source, available_tokens, weight, target_tokens, rate_ppm,
    epochs_ppk)``.

    ``weights`` are relative integers (any scale — only ratios matter).
    Sources present in the corpus but absent from ``weights`` get weight 0
    (target 0 — excluded from the mix but still inventoried); weights for
    sources with no corpus rows are ignored (their share is re-allocated by
    the Hamilton remainder pass over the present sources). If NO weighted
    source exists in the corpus the plan raises at execution time rather
    than silently allocating zero tokens everywhere (ADVICE r6).
    """
    inv = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(token_count_col(F.col(text_col))).alias("available_tokens")
    )
    wrows = [(s, int(w)) for s, w in sorted(weights.items())]
    wdf = df.sparkSession.createDataFrame(wrows, "source string, weight long")
    t = inv.join(F.broadcast(wdf), "source", "left").select(
        "source",
        "available_tokens",
        F.coalesce(F.col("weight"), F.lit(0)).alias("weight"),
    )
    # Hamilton allocation of budget_tokens by weight over PRESENT sources
    wtot = Window.partitionBy(F.lit(1))
    wrank = Window.partitionBy(F.lit(1)).orderBy(
        F.col("rem").desc(), F.col("source").asc()
    )
    alloc = (
        t.withColumn("W", F.sum("weight").over(wtot))
        .withColumn(
            "base",
            F.when(
                F.col("W") > 0,
                F.expr(f"{budget_tokens} * weight DIV W"),
            ).otherwise(
                # ADVICE r6: W == 0 means no weighted source exists in the
                # corpus — the whole budget would silently allocate to
                # nothing. Fail loudly at execution time instead of
                # planning a zero-token mix (lazy, so the check costs
                # nothing on well-formed recipes).
                F.raise_error(
                    F.lit(
                        "plan_token_budget: no weighted source present in "
                        "the corpus (sum of weights over present sources "
                        "is 0) — check the recipe's source names"
                    )
                ).cast("long")
            ),
        )
        .withColumn(
            "rem",
            F.when(
                F.col("W") > 0, (F.lit(budget_tokens) * F.col("weight")) % F.col("W")
            ).otherwise(F.lit(0)),
        )
        .withColumn("leftover", F.lit(budget_tokens) - F.sum("base").over(wtot))
        .withColumn("rr", F.row_number().over(wrank))
        .withColumn(
            "target_tokens",
            F.col("base")
            + F.when(
                (F.col("weight") > 0) & (F.col("rr") <= F.col("leftover")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
    )
    return alloc.select(
        "source",
        "available_tokens",
        "weight",
        "target_tokens",
        F.when(
            F.col("available_tokens") > 0,
            F.least(
                F.lit(1_000_000),
                F.expr("target_tokens * 1000000 DIV available_tokens"),
            ),
        )
        .otherwise(F.lit(0))
        .alias("rate_ppm"),
        F.when(
            F.col("available_tokens") > 0,
            F.expr("target_tokens * 1000 DIV available_tokens"),
        )
        .otherwise(F.lit(0))
        .alias("epochs_ppk"),
    )


def plan_token_budget_oracle_sql(
    weights: dict[str, int],
    budget_tokens: int,
    table: str = "documents",
    source_col: str = "source",
    text_col: str = "text",
) -> str:
    """DuckDB mirror — identical tokenizer, identical Hamilton integers."""
    wvals = ", ".join(f"('{s}', {int(w)})" for s, w in sorted(weights.items()))
    tok = _sql_token_count(text_col)
    return f"""
    WITH inv AS (
      SELECT {source_col} AS source,
             CAST(sum({tok}) AS BIGINT) AS available_tokens
      FROM {table} GROUP BY 1),
    wt AS (SELECT * FROM (VALUES {wvals}) w(source, weight)),
    t AS (
      SELECT i.source, i.available_tokens,
             CAST(COALESCE(w.weight, 0) AS BIGINT) AS weight
      FROM inv i LEFT JOIN wt w USING (source)),
    seats AS (
      SELECT source, available_tokens, weight,
             sum(weight) OVER () AS W
      FROM t),
    alloc AS (
      SELECT source, available_tokens, weight,
             CASE WHEN W > 0 THEN {budget_tokens} * weight // W ELSE 0 END AS base,
             CASE WHEN W > 0 THEN ({budget_tokens} * weight) % W ELSE 0 END AS rem
      FROM seats),
    final AS (
      SELECT source, available_tokens, weight,
             CAST(base + CASE WHEN weight > 0 AND
               row_number() OVER (ORDER BY rem DESC, source ASC)
               <= {budget_tokens} - sum(base) OVER ()
             THEN 1 ELSE 0 END AS BIGINT) AS target_tokens
      FROM alloc)
    SELECT source, available_tokens, weight, target_tokens,
           CASE WHEN available_tokens > 0
                THEN CAST(least(1000000,
                     target_tokens * 1000000 // available_tokens) AS BIGINT)
                ELSE 0 END AS rate_ppm,
           CASE WHEN available_tokens > 0
                THEN CAST(target_tokens * 1000 // available_tokens AS BIGINT)
                ELSE 0 END AS epochs_ppk
    FROM final
    """
