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
    from ..session import local_df

    wdf = local_df(df.sparkSession, wrows, "source string, weight long")
    t = inv.join(F.broadcast(wdf), "source", "left").select(
        "source",
        "available_tokens",
        F.coalesce(F.col("weight"), F.lit(0)).alias("weight"),
    )
    # Hamilton allocation of budget_tokens by weight over PRESENT sources.
    # Window-free seat math (VERDICT r7 #7 — literal-partition windows warn
    # identically to unpartitioned ones in Spark 4.1): fold the
    # source-count-sized table into one array, derive W = sum(weight) and
    # sum(base) as array aggregates, array_sort on (-rem, source) for the
    # remainder rank, posexplode back to rows. Inside array lambdas (no
    # DIV operator) integer floor division is the exact-multiple trick
    # ``(a - a % W) / W``: the numerator is an exact multiple of W and
    # budget·weight stays far below 2^53, so the double division is exact.
    b_lit = F.lit(budget_tokens).cast("long")
    folded = t.agg(
        F.collect_list(
            F.struct("source", "available_tokens", "weight")
        ).alias("xs0")
    )
    w_total = F.aggregate(
        F.transform(F.col("xs0"), lambda x: x["weight"]),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    folded = folded.select("xs0", w_total.alias("W"))
    enriched = F.transform(
        F.col("xs0"),
        lambda x: F.struct(
            F.when(
                F.col("W") > 0, -((b_lit * x["weight"]) % F.col("W"))
            )
            .otherwise(F.lit(0))
            .alias("negrem"),
            x["source"].alias("source"),
            x["available_tokens"].alias("available_tokens"),
            x["weight"].alias("weight"),
        ),
    )
    sum_base = F.when(
        F.col("W") > 0,
        F.aggregate(
            F.col("xs0"),
            F.lit(0).cast("long"),
            lambda a, x: a
            + (
                (
                    (b_lit * x["weight"])
                    - (b_lit * x["weight"]) % F.col("W")
                )
                / F.col("W")
            ).cast("long"),
        ),
    ).otherwise(F.lit(0))
    folded = folded.select(
        "W",
        F.array_sort(enriched).alias("xs"),
        sum_base.alias("sum_base"),
    )
    alloc = (
        folded.select(
            "W", "sum_base", F.posexplode("xs").alias("pos", "x")
        )
        .select(
            "W",
            "sum_base",
            (F.col("pos") + 1).alias("rr"),
            F.col("x.source").alias("source"),
            F.col("x.available_tokens").alias("available_tokens"),
            F.col("x.weight").alias("weight"),
        )
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
        .withColumn("leftover", F.lit(budget_tokens) - F.col("sum_base"))
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


def apply_token_budget(
    df: DataFrame,
    weights: dict[str, int],
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "budget-v1",
) -> DataFrame:
    """EXECUTE the mixture :func:`plan_token_budget` computes — the bridge
    between planning and materialization: emit one ``(doc_id, source,
    epoch)`` row per kept document-pass, where under-supplied sources
    repeat (multiple epochs) and over-supplied ones subsample, so the
    expected kept-token count per source equals its Hamilton target.

    Mechanics, all integer-exact and hash-deterministic:

    - ``total_rate_ppm = target·10^6 DIV available`` (UNcapped — above
      10^6 means repeats);
    - every document emits epochs ``0 .. total_rate_ppm DIV 10^6 - 1``
      unconditionally (full passes);
    - one final partial epoch keeps a document iff its 32-bit keyed hash of
      ``(seed | epoch | id)`` falls below ``total_rate_ppm mod 10^6``
      (exact integer cross-multiplication against 2^32 — no floats), so
      membership is reproducible across runs/partitionings and each epoch's
      subsample is independent of every other epoch's.

    Scale shape: the plan is a source-count-sized broadcast; the corpus
    side is one explode (bounded by epochs-per-source) + a per-row hash
    filter — no shuffle at all. Downstream, ``epoch`` is the replication
    tag sequence packers/shufflers consume."""
    plan = plan_token_budget(df, weights, budget_tokens, source_col, text_col)
    rates = plan.select(
        F.col("source").alias("__src"),
        F.when(
            F.col("available_tokens") > 0,
            F.expr("target_tokens * 1000000 DIV available_tokens"),
        )
        .otherwise(F.lit(0))
        .alias("__rppm"),
    )
    # explode epochs on the SOURCE-COUNT-sized rates table (still broadcast
    # small: sources × epochs rows), not on corpus rows — the corpus side
    # stays a plain broadcast join + per-row filter, zero shuffle
    full = F.expr("__rppm DIV 1000000")
    partial = F.expr("__rppm % 1000000")
    rates_e = rates.withColumn("epoch", F.explode(F.sequence(F.lit(0), full)))
    joined = df.select(
        F.col(id_col), F.col(source_col).alias("__doc_src")
    ).join(F.broadcast(rates_e), F.col("__doc_src") == F.col("__src"))
    hash_int = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.lit(seed), F.col("epoch").cast("string"),
                    F.col(id_col).cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return joined.filter(
        (F.col("epoch") < full)
        | (hash_int * F.lit(1_000_000) < partial * F.lit(4_294_967_296))
    ).select(
        F.col(id_col),
        F.col("__doc_src").alias(source_col),
        F.col("epoch").cast("int").alias("epoch"),
    )


def apply_token_budget_oracle_sql(
    weights: dict[str, int],
    budget_tokens: int,
    table: str = "documents",
    source_col: str = "source",
    text_col: str = "text",
    id_expr: str = "doc_id",
    seed: str = "budget-v1",
) -> str:
    """DuckDB mirror: the plan oracle as a CTE, then the same uncapped-rate
    explode + keyed-hash partial-epoch filter (md5 hex prefixes are
    identical across engines; the comparison is exact integer
    cross-multiplication). The epoch unnest runs over the source-count-sized
    rates table BEFORE the corpus join — both the better plan and a
    workaround for a DuckDB 1.0 binder bug with unnest-after-join."""
    plan = plan_token_budget_oracle_sql(
        weights, budget_tokens, table, source_col, text_col
    )
    return f"""
    WITH plan AS ({plan}),
    rates AS (
      SELECT source,
             CASE WHEN available_tokens > 0
                  THEN target_tokens * 1000000 // available_tokens
                  ELSE 0 END AS rppm
      FROM plan),
    re AS (
      SELECT source, rppm,
             unnest(range(0, (rppm // 1000000) + 1)) AS epoch
      FROM rates)
    SELECT d.{id_expr} AS doc_id, d.{source_col} AS source,
           re.epoch::INT AS epoch
    FROM {table} d JOIN re ON d.{source_col} = re.source
    WHERE re.epoch < re.rppm // 1000000
       OR ('0x' || substr(md5('{seed}|' || re.epoch || '|' || d.{id_expr}),
             1, 8))::BIGINT * 1000000 < (re.rppm % 1000000) * 4294967296
    """
