"""DSIR-shaped data selection: hashed n-gram importance weighting.

Data Selection via Importance Resampling (Xie et al., 2023 — public paper)
scores every raw document by how target-like its hashed n-gram features
are, then keeps the highest-weight documents. This is the
"select pretraining data that looks like the eval/target domain" step of a
large-scale pipeline, and it is all relational: a feature explode, two
bucket-count aggregations (bounded at ``n_buckets`` rows — broadcastable),
one broadcast join back, one per-doc aggregation.

Engine-portable numerics (the package's standard trick — see
``operators/lm.py`` and the rational idf in ``text.rarity_topk_terms``):
DSIR's per-feature ``log(p_target/p_raw)`` sum is replaced by the exact
integer mean of smoothed bucket ratios in parts-per-billion::

    ratio_ppb(b)   = ((t_b + 1) * 10^9) DIV (r_b + 1)
    importance_ppb = sum(ratio_ppb over doc feature occurrences) DIV n

The global normalizer ``(R_tot + B)/(T_tot + B)`` is a constant across
documents, so it cancels in every rank/top-k/threshold use and is omitted
from the per-doc integer (documented, not lost: selection semantics are
identical). Integer sums are order-independent → bit-oracle-able.

Feature hashing uses the same md5 pattern as the CMS sketch (first 48 bits
of ``md5("w1 w2")`` mod ``n_buckets``) — identical in the SQL mirror.

At 100 TB: the two bucket tables are ``n_buckets`` rows regardless of
corpus size; scoring is one broadcast hash join + map-side aggregation, so
the only data-sized shuffles are the feature explode's groupBys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lm import PPB, _doc_bigrams


def _bucket(w1: Column, w2: Column, n_buckets: int) -> Column:
    """First 48 bits of md5("w1 w2") mod n_buckets — portable to SQL."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws(" ", w1, w2)), 1, 12), 16, 10
        ).cast("long")
        % n_buckets
    )


def dsir_importance(
    df: DataFrame,
    target_filter: Column,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int | None = None,
) -> DataFrame:
    """Importance weights for every document of ``df`` w.r.t. the target
    distribution defined by ``target_filter`` (a boolean Column over ``df``'s
    rows — e.g. ``F.col("lang") == "en"`` or a curated-source predicate).

    Returns ``(doc_id, is_target, n_features, importance_ppb[, selected])``:
    the exact integer mean of smoothed target/raw bucket ratios over the
    document's hashed-bigram occurrences (NULL for sub-2-token docs). With
    ``top_k``, ``selected`` marks the k highest-importance NON-target docs
    (ties broken by doc_id asc) — the resampling manifest.
    """
    flags = df.select(
        F.col(id_col).alias("doc_id"), target_filter.alias("is_target")
    )
    # the target flag rides through the explode — no join against the doc
    # table on the data-sized side
    feats = _doc_bigrams(
        df.withColumn("__tgt", target_filter), text_col, id_col, extra=["__tgt"]
    ).select(
        "doc_id",
        F.col("__tgt").alias("is_target"),
        _bucket(F.col("w1"), F.col("w2"), n_buckets).alias("b"),
    )
    # feats feeds the bucket-ratio aggregate AND the broadcast-join score
    # pass with no shared exchange, so the bigram explode runs twice — but
    # a lazy localCheckpoint of feats benched 1.57 → 2.07 s (r16): the
    # materialized intermediate is corpus-bigram-sized, and writing it
    # costs more than re-running the (parallel, CPU-cheap) explode. The
    # checkpoint move only pays when the materialized table is SMALL
    # relative to its recompute (see apply_rca's grain table).
    # raw and target bucket counts in ONE pass (conditional count) — the
    # only data-sized shuffle on this side; output is ≤ n_buckets rows
    ratios = (
        feats.groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("r_b"),
            F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("t_b"),
        )
        .select(
            "b",
            F.expr(f"(coalesce(t_b, 0) + 1) * {PPB} DIV (r_b + 1)").alias(
                "ratio_ppb"
            ),
        )
    )

    scored = (
        feats.join(F.broadcast(ratios), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum("ratio_ppb").alias("s"),
        )
    )
    out = flags.join(scored, "doc_id", "left").select(
        "doc_id",
        "is_target",
        F.coalesce(F.col("n_features"), F.lit(0)).alias("n_features"),
        F.when(F.col("n_features") > 0, F.expr("s DIV n_features")).alias(
            "importance_ppb"
        ),
    )
    if top_k is not None:
        # membership in the TakeOrdered top-k (per-partition top-k + driver
        # merge of k rows), NOT a global rank window — no single-task sort
        # of the candidate set at any corpus size
        kth = (
            out.where(~F.col("is_target"))
            .orderBy(
                F.col("importance_ppb").desc_nulls_last(), F.col("doc_id").asc()
            )
            .limit(top_k)
            .select("doc_id", F.lit(True).alias("selected"))
        )
        out = out.join(F.broadcast(kth), "doc_id", "left").select(
            "doc_id",
            "is_target",
            "n_features",
            "importance_ppb",
            F.coalesce(F.col("selected"), F.lit(False)).alias("selected"),
        )
    return out


def dsir_importance_oracle_sql(
    target_pred: str,
    n_buckets: int = 4096,
    table: str = "documents",
    id_expr: str = "doc_id",
    text_expr: str = "text",
    top_k: int | None = None,
) -> str:
    """DuckDB mirror; ``target_pred`` is the SQL form of the target filter
    (e.g. ``"lang = 'en'"``)."""
    bucket = (
        f"(('0x' || substr(md5(w1 || ' ' || w2), 1, 12))::BIGINT % {n_buckets})"
    )
    sel_cols = ""
    sel_join = ""
    if top_k is not None:
        sel_cols = ", COALESCE(s.selected, FALSE) AS selected"
        sel_join = f"""
    LEFT JOIN (
      SELECT doc_id,
             row_number() OVER (ORDER BY importance_ppb DESC NULLS LAST,
                                doc_id ASC) <= {top_k} AS selected
      FROM scored WHERE NOT is_target) s USING (doc_id)"""
    return f"""
    WITH arr AS (
      SELECT {id_expr} AS doc_id, {target_pred} AS is_target,
             regexp_split_to_array(lower(trim({text_expr})), '\\s+') AS a
      FROM {table}),
    bg AS (
      SELECT doc_id, is_target,
             unnest(a[1:len(a)-1]) AS w1, unnest(a[2:len(a)]) AS w2
      FROM arr),
    feats AS (SELECT doc_id, is_target, {bucket} AS b FROM bg),
    raw AS (SELECT b, count(*) AS r_b FROM feats GROUP BY 1),
    tgt AS (SELECT b, count(*) AS t_b FROM feats WHERE is_target GROUP BY 1),
    ratios AS (
      SELECT raw.b,
             (COALESCE(t.t_b, 0) + 1) * {PPB} // (raw.r_b + 1) AS ratio_ppb
      FROM raw LEFT JOIN tgt t USING (b)),
    agg AS (
      SELECT doc_id, count(*) AS n_features,
             sum(ratio_ppb) AS s
      FROM feats JOIN ratios USING (b) GROUP BY 1),
    scored AS (
      SELECT d.doc_id, d.is_target,
             CAST(COALESCE(a.n_features, 0) AS BIGINT) AS n_features,
             CASE WHEN a.n_features > 0
                  THEN CAST(a.s // a.n_features AS BIGINT) END AS importance_ppb
      FROM (SELECT {id_expr} AS doc_id, {target_pred} AS is_target
            FROM {table}) d
      LEFT JOIN agg a USING (doc_id))
    SELECT scored.doc_id, scored.is_target, scored.n_features,
           scored.importance_ppb{sel_cols}
    FROM scored{sel_join}
    """
