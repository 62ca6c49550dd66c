"""Trained hashed-token quality classifier — the discriminative filtering tier.

Production corpus pipelines stack three model-based filters: a generative
fluency gate (``lm.bigram_lm_score``), importance weighting against a target
distribution (``dsir.dsir_importance``), and a DISCRIMINATIVE classifier
trained on labeled seed sets — the fastText "quality classifier" of GPT-3 /
LLaMA / CCNet lineage (positive = curated reference pages, negative =
random crawl; keep documents the classifier scores positive-ish). The
reference engine has no ML surface at all (this extends the
training-data-pipeline family, like dedup/sampling); the pipeline-relevant
insight is that a bag-of-hashed-tokens linear classifier is entirely
relational:

    train = one explode + one token-keyed aggregation  (model table)
    score = one explode + one broadcast join + one per-doc aggregation

Engine-portable numerics: fastText's ``sum of log P(c|w)`` is a libm call
whose last ulp differs between the JVM and DuckDB, so — as with the bigram
LM's ppb likelihoods and BM25's rational idf — each token's class evidence
is a SCALED INTEGER. A hashed token bucket ``b`` with ``c_pos`` positive and
``c_tot`` total seed occurrences gets a Laplace-smoothed purity::

    purity_ppm(b) = ((c_pos + alpha) * 10^6) DIV (c_tot + 2*alpha)

(≈ P(positive | token) in parts-per-million; 500_000 = uninformative) and a
document scores the exact integer mean over its token occurrences::

    score_ppm(doc) = sum(purity_ppm) DIV n_tokens

with unseen buckets contributing the 500_000 prior. Integer sums are
order-independent, so the whole train→score round-trip is bit-oracle-able
in DuckDB. The score is a monotone analog of the classifier's mean
posterior — exactly what a keep/drop gate consumes (averaging per-token
posteriors instead of summing log-odds trades likelihood calibration for
cross-engine exactness; the RANKING of clearly-positive vs clearly-negative
documents is preserved, which is all the gate uses).

Feature hashing (Weinberger et al.) bounds the model at ``n_buckets`` rows
no matter the corpus: at 100 TB the model table is a few thousand rows —
always broadcastable — train is one map-side-combinable shuffle on a
uniform md5-derived key, and score shuffles only on doc_id. Nothing scales
super-linearly and no collect touches the driver (the model stays a
DataFrame; broadcast is planner-side).

Reference scope note: cited reference files (tesseract-server handlers,
tesseract-core) define the OLAP surface only; this module is part of the
documented pipeline extension, with the same oracle evidence standard as
the rest of the catalog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import _TOKEN_SPLIT

#: purity scale — parts-per-million keeps ``(c+alpha)·10^6`` far inside
#: int64 for any realistic token count while resolving 1e-6 purity steps
PPM = 1_000_000

#: score of a token bucket never seen in the seed set: exactly the
#: uninformative Laplace point ``(0+1)·10^6 DIV (0+2)``
PRIOR_PPM = PPM // 2


def _token_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    extra: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id[, extra...], bucket) — one row per token OCCURRENCE.

    Same tokenizer as the rest of the text stack (lowercase, ``\\s+`` split)
    and the same md5 bucket hash as ``similarity.feature_hash_embed``, so
    the DuckDB mirror is bit-equal beyond ASCII (covered by the unicode
    parity fuzz for that op)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in extra],
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT)
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    h8 = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    return toks.withColumn("bucket", (h8 % n_buckets).cast("int")).drop("tok")


def train_token_classifier(
    seed_df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: int = 1,
) -> DataFrame:
    """Train on labeled seed documents (``label_col`` ∈ {0, 1}); returns the
    model table ``(bucket, c_pos, c_tot, purity_ppm)`` — ≤ ``n_buckets``
    rows, independent of seed-corpus size.

    One explode + one groupBy on the md5-uniform bucket key: map-side
    combinable, no skew (hot NATURAL tokens — stopwords — spread across
    occurrences, and partial aggregation collapses them before the
    shuffle)."""
    t = _token_buckets(seed_df, text_col, id_col, n_buckets, extra=(label_col,))
    counts = t.groupBy("bucket").agg(
        F.sum(F.col(label_col).cast("long")).alias("c_pos"),
        F.count(F.lit(1)).alias("c_tot"),
    )
    return counts.select(
        "bucket",
        "c_pos",
        "c_tot",
        F.expr(
            f"((c_pos + {alpha}) * {PPM}) DIV (c_tot + {2 * alpha})"
        ).alias("purity_ppm"),
    )


def score_token_classifier(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    threshold_ppm: int = PRIOR_PPM,
) -> DataFrame:
    """Score documents under a trained model: ``(doc_id, n_tokens,
    score_ppm, keep)`` with ``score_ppm`` the exact integer mean token
    purity and ``keep = score_ppm >= threshold_ppm``.

    ``n_buckets`` must match training (it defines the hash space).
    Documents with no tokens (empty/whitespace-only text) score NULL with
    ``n_tokens = 0`` and ``keep = false`` — a gate should not pass content
    it cannot see. The model join broadcasts (model ≤ ``n_buckets`` rows);
    the only real shuffle is the per-doc re-aggregation on doc_id."""
    t = _token_buckets(df, text_col, id_col, n_buckets)
    scored = t.join(
        F.broadcast(model.select("bucket", "purity_ppm")), "bucket", "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("purity_ppm"), F.lit(PRIOR_PPM)).alias("p"),
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"), F.sum("p").alias("s")
    )
    docs = df.select(F.col(id_col).alias("doc_id"))
    return (
        docs.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.when(F.col("n_tokens") > 0, F.expr("s DIV n_tokens")).alias(
                "score_ppm"
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            "score_ppm",
            (
                F.col("score_ppm").isNotNull()
                & (F.col("score_ppm") >= threshold_ppm)
            ).alias("keep"),
        )
    )


def classifier_quality_gate(
    df: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: int = 1,
    threshold_ppm: int = PRIOR_PPM,
) -> DataFrame:
    """Self-training composition: derive seed labels from ``label`` (a
    boolean/0-1 Column over ``df`` — e.g. a curated-source flag), train,
    then score the SAME corpus. The standard bootstrap when no external
    seed corpus is wired in; with one, call train/score directly."""
    seeds = df.withColumn("__label", label.cast("int"))
    model = train_token_classifier(
        seeds, "__label", text_col, id_col, n_buckets, alpha
    )
    return score_token_classifier(
        df, model, text_col, id_col, n_buckets, threshold_ppm
    )


def classifier_gate_oracle_sql(
    label_sql: str,
    table: str = "documents",
    id_expr: str = "doc_id",
    text_expr: str = "text",
    n_buckets: int = 4096,
    alpha: int = 1,
    threshold_ppm: int = PRIOR_PPM,
) -> str:
    """Bit-equal DuckDB mirror of :func:`classifier_quality_gate`:
    identical tokenizer, identical md5 bucket hash, identical integer
    Laplace purity and floor-division mean. ``label_sql`` is the seed-label
    SQL expression (must evaluate to 0/1)."""
    return f"""
    WITH toks AS (
      SELECT {id_expr} AS doc_id,
             CAST(({label_sql}) AS BIGINT) AS lab,
             (('0x' || substr(md5(tok), 1, 8))::BIGINT % {n_buckets})::INT AS bucket
      FROM (
        SELECT *,
               unnest(regexp_split_to_array(lower(trim({text_expr})), '\\s+')) AS tok
        FROM {table})
      WHERE tok != ''),
    model AS (
      SELECT bucket,
             ((sum(lab) + {alpha}) * {PPM}) // (count(*) + {2 * alpha}) AS purity_ppm
      FROM toks GROUP BY bucket),
    scored AS (
      SELECT t.doc_id,
             COALESCE(m.purity_ppm, {PRIOR_PPM}) AS p
      FROM toks t LEFT JOIN model m ON t.bucket = m.bucket),
    agg AS (
      SELECT doc_id, count(*) AS n_tokens, sum(p) AS s
      FROM scored GROUP BY doc_id)
    SELECT d.{id_expr} AS doc_id,
           COALESCE(a.n_tokens, 0) AS n_tokens,
           CAST(CASE WHEN a.n_tokens > 0 THEN a.s // a.n_tokens END
                AS BIGINT) AS score_ppm,
           COALESCE(a.n_tokens > 0 AND (a.s // a.n_tokens) >= {threshold_ppm},
                    FALSE) AS keep
    FROM {table} d LEFT JOIN agg a ON a.doc_id = d.{id_expr}
    """


def merge_token_classifiers(
    models: list[DataFrame], alpha: int = 1
) -> DataFrame:
    """Merge independently-trained model tables into the model of the
    union corpus — EXACTLY (not approximately): the model is raw counts
    plus a purity derived from them, and counts are mergeable by
    summation, so ``merge(train(A), train(B)) == train(A ∪ B)`` bit-for-
    bit (property-tested). This is what makes the classifier incremental
    at 100 TB: train per batch/partition/day, keep the tiny model tables,
    merge on demand — the corpus is never re-scanned. ``alpha`` must match
    the constituents' training."""
    assert models, "merge_token_classifiers: no models"
    merged = models[0]
    for m in models[1:]:
        merged = merged.unionByName(m)
    counts = merged.groupBy("bucket").agg(
        F.sum("c_pos").alias("c_pos"), F.sum("c_tot").alias("c_tot")
    )
    return counts.select(
        "bucket",
        "c_pos",
        "c_tot",
        F.expr(
            f"((c_pos + {alpha}) * {PPM}) DIV (c_tot + {2 * alpha})"
        ).alias("purity_ppm"),
    )


def calibrate_threshold(
    scored: DataFrame, keep_rate: float, score_col: str = "score_ppm"
) -> int:
    """The integer threshold that keeps (approximately, to score-tie
    granularity) the top ``keep_rate`` fraction of scored documents:
    the exact (1 − keep_rate) quantile of the score distribution, via the
    distributed rank fold (``operators.quantiles`` — no value buffering),
    ceiled to the next integer so ``score >= threshold`` keeps AT MOST
    the requested mass plus ties. Null scores (empty docs) are excluded —
    they can never be kept anyway. The standard way to turn "keep the
    best 30% by classifier" into a gate parameter."""
    assert 0.0 < keep_rate < 1.0
    import math

    from .quantiles import exact_quantiles

    q = exact_quantiles(
        scored.where(F.col(score_col).isNotNull()).withColumn(
            "__g", F.lit(0)
        ),
        ["__g"],
        score_col,
        [1.0 - keep_rate],
        out_names=["q"],
    )
    row = q.collect()
    if not row:
        return PRIOR_PPM
    return int(math.ceil(row[0]["q"]))
