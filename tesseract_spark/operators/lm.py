"""Count-based bigram language-model scoring for corpus quality filtering.

The classic web-corpus pipeline step (CCNet and successors) scores every
document under a language model and drops the high-perplexity tail. The
reference engine has no LM surface (this is a training-data-pipeline
extension, like the dedup/sampling families); the pipeline-relevant part is
all relational: train = two token-keyed aggregations over the corpus,
score = two hash joins + one per-doc aggregation — shapes Spark executes
shuffle-minimally at any size.

Engine-portable numerics: the usual per-token ``log p`` sum is a libm call
whose last ulp differs between the JVM and DuckDB (same reason
``rarity_topk_terms`` uses a rational idf), and double addition is
order-sensitive across partitionings. Instead each Laplace-smoothed token
likelihood is a SCALED INTEGER::

    lik_ppb(w1 w2) = ((c(w1,w2) + 1) * 10^9) DIV (c(w1·) + V)

and a document's score is the exact integer mean ``sum(lik_ppb) DIV n``.
Integer sums are order-independent and identical on every engine, so the
operator is bit-oracle-able; the score is a monotone analog of mean token
probability (HIGH = fluent under the corpus model, LOW = anomalous), which
is all a quality gate consumes.

At 100 TB: the count tables are vocabulary-sized (Zipf — far below corpus
size), so the scoring joins broadcast in practice; training on a fixed
sample instead of the full corpus is the standard variant and is just a
``df.sample`` on the ``train_df`` argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _TOKEN_SPLIT

#: likelihood scale: parts-per-billion keeps smoothed probabilities nonzero
#: up to vocabularies of ~10^9 types while ``(c+1)·10^9`` stays far inside
#: int64 for any realistic bigram count
PPB = 1_000_000_000


def _doc_bigrams(
    df: DataFrame, text_col: str, id_col: str, extra: list = ()
) -> DataFrame:
    """(doc_id, w1, w2[, extra...]) rows — adjacent lowercase whitespace
    tokens, in document order, via array slicing (no positional window
    needed). ``extra`` names columns of ``df`` that ride through the
    explode (e.g. a target flag), avoiding a re-join against the doc
    table."""
    arr = F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT)
    n1 = F.greatest(F.size(arr) - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(arr, F.lit(1), n1).alias("w1"),
        F.slice(arr, F.lit(2), n1).alias("w2"),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in extra],
        F.explode(pairs).alias("p"),
    ).select(
        "doc_id",
        *extra,
        F.col("p.w1").alias("w1"),
        F.col("p.w2").alias("w2"),
    )


def bigram_lm_score(
    df: DataFrame,
    train_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document under a Laplace-smoothed bigram model trained on
    ``train_df`` (default: the corpus itself — the in-domain fluency model).

    Returns ``(doc_id, n_bigrams, avg_lik_ppb)``: the exact integer mean of
    per-bigram likelihoods in parts-per-billion. Documents with fewer than
    two tokens score NULL (no bigrams). Unseen bigrams/prefixes get the
    smoothed floor ``10^9 DIV (c1 + V)`` (prefix count 0 for unseen w1), so
    out-of-domain text scores low rather than erroring.
    """
    if train_df is None:
        train_df = df
    bg_train = _doc_bigrams(train_df, text_col, id_col)
    # c2 feeds both the prefix-count reaggregation and the likelihood join;
    # left LAZY on purpose — both consumers sit directly above c2's own
    # (w1, w2) exchange, which AQE's runtime exchange reuse computes once,
    # so a localCheckpoint here only adds a job barrier (measured: 1.49 →
    # 2.11 s with the checkpoint; r16)
    c2 = bg_train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    # prefix counts derived from the bigram table (occurrences of w1 as a
    # bigram head) — vocabulary-sized reaggregation, no second corpus pass
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    toks = train_df.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT)
        ).alias("t")
    )
    v = toks.agg(F.count_distinct(F.col("t")).alias("v"))

    bg = _doc_bigrams(df, text_col, id_col)
    lik = (
        bg.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            (
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1)) * F.lit(PPB)
            ).cast("long")
            .alias("num"),
            (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).alias("den"),
        )
        .select("doc_id", F.expr("num DIV den").alias("ppb"))
    )
    agg = lik.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("ppb").alias("s")
    )
    docs = df.select(F.col(id_col).alias("doc_id"))
    return docs.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.when(
            F.col("n_bigrams") > 0, F.expr("s DIV n_bigrams")
        ).alias("avg_lik_ppb"),
    )


def bigram_lm_oracle_sql(
    table: str = "documents", id_expr: str = "doc_id", text_expr: str = "text"
) -> str:
    """DuckDB mirror: identical tokenization, counts, and integer math.
    DuckDB's parallel ``unnest`` of the two equal-length slices zips them
    positionally (the engines' slice semantics agree: 1-based inclusive in
    DuckDB ≡ ``slice(arr, start, length)`` in Spark)."""
    return f"""
    WITH arr AS (
      SELECT {id_expr} AS doc_id,
             regexp_split_to_array(lower(trim({text_expr})), '\\s+') AS a
      FROM {table}),
    bg AS (
      SELECT doc_id, unnest(a[1:len(a)-1]) AS w1, unnest(a[2:len(a)]) AS w2
      FROM arr),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
    v AS (
      SELECT count(DISTINCT t) AS v FROM (SELECT unnest(a) AS t FROM arr)),
    lik AS (
      SELECT bg.doc_id,
             ((COALESCE(c2.c2, 0) + 1) * {PPB})
               // (COALESCE(c1.c1, 0) + v.v) AS ppb
      FROM bg
      LEFT JOIN c2 USING (w1, w2)
      LEFT JOIN c1 USING (w1)
      CROSS JOIN v),
    agg AS (
      SELECT doc_id, count(*) AS n_bigrams, sum(ppb) AS s
      FROM lik GROUP BY 1)
    SELECT d.doc_id,
           CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CASE WHEN a.n_bigrams > 0
                THEN CAST(a.s // a.n_bigrams AS BIGINT) END AS avg_lik_ppb
    FROM (SELECT {id_expr} AS doc_id FROM {table}) d
    LEFT JOIN agg a USING (doc_id)
    """
