"""BM25 lexical retrieval over the document corpus.

The lexical counterpart of the ANN family (`operators/similarity.py`):
given a free-text query, rank documents by BM25. On a training-data
pipeline this is the workhorse for targeted corpus audits ("show me the
docs about X that survived filtering") and for lexical retrieval baselines
next to embedding search.

Engine-portable scoring, two package-standard tricks combined:

- the idf is the BM25-shaped rational ``(N − df + 0.5) / (df + 0.5)``
  (same as ``text.rarity_topk_terms``) — no ``ln``, so each per-term
  factor is an identical IEEE double on every engine;
- the term-frequency normalization ``tf·(k1+1) / (tf + k1·(1 − b +
  b·dl·N/total))`` is a fixed expression tree of correctly-rounded ops
  (identical parenthesization in the SQL mirror), so the per-term score
  is bit-identical too;
- per-term scores are floored to integer ppm BEFORE the per-document sum
  — double addition is order-sensitive across partitionings, integer
  addition is not, so the document score is exact and oracle-able.

Shape: the token explode is filtered to the query's terms BEFORE any
shuffle (predicate on the exploded term — at scale this is the classic
inverted-index probe, a tiny fraction of the corpus), doc lengths ride a
corpus-wide aggregate that Zipf makes cheap, and the top-k is TakeOrdered
(per-partition k + driver merge), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _TOKEN_SPLIT, token_count_col


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for ``query`` by BM25:
    ``(doc_id, n_matched_terms, score_ppm)``, ordered by score desc with
    doc_id as the deterministic tiebreak. ``score_ppm`` is the exact
    integer sum of floored per-term ppm scores (see module doc)."""
    qterms = sorted(set((query or "").lower().split()))
    if not qterms:
        raise ValueError("bm25_topk: empty query")

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT)
        ).alias("term"),
    ).where(F.col("term").isin(qterms))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    stats = df.agg(
        F.count(F.lit(1)).alias("N"),
        F.sum(token_count_col(F.col(text_col))).alias("total_dl"),
    )
    dl = df.select(
        F.col(id_col).alias("doc_id"),
        token_count_col(F.col(text_col)).alias("dl"),
    )

    # fixed expression tree — the SQL mirror parenthesizes identically
    idf = (F.col("N") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    tfn = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b) * (F.col("dl") * F.col("N")) / F.col("total_dl")
        )
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(idf * tfn * F.lit(1_000_000)).cast("long").alias("ppm"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matched_terms"),
        F.sum("ppm").alias("score_ppm"),
    )
    return agg.orderBy(F.col("score_ppm").desc(), F.col("doc_id").asc()).limit(k)


def bm25_topk_oracle_sql(
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    id_expr: str = "doc_id",
    text_expr: str = "text",
) -> str:
    qterms = sorted(set((query or "").lower().split()))
    terms_sql = ", ".join("'" + t.replace("'", "''") + "'" for t in qterms)
    from .text import _sql_token_count

    tok = _sql_token_count(text_expr)
    return f"""
    WITH toks AS (
      SELECT {id_expr} AS doc_id,
             unnest(regexp_split_to_array(lower(trim({text_expr})), '\\s+')) AS term
      FROM {table}),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN ({terms_sql}) GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    stats AS (
      SELECT count(*) AS N, CAST(sum({tok}) AS BIGINT) AS total_dl
      FROM {table}),
    dl AS (SELECT {id_expr} AS doc_id, {tok} AS dl FROM {table}),
    scored AS (
      SELECT tf.doc_id,
             CAST(floor(
               ((stats.N - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * ((tf.tf * CAST({k1 + 1.0!r} AS DOUBLE)) /
                  (tf.tf + CAST({k1!r} AS DOUBLE) *
                  (CAST({1.0 - b!r} AS DOUBLE) +
                   CAST({b!r} AS DOUBLE) * (dl.dl * stats.N) / stats.total_dl)))
               * 1000000) AS BIGINT) AS ppm
      FROM tf
      JOIN dfreq USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats)
    SELECT doc_id,
           count(*) AS n_matched_terms,
           CAST(sum(ppm) AS BIGINT) AS score_ppm
    FROM scored GROUP BY 1
    ORDER BY score_ppm DESC, doc_id ASC LIMIT {k}
    """
