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

#: fused-score scale (reciprocal ranks land in [10^6/(rrf_k + k), 10^6/(rrf_k+1)])
PPM = 1_000_000


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
    # tf feeds both the doc-freq aggregate and the scored join; left LAZY
    # on purpose — both consumers sit above tf's own (doc, term) exchange,
    # which AQE's runtime exchange reuse computes once, so a localCheckpoint
    # here only adds a job barrier (measured flat solo and a 1.5 → 2.0 s
    # regression on the hybrid-RRF composition with the checkpoint; r16)
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


def hybrid_rrf_topk(
    docs: DataFrame,
    embs: DataFrame,
    query: str,
    query_vec_id: int,
    k: int = 10,
    k_lex: int = 50,
    k_sem: int = 50,
    rrf_k: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid lexical+semantic retrieval via reciprocal-rank fusion
    (Cormack et al.): fuse the BM25 top-``k_lex`` for ``query`` with the
    exact-cosine top-``k_sem`` neighbors of ``query_vec_id`` by::

        rrf_ppm(doc) = 10^6 DIV (rrf_k + rank_lex)  +  10^6 DIV (rrf_k + rank_sem)

    (missing side contributes 0). RRF consumes only the two RANKINGS —
    integer positions, never the score floats — so fusion is exactly as
    engine-portable as its inputs' orderings (both deterministic:
    score-desc with doc_id tiebreaks), and the fused score is an integer
    sum: bit-oracle-able end to end. Returns ``(doc_id, rank_lex,
    rank_sem, rrf_ppm)`` — top-``k`` by fused score, doc_id tiebreak.

    Scale shape: each leg is its already-scale-audited operator (inverted-
    index-probe BM25; broadcast-query brute cosine — swap in the IVF index
    for the ANN leg at corpus scale, the fusion is rank-only and does not
    care which engine produced the ranking). Everything downstream of the
    two top-k cuts touches ≤ ``k_lex + k_sem`` rows, so the ranking
    windows partition on a literal by design (bounded input, same
    convention as ``vocab_coverage``)."""
    from .similarity import brute_force_topk

    lex = bm25_topk(docs, query, k=k_lex, text_col=text_col, id_col=id_col)
    # window-free lexical rank over the <= k_lex survivors (fold → sorted
    # struct array → posexplode; avoids the unpartitioned-WindowExec warning
    # the package keeps meaningful for real scale bugs — VERDICT r7 #7)
    lex_xs = F.array_sort(
        F.collect_list(
            F.struct((-F.col("score_ppm")).alias("negs"), "doc_id")
        )
    )
    lex_r = (
        lex.agg(lex_xs.alias("xs"))
        .select(F.posexplode("xs").alias("pos", "x"))
        .select(
            F.col("x.doc_id").alias("doc_id"),
            (F.col("pos") + 1).alias("rank_lex"),
        )
    )
    sem_r = brute_force_topk(
        embs, [query_vec_id], k=k_sem, id_col=vec_id_col, vec_col=vec_col
    ).select(F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("rank_sem"))
    fused = lex_r.join(sem_r, "doc_id", "full_outer").select(
        "doc_id",
        "rank_lex",
        "rank_sem",
        (
            F.coalesce(F.expr(f"{PPM} DIV ({rrf_k} + rank_lex)"), F.lit(0))
            + F.coalesce(F.expr(f"{PPM} DIV ({rrf_k} + rank_sem)"), F.lit(0))
        ).alias("rrf_ppm"),
    )
    return fused.orderBy(F.col("rrf_ppm").desc(), F.col("doc_id").asc()).limit(k)


def hybrid_rrf_oracle_sql(
    query: str,
    query_vec_id: int,
    k: int = 10,
    k_lex: int = 50,
    k_sem: int = 50,
    rrf_k: int = 60,
    doc_table: str = "documents",
    emb_table: str = "embeddings",
) -> str:
    """Bit-equal DuckDB mirror of :func:`hybrid_rrf_topk`: the two legs are
    the legs' own proven oracles as subqueries; fusion mirrors the integer
    floor-division sum and tiebreaks exactly."""
    lex_sql = bm25_topk_oracle_sql(query, k=k_lex, table=doc_table)
    from .similarity import brute_force_topk_oracle_sql

    sem_sql = brute_force_topk_oracle_sql([query_vec_id], k=k_sem, table=emb_table)
    return f"""
    WITH lexr AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score_ppm DESC, doc_id ASC) AS rank_lex
      FROM ({lex_sql})),
    semr AS (
      SELECT neighbor_id AS doc_id, rank AS rank_sem FROM ({sem_sql})),
    fused AS (
      SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id, l.rank_lex, s.rank_sem
      FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id)
    SELECT doc_id, rank_lex, rank_sem,
           CAST(COALESCE({PPM} // ({rrf_k} + rank_lex), 0)
              + COALESCE({PPM} // ({rrf_k} + rank_sem), 0) AS BIGINT) AS rrf_ppm
    FROM fused
    ORDER BY rrf_ppm DESC, doc_id ASC LIMIT {k}
    """
