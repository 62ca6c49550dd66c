"""Sequence packing: greedy token-budget bin packing for pretraining batches.

The classic training-data op the reference lacks entirely (its surface stops at
aggregation — SURVEY.md §2): documents are concatenated into fixed-capacity
token bins ("sequences") so no batch slot is wasted. Semantics here are the
standard *deterministic shard-sequential greedy* packing used by large-corpus
loaders:

1. every doc gets a stable shard (hash bucket of its id — same md5-hex trick
   as :mod:`.sampling`, so the assignment is partitioning-independent and has
   an exact SQL mirror);
2. within a shard, docs are walked in id order and greedily appended to the
   current bin; when the bin would overflow ``capacity`` a new bin opens
   (an over-long doc gets a bin of its own — loaders then truncate).

Scale shape: token counts are computed JVM-side *before* the shuffle, so only
``(doc_id, shard, n_tokens)`` moves — the text never shuffles. The greedy walk
is inherently sequential *per shard* (that is its definition), so shards are
the parallelism unit: one ``applyInPandas`` group each, state = two scalars.
At 100 TB you size ``n_shards`` to a few× the executor-core count; skew is
impossible by construction (shards are uniform hash buckets).

The DuckDB oracle replays the same walk with a recursive CTE stepping
``rn → rn+1`` per shard — bit-exact, since everything is integer.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import token_count_col

#: seed namespacing the shard hash (change to re-deal shards)
PACK_SEED = "pack-v1"


def shard_col(id_col: Column, n_shards: int, seed: str = PACK_SEED) -> Column:
    """Stable shard in [0, n_shards): first 4 md5-hex chars (16 uniform bits)
    of the seeded id, mod n_shards."""
    h = F.substring(F.md5(F.concat_ws("|", F.lit(seed), id_col.cast("string"))), 1, 4)
    return (F.conv(h, 16, 10).cast("long") % n_shards).alias("shard")


def _shard_sql(id_expr: str, n_shards: int, seed: str = PACK_SEED) -> str:
    h = f"substr(md5('{seed}|' || {id_expr}), 1, 4)"
    return f"(('0x' || {h})::BIGINT % {n_shards})"


_PACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shard", T.LongType()),
        T.StructField("bin_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
    ]
)


def pack_sequences(
    df: DataFrame,
    capacity: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Assign every document to (shard, bin_id) under the greedy walk above.

    Returns ``(doc_id, shard, bin_id, n_tokens)`` — n_tokens is the
    whitespace token count (:func:`.text.token_count_col`), or the
    precomputed ``n_tokens_col`` when given (e.g. ``bpe.bpe_tokenize``'s
    ``n_bpe_tokens`` — packing under the REAL tokenizer's lengths). bin_id
    is 1-based per shard.
    """
    tok = (
        F.col(n_tokens_col)
        if n_tokens_col is not None
        else token_count_col(F.col(text_col))
    )
    slim = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        shard_col(F.col(id_col), n_shards),
        tok.cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", ignore_index=True)
        bins = []
        bin_id, fill = 0, capacity + 1  # force-open on first doc
        for tok in pdf["n_tokens"]:
            if fill + tok > capacity:
                bin_id += 1
                fill = tok
            else:
                fill += tok
            bins.append(bin_id)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf[["doc_id", "shard", "bin_id", "n_tokens"]]

    return slim.groupBy("shard").applyInPandas(pack, schema=_PACK_SCHEMA)


def pack_sequences_oracle_sql(
    table: str = "documents",
    capacity: int = 256,
    n_shards: int = 8,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    seed: str = PACK_SEED,
) -> str:
    """Recursive-CTE replay of the greedy walk (rn → rn+1 within shard)."""
    tok = (
        f"CASE WHEN length(trim({text_expr})) = 0 THEN 0 "
        f"ELSE len(regexp_split_to_array(trim({text_expr}), '\\s+')) END"
    )
    return f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, shard, n_tokens,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      FROM (SELECT {id_expr} AS doc_id,
                   {_shard_sql(id_expr, n_shards, seed)} AS shard,
                   CAST({tok} AS BIGINT) AS n_tokens
            FROM {table})),
    packed AS (
      SELECT doc_id, shard, n_tokens, rn,
             CAST(1 AS BIGINT) AS bin_id, n_tokens AS fill
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.doc_id, t.shard, t.n_tokens, t.rn,
             CASE WHEN p.fill + t.n_tokens > {capacity}
                  THEN p.bin_id + 1 ELSE p.bin_id END,
             CASE WHEN p.fill + t.n_tokens > {capacity}
                  THEN t.n_tokens ELSE p.fill + t.n_tokens END
      FROM toks t JOIN packed p ON t.shard = p.shard AND t.rn = p.rn + 1)
    SELECT doc_id, shard, bin_id, n_tokens FROM packed
    """


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split every document into fixed-size token windows (the chunking pass
    that feeds :func:`pack_sequences` when docs exceed the context length).

    Emits ``(doc_id, chunk_id, n_tokens, chunk_md5)`` — chunk_id 0-based,
    n_tokens ≤ chunk_tokens, chunk_md5 the md5 of the space-joined window
    (pins every token boundary without shipping text downstream). Pure
    JVM expressions: split → integer chunk count → explode(sequence) →
    slice — a 1→⌈n/c⌉ row expansion with no shuffle at all; empty docs
    yield one empty chunk rather than disappearing.
    """
    c = chunk_tokens
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    out = (
        df.select(F.col(id_col).alias("doc_id"), words.alias("words"))
        .withColumn("n_words", F.size(F.col("words")))
        .withColumn("n_chunks", F.expr(f"greatest((n_words + {c - 1}) div {c}, 1)"))
        .withColumn("chunk_id", F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)))
        .withColumn("chunk", F.slice(F.col("words"), F.col("chunk_id") * c + 1, c))
    )
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size("chunk").cast("long").alias("n_tokens"),
        F.md5(F.array_join(F.col("chunk"), " ")).alias("chunk_md5"),
    )


def chunk_documents_oracle_sql(table: str = "documents", chunk_tokens: int = 128) -> str:
    c = chunk_tokens
    return f"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
      FROM {table}),
    e AS (
      SELECT doc_id, words,
             unnest(range(0, greatest((len(words) + {c - 1}) // {c}, 1))) AS chunk_id
      FROM w)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(len(list_slice(words, chunk_id * {c} + 1, chunk_id * {c} + {c}))
                AS BIGINT) AS n_tokens,
           md5(array_to_string(list_slice(words, chunk_id * {c} + 1,
                                          chunk_id * {c} + {c}), ' ')) AS chunk_md5
    FROM e
    """


def pack_stats(packed: DataFrame, capacity: int = 256) -> DataFrame:
    """Per-shard packing efficiency: bins used and mean fill fraction.

    avg_fill is computed as ``sum(tokens) / (n_bins · capacity)`` — one
    division of exact integers, not an avg of per-bin doubles, so the value
    is bit-stable across engines and partitionings."""
    per_bin = packed.groupBy("shard", "bin_id").agg(F.sum("n_tokens").alias("fill"))
    return per_bin.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("fill").alias("sum_tokens"),
    ).select(
        "shard",
        "n_bins",
        "sum_tokens",
        (F.col("sum_tokens") / (F.col("n_bins") * F.lit(capacity))).alias("avg_fill"),
    )


def pack_stats_oracle_sql(
    table: str = "documents",
    capacity: int = 256,
    n_shards: int = 8,
    seed: str = PACK_SEED,
) -> str:
    packed = pack_sequences_oracle_sql(table, capacity, n_shards, seed=seed)
    return f"""
    WITH packed_out AS ({packed}),
    per_bin AS (
      SELECT shard, bin_id, sum(n_tokens) AS fill
      FROM packed_out GROUP BY 1, 2)
    SELECT shard, count(*) AS n_bins,
           -- integer sums are HUGEINT in DuckDB; cast output columns back
           -- to BIGINT (the driver's value hash is dtype-sensitive), and
           -- make the fill-fraction division an explicit BIGINT/BIGINT
           -- double division so it mirrors Spark's long/long semantics
           CAST(sum(fill) AS BIGINT) AS sum_tokens,
           CAST(sum(fill) AS BIGINT) / (count(*) * {capacity}) AS avg_fill
    FROM per_bin GROUP BY 1
    """


def materialize_sequences(
    df: DataFrame,
    capacity: int = 256,
    n_shards: int = 8,
    sep: str = "<|eos|>",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Build the actual training sequences from the packing assignment:
    per (shard, bin), concatenate member docs in id order with ``sep``
    between them. Emits ``(shard, bin_id, n_docs, n_tokens, seq_md5)`` —
    the md5 pins every byte of the materialized sequence without carrying
    it further.

    This is the one packing stage where text DOES shuffle (it must — the
    sequence is the product); each row's payload is ≤ capacity tokens by
    construction, so the collect_list per (shard, bin) is bounded by the
    bin capacity, never by corpus skew."""
    assign = pack_sequences(df, capacity, n_shards, id_col, text_col)
    joined = assign.join(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")),
        "doc_id",
    )
    per_bin = joined.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "__text"))),
                lambda s: s["__text"],
            ),
            sep,
        ).alias("__seq"),
    )
    return per_bin.select(
        "shard", "bin_id", "n_docs", "n_tokens", F.md5("__seq").alias("seq_md5")
    )


def materialize_sequences_oracle_sql(
    table: str = "documents",
    capacity: int = 256,
    n_shards: int = 8,
    sep: str = "<|eos|>",
    seed: str = PACK_SEED,
) -> str:
    packed = pack_sequences_oracle_sql(table, capacity, n_shards, seed=seed)
    return f"""
    WITH packed_out AS ({packed})
    SELECT p.shard, p.bin_id, count(*) AS n_docs,
           CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens,
           md5(string_agg(d.text, '{sep}' ORDER BY d.doc_id)) AS seq_md5
    FROM packed_out p JOIN {table} d ON d.doc_id = p.doc_id
    GROUP BY 1, 2
    """


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "shard-v1",
) -> DataFrame:
    """Materialize the corpus as partitioned training shards + a manifest.

    Writes ``path/shard=K/*.parquet`` (hash-assigned shards — deterministic,
    partitioning-independent, resumable) via a partitioned parquet sink, then
    returns the MANIFEST read back from the written files: per shard, row
    count, total whitespace-token count, and an md5 over the id-ordered doc
    ids — the artifact a training job consumes to plan epochs and verify
    integrity. Reading the manifest from the SINK (not the input) makes the
    round-trip part of the contract: a lost or duplicated row changes it.

    Scale shape: one hash partition column derivation (no shuffle — the
    partitioned write redistributes by partition value at file granularity),
    one read-back aggregation on the shard files."""
    from .text import token_count_col

    out = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long"),
            F.lit(n_shards),
        ).alias("shard"),
    )
    out.write.mode("overwrite").partitionBy("shard").parquet(path)
    back = out.sparkSession.read.parquet(path)
    return (
        back.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count_col(F.col("text"))).alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.col("doc_id"))),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("ids_md5"),
        )
    )


def training_shards_manifest_oracle_sql(
    table: str = "documents", n_shards: int = 8, seed: str = "shard-v1"
) -> str:
    """Manifest predicted straight from the source table — equality with the
    sink-derived manifest proves the partitioned write lost nothing."""
    from .text import _sql_token_count

    tok = _sql_token_count("text")
    h = f"('0x' || substr(md5('{seed}|' || doc_id), 1, 8))::BIGINT % {n_shards}"
    return f"""
    SELECT {h} AS shard, count(*) AS n_docs,
           CAST(sum({tok}) AS BIGINT) AS n_tokens,
           md5(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)) AS ids_md5
    FROM {table} GROUP BY 1
    """
