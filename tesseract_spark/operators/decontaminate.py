"""Benchmark decontamination: flag corpus documents that share word n-grams
with a probe set (eval benchmarks, test sets, canary strings).

A standard stage in LLM training-data pipelines — before training, every
document overlapping an evaluation benchmark is flagged/dropped so the eval
stays uncontaminated. The mechanics are a membership test of the document's
shingle set against the probes' shingle set:

- probe set is small (benchmarks are KBs–MBs) → its shingles become a
  **broadcast** side; the corpus side is one linear shingle scan + a
  broadcast left-semi join. No shuffle of corpus text at any scale.
- overlap granularity is the same word n-gram shingling the dedup operators
  use (``operators.dedup.word_shingles_col``), so thresholds are comparable.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import local_df

from .dedup import _sql_word_shingles, word_shingles_col


def flag_contaminated(
    df: DataFrame,
    probe_texts: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Per document: the number of distinct probe n-grams it contains and a
    contamination flag (≥1 hit). Documents with zero hits are kept with
    hit count 0 — the caller chooses to drop or quarantine."""
    spark = df.sparkSession
    probes = local_df(spark, [(t,) for t in probe_texts], ["text"])
    probe_sh = probes.select(
        F.explode(word_shingles_col(F.col("text"), n)).alias("shingle")
    ).distinct()

    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles_col(F.col(text_col), n)).alias("shingle"),
    )
    hits = (
        sh.join(F.broadcast(probe_sh), "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        df.select(F.col(id_col).alias("id"), "lang")
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "lang",
            F.coalesce("n_hits", F.lit(0)).alias("n_probe_ngrams"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def _py_word_shingles(text: str, n: int = 5) -> list[str]:
    """Driver-side twin of :func:`word_shingles_col` (same split/lower/distinct
    semantics) for probe sets, which are driver-resident strings anyway."""
    ws = (text or "").lower().split()
    if len(ws) >= n:
        return list(dict.fromkeys(" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)))
    return [" ".join(ws)]


def _bloom_pos(j: int, shingle: str, m_bits: int) -> int:
    """Position of hash j for a shingle: first 48 bits of md5(f"{j}|{shingle}")
    mod m — the exact arithmetic the Spark expressions and the DuckDB oracle
    mirror (md5 hex → int ≡ conv(substr(md5…),16,10) ≡ ('0x'||substr…)::BIGINT)."""
    return int(hashlib.md5(f"{j}|{shingle}".encode()).hexdigest()[:12], 16) % m_bits


def bloom_decontaminate(
    df: DataFrame,
    probe_texts: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Bloom-filter decontamination: probe shingles compressed into an m-bit
    filter (k deterministic md5-derived hashes), corpus shingles membership-
    tested against it. Flags a superset of :func:`flag_contaminated`'s exact
    hits (a Bloom filter has no false negatives); ``n_bf_hits`` counts the
    document's distinct BF-positive shingles, false positives included.

    The 100 TB story vs the exact probe-shingle semi-join: the broadcast side
    is a FIXED-SIZE bit array (m/8 bytes — 8 KiB at the default) independent
    of benchmark size, attached to the scan as one array literal; the corpus
    side is a linear shingle scan with k pure-expression bit tests and ONE
    shuffle (the per-doc count). No join at all on the hot path, so executor
    memory stays flat however many benchmarks are screened. Size m so the
    probe-shingle load factor keeps the FP rate acceptable
    (~(s·k/m)^k per distinct shingle tested); the exact semi-join variant
    remains the zero-FP verification path.

    The bit array is built driver-side from the probe texts (probes are
    driver-resident by contract — benchmarks are KBs–MBs) with the same
    md5 arithmetic the executors use, packed 32 bits per BIGINT word so the
    DuckDB oracle's ``1::BIGINT << (pos % 32)`` packing is bit-identical.
    """
    words = [0] * ((m_bits + 31) // 32)
    for t in probe_texts:
        for sh in _py_word_shingles(t, n):
            for j in range(k):
                pos = _bloom_pos(j, sh, m_bits)
                words[pos // 32] |= 1 << (pos % 32)

    def _hit(j: int) -> str:
        pos = (
            f"(CAST(conv(substring(md5(concat('{j}|', shingle)), 1, 12), 16, 10)"
            f" AS BIGINT) % {m_bits})"
        )
        return (
            f"(element_at(__bloom, CAST({pos} DIV 32 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST({pos} % 32 AS INT))) != 0"
        )

    all_hit = " AND ".join(_hit(j) for j in range(k))
    sh = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles_col(F.col(text_col), n)).alias("shingle"),
        )
        .withColumn("__bloom", F.lit(words).cast("array<bigint>"))
        .where(F.expr(all_hit))
    )
    hits = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        df.select(F.col(id_col).alias("id"), "lang")
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "lang",
            F.coalesce("n_hits", F.lit(0)).alias("n_bf_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("flagged"),
        )
    )


def bloom_decontaminate_oracle_sql(
    probe_texts: list[str] | None = None,
    table: str = "documents",
    n: int = 5,
    m_bits: int = 1 << 16,
    k: int = 4,
    probes_sql: str | None = None,
) -> str:
    """Oracle mirror: the filter is rebuilt IN SQL from the probe set (bit_or
    aggregate over the same md5-derived positions, 32-bit words in BIGINT),
    so the oracle proves the whole pipeline including the packing."""
    if probes_sql is None:
        lits = ", ".join("(" + "'" + t.replace("'", "''") + "')" for t in probe_texts)
        probes_sql = f"VALUES {lits}"
    pos = (
        f"(('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || shingle), 1, 12))"
        f"::BIGINT % {m_bits})"
    )
    return f"""
    WITH probes(text) AS ({probes_sql}),
    probe_sh AS (
      SELECT DISTINCT unnest({_sql_word_shingles("text", n)}) AS shingle
      FROM probes),
    probe_pos AS (
      SELECT {pos} AS pos
      FROM probe_sh, (SELECT unnest(range(0, {k})) AS j)),
    bloom AS (
      SELECT pos // 32 AS w, bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS word
      FROM probe_pos GROUP BY 1),
    doc_sh AS (
      SELECT doc_id AS id, unnest({_sql_word_shingles("text", n)}) AS shingle
      FROM {table}),
    doc_pos AS (
      SELECT id, shingle, {pos} AS pos
      FROM doc_sh, (SELECT unnest(range(0, {k})) AS j)),
    checked AS (
      SELECT id, shingle,
             count(*) FILTER (
               b.word IS NOT NULL
               AND (b.word & (1::BIGINT << CAST(pos % 32 AS INT))) != 0
             ) = {k} AS hit
      FROM doc_pos LEFT JOIN bloom b ON pos // 32 = b.w
      GROUP BY 1, 2),
    hits AS (
      SELECT id, count(*) AS n_hits FROM checked WHERE hit GROUP BY 1)
    SELECT d.doc_id, d.lang,
           coalesce(h.n_hits, 0) AS n_bf_hits,
           coalesce(h.n_hits, 0) > 0 AS flagged
    FROM {table} d LEFT JOIN hits h ON d.doc_id = h.id
    """


def ngram_overlap_fraction(
    df: DataFrame,
    probe_texts: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold_ppm: int = 100_000,
) -> DataFrame:
    """Per-document n-gram OVERLAP FRACTION vs an evaluation benchmark — the
    graded contamination metric published pretraining recipes filter on
    (e.g. "drop documents where ≥X% of n-grams appear in any eval set"),
    complementing the boolean hit flag (:func:`flag_contaminated`) and the
    Bloom tier (:func:`bloom_decontaminate`): those answer "touched at
    all?", this answers "how much of the document IS benchmark text", which
    is what separates a quoted sentence from a wholesale eval-set copy.

    Returns ``(doc_id, n_ngrams, n_overlap, overlap_ppm, flagged)`` where
    ``overlap_ppm`` is the integer parts-per-million share of the document's
    DISTINCT n-grams found in the probe set (exact integer DIV — engine
    portable) and ``flagged = overlap_ppm >= threshold_ppm``.

    Scale shape: one per-row shingle explode, one broadcast LEFT join
    against the probe shingles (eval suites are KB-to-MB — always broadcast
    side), one map-side-combined groupBy on doc id. No corpus-side text ever
    shuffles; executor memory is bounded by the probe set.
    """
    spark = df.sparkSession
    probes = local_df(spark, [(t,) for t in probe_texts], ["text"])
    probe_sh = (
        probes.select(F.explode(word_shingles_col(F.col("text"), n)).alias("shingle"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles_col(F.col(text_col), n)).alias("shingle"),
    )
    per_doc = (
        sh.join(F.broadcast(probe_sh), "shingle", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_overlap"),
        )
    )
    return per_doc.select(
        F.col("id").alias(id_col),
        "n_ngrams",
        "n_overlap",
        F.expr("n_overlap * 1000000 DIV n_ngrams").alias("overlap_ppm"),
        (F.expr("n_overlap * 1000000 DIV n_ngrams") >= F.lit(threshold_ppm)).alias(
            "flagged"
        ),
    )


def ngram_overlap_fraction_oracle_sql(
    probe_texts: list[str] | None = None,
    table: str = "documents",
    n: int = 5,
    threshold_ppm: int = 100_000,
    probes_sql: str | None = None,
) -> str:
    """Oracle mirror of :func:`ngram_overlap_fraction` — same shingling,
    same integer-ppm arithmetic."""
    if probes_sql is None:
        lits = ", ".join("(" + "'" + t.replace("'", "''") + "')" for t in probe_texts)
        probes_sql = f"VALUES {lits}"
    return f"""
    WITH probes(text) AS ({probes_sql}),
    probe_sh AS (
      SELECT DISTINCT unnest({_sql_word_shingles("text", n)}) AS shingle
      FROM probes
    ),
    sh AS (
      SELECT doc_id AS id, unnest({_sql_word_shingles("text", n)}) AS shingle
      FROM {table}
    ),
    per AS (
      SELECT sh.id, count(*) AS n_ngrams,
             CAST(sum(CASE WHEN p.shingle IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_overlap
      FROM sh LEFT JOIN probe_sh p USING (shingle) GROUP BY 1
    )
    SELECT id AS doc_id, n_ngrams, n_overlap,
           n_overlap * 1000000 // n_ngrams AS overlap_ppm,
           (n_overlap * 1000000 // n_ngrams) >= {threshold_ppm} AS flagged
    FROM per
    """


def excise_contaminated_lines(
    df: DataFrame,
    probe_texts: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """SURGICAL decontamination: drop only the LINES that share an n-gram
    with the benchmark, keep the rest of the document — what production
    pipelines do when a page merely quotes an eval item (whole-document
    dropping throws away the other 99%; the graded metric
    :func:`ngram_overlap_fraction` decides WHICH treatment, this one
    applies the lighter one).

    Returns ``(doc_id, n_lines, n_kept, clean_text)`` with ``clean_text``
    the newline-joined surviving lines.

    Scale shape (reworked per ADVICE r7 — the previous version inlined every
    probe shingle as an ``F.array`` of literals, which blows up the Catalyst
    plan at MB-scale eval suites AND pays O(|probe set|) per line inside
    ``arrays_overlap``): the probe shingles become a BROADCAST side
    (hash-probed once per corpus shingle, like the sibling decontamination
    operators), contaminated ``(id, line_no)`` hits are the only rows that
    shuffle (bounded by contamination volume, not corpus size), and each
    document's bad-line set joins back so the line filter stays a per-row
    JVM array expression over the original text — corpus text itself never
    shuffles and never enters a UDF."""
    from .dedup import word_shingles_expr

    spark = df.sparkSession
    probe_shingles = sorted(
        {
            s
            for t in probe_texts
            for s in _py_word_shingles(t, n)
        }
    )
    probes = local_df(spark, [(s,) for s in probe_shingles], "shingle string")
    lines = F.split(F.col(text_col), r"\n")
    exploded = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(lines).alias("__line_no", "__line"),
    ).select(
        "__id",
        "__line_no",
        F.explode(word_shingles_expr(F.col("__line"), n)).alias("shingle"),
    )
    bad = (
        exploded.join(F.broadcast(probes), "shingle", "left_semi")
        .select("__id", "__line_no")
        .distinct()
        .groupBy("__id")
        .agg(F.collect_set("__line_no").alias("__bad"))  # bounded per doc
    )
    joined = df.join(bad, F.col(id_col) == F.col("__id"), "left").drop("__id")
    kept = F.filter(
        lines,
        lambda l, i: F.col("__bad").isNull() | ~F.array_contains(F.col("__bad"), i),
    )
    return joined.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


def excise_contaminated_lines_oracle_sql(
    probe_texts: list[str] | None = None,
    table: str = "documents",
    n: int = 5,
    probes_sql: str | None = None,
) -> str:
    """Mirror: same line split, same shingling per line, same overlap test
    (``list_has_any`` against the probe shingle set)."""
    if probes_sql is None:
        lits = ", ".join("(" + "'" + t.replace("'", "''") + "')" for t in probe_texts)
        probes_sql = f"VALUES {lits}"
    probe_list = (
        f"(SELECT list(DISTINCT s) FROM (SELECT unnest({_sql_word_shingles('text', n)}) AS s "
        f"FROM (SELECT * FROM probes_cte) ))"
    )
    line_sh = _sql_word_shingles("l", n)
    return f"""
    WITH probes_cte(text) AS ({probes_sql}),
    pl AS (SELECT {probe_list} AS probe_shingles)
    SELECT doc_id,
           len(string_split(text, chr(10))) AS n_lines,
           len(list_filter(string_split(text, chr(10)),
               l -> NOT list_has_any({line_sh}, pl.probe_shingles))) AS n_kept,
           COALESCE(array_to_string(
             list_filter(string_split(text, chr(10)),
               l -> NOT list_has_any({line_sh}, pl.probe_shingles)),
             chr(10)), '') AS clean_text
    FROM {table}, pl
    """


def flag_contaminated_oracle_sql(
    probe_texts: list[str] | None = None,
    table: str = "documents",
    n: int = 5,
    probes_sql: str | None = None,
) -> str:
    """Oracle mirror; probes either as literal texts or as a SQL subquery
    (``probes_sql``) selecting a ``text`` column."""
    if probes_sql is None:
        lits = ", ".join("(" + "'" + t.replace("'", "''") + "')" for t in probe_texts)
        probes_sql = f"VALUES {lits}"
    return f"""
    WITH probes(text) AS ({probes_sql}),
    probe_sh AS (
      SELECT DISTINCT unnest({_sql_word_shingles("text", n)}) AS shingle
      FROM probes
    ),
    sh AS (
      SELECT doc_id AS id, unnest({_sql_word_shingles("text", n)}) AS shingle
      FROM {table}
    ),
    hits AS (
      SELECT id, count(*) AS n_hits
      FROM sh JOIN probe_sh USING (shingle) GROUP BY 1
    )
    SELECT d.doc_id, d.lang,
           coalesce(h.n_hits, 0) AS n_probe_ngrams,
           coalesce(h.n_hits, 0) > 0 AS contaminated
    FROM {table} d LEFT JOIN hits h ON d.doc_id = h.id
    """
