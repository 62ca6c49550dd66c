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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    probes = spark.createDataFrame([(t,) for t in probe_texts], ["text"])
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
