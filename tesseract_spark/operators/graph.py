"""Graph operators over candidate-pair edge sets.

Beyond connected components (``dedup.resolve_duplicate_clusters``), the other
graph primitive a dedup/curation pipeline wants is a centrality score —
"which document is the hub of this near-duplicate neighborhood" drives
canonical-document selection better than min-id when clusters are star-shaped
(one boilerplate template, many variants).

:func:`pagerank_fixed` is PageRank with a twist that matters for this engine's
correctness bar: ranks are **scaled 64-bit integers** (fixed-point, SCALE =
10¹²) and every per-edge contribution is an integer division ``rank DIV
degree``. Floating-point PageRank sums neighbor contributions in partition
order — unreproducible across engines AND across runs; the fixed-point form
is order-independent (integer addition commutes exactly), so a 3-iteration
run is bit-identical in Spark and DuckDB, across any partitioning. The cost
is ≤ degree·1 scaled-unit truncation error per node per iteration —
irrelevant for ranking at SCALE = 10⁹.

Iterations are plain self-joins: ranks ⋈ edges on src → groupBy dst →
damped update. Each iteration is ONE shuffle on the join key plus the
groupBy; at 100 TB this is the standard Pregel-on-DataFrames shape (and the
edge table, not the corpus, bounds the work).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale: 1.0 rank unit == 10⁹. Headroom bound: the damped-sum
#: intermediate is ≤ DAMP_NUM · (total mass) = 85 · N · SCALE, which must
#: stay under 2⁶³ — SCALE 10⁹ is safe to N ≈ 10⁸ nodes even if one hub
#: absorbs the whole graph's mass (star-shaped boilerplate clusters do this)
SCALE = 10**9
#: damping factor α = DAMP_NUM/DAMP_DEN (0.85)
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank_fixed(pairs: DataFrame, iters: int = 3) -> DataFrame:
    """Fixed-point PageRank over an undirected pair list ``(id_a, id_b)``.

    Returns ``(doc_id, pr_scaled)`` — scaled-integer rank after ``iters``
    synchronous iterations from a uniform start, nodes = every id appearing
    in a pair. Update rule (all integer ops, / is DIV)::

        contrib(u→v) = r(u) DIV deg(u)
        r'(v) = (SCALE DIV N) * (DEN−NUM) DIV DEN + NUM * Σ contrib DIV DEN
    """
    # both directions of every pair from ONE evaluation of the (possibly
    # expensive) pair pipeline: the previous two-leg union re-embedded the
    # upstream plan (e.g. the whole MinHash-LSH candidate generation) once
    # PER LEG, so the eager checkpoint below ran it twice (r16, guide §2.4)
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
                F.struct(F.col("id_b").alias("src"), F.col("id_a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # materialize the edge derivation ONCE and truncate lineage — without
    # this every iteration's plan re-embeds the upstream pipeline, and the
    # deg.count() action would run it an extra time on top. The standard
    # iterative-DataFrame hygiene: checkpoint the loop invariants, and the
    # per-iteration state, so plan depth stays constant in `iters`. deg is
    # derived FROM the checkpoint (never from the raw pipeline) and is
    # checkpointed itself so each iteration's broadcast join reads a tiny
    # local table instead of re-aggregating the edges. (A window-based
    # deg-on-every-edge-row variant was tried and REVERTED: it added a
    # full shuffle+sort of the edge table before the eager checkpoint and
    # benched 2.3× slower than this shape.)
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=True
    )
    n_nodes = deg.count()  # bounded: one scalar action on the node set
    base = (SCALE // n_nodes) * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    ranks = deg.select(
        F.col("src").alias("doc_id"), F.lit(SCALE // n_nodes).alias("pr_scaled")
    )
    for i in range(iters):
        contrib = (
            edges.join(deg, "src")
            .join(ranks, edges.src == ranks.doc_id)
            .select("dst", F.expr("pr_scaled DIV deg").alias("c"))
        )
        ranks = (
            contrib.groupBy(F.col("dst").alias("doc_id"))
            .agg(F.sum("c").alias("s"))
            .select(
                "doc_id",
                (F.lit(base) + F.expr(f"{DAMP_NUM} * s DIV {DAMP_DEN}")).alias(
                    "pr_scaled"
                ),
            )
        )
        if i < iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def pagerank_fixed_oracle_sql(
    table: str = "documents",
    iters: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 5,
) -> str:
    """Unrolled-iteration mirror over the SAME LSH candidate pairs the Spark
    entry uses (CTE chain from the dedup module)."""
    from .dedup import _lsh_cand_cte_sql

    prelude = f"""WITH {_lsh_cand_cte_sql(table, num_hashes, bands, shingle_n)},
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION ALL SELECT id_b, id_a FROM cand),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
    nn AS (SELECT count(*) AS n FROM deg),
    r0 AS (SELECT src AS doc_id, ({SCALE} // n) AS pr FROM deg CROSS JOIN nn)"""
    steps = []
    base = (
        f"(({SCALE} // n) * ({DAMP_DEN} - {DAMP_NUM}) // {DAMP_DEN})"
    )
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        steps.append(
            f"""r{i} AS (
      SELECT e.dst AS doc_id,
             {base} + {DAMP_NUM} * sum(r.pr // d.deg) // {DAMP_DEN} AS pr
      FROM edges e JOIN deg d ON d.src = e.src
      JOIN {prev} r ON r.doc_id = e.src
      CROSS JOIN nn
      GROUP BY e.dst, n)"""
        )
    return (
        prelude
        + ",\n    "
        + ",\n    ".join(steps)
        # pr is HUGEINT (integer-sum arithmetic); cast the OUTPUT to BIGINT —
        # the driver's value hash is dtype-sensitive and HUGEINT fetches as
        # float64 (the r4 hash-fail cause); values are bounded ≪ 2^63
        + f"\n    SELECT doc_id, CAST(pr AS BIGINT) AS pr_scaled FROM r{iters}"
    )
