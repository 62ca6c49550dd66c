"""Count-Min Sketch: fixed-size frequency estimation over unbounded key
cardinality.

The exact heavy-hitter profile (`profile.key_skew_profile`) shuffles one row
per distinct key; at 100 TB a high-cardinality key column (URLs, user ids)
makes even that aggregate large. The CMS bounds state at d×w counters
REGARDLESS of cardinality, is mergeable across partitions/streams (counter
matrices add), and over-estimates only (never under) — the standard sketch
for streaming heavy-hitter and frequency queries.

Everything is deterministic md5-derived hashing (the engine's portable-hash
convention), so unlike typical sketches the WHOLE pipeline — counter matrix
and estimates — has an exact DuckDB mirror: the oracle rebuilds the sketch
in SQL and must match counter-for-counter.

Scale shape: one explode (×d) over the key scan, one groupBy on (row, col)
with map-side combine collapsing every task's output to ≤ d·w rows — the
shuffle moves at most tasks × d × w counters, independent of data size.
Estimation joins the d·w-row counter table (broadcast) against the queried
keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cms_col(i: int, key: Column, w: int) -> Column:
    """Column index of hash row ``i`` for a key: first 48 bits of
    md5(f"{i}|{key}") mod w — identical in the SQL mirror."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}|"), key)), 1, 12), 16, 10
        ).cast("long")
        % w
    )


def cms_build(
    df: DataFrame, key_col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """The d×w counter matrix as ``(i, j, c)`` rows (absent cells are 0).
    Mergeable: sketches of two datasets add cell-wise. NULL keys are
    excluded — they hash to NULL cells and would also break the top-k key
    tiebreak's engine portability (ADVICE r5)."""
    df = df.where(F.col(key_col).isNotNull())
    key = F.col(key_col).cast("string")
    arr = F.array(
        *[
            F.struct(F.lit(i).alias("i"), _cms_col(i, key, w).alias("j"))
            for i in range(d)
        ]
    )
    ex = df.select(F.explode(arr).alias("s")).select("s.i", "s.j")
    return ex.groupBy("i", "j").agg(F.count(F.lit(1)).alias("c"))


def cms_estimate_heavy_hitters(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 256,
    top_k: int = 10,
) -> DataFrame:
    """Build a CMS over ``key_col`` and compare its estimates against the
    exact counts of the ``top_k`` heaviest keys:
    ``(key, true_n, cms_n, overestimate)``. ``cms_n >= true_n`` always (the
    CMS guarantee); equality on heavy keys means no colliding mass.

    In production the exact-count side doesn't exist (that's the point of
    the sketch); this operator's paired output is the calibration/QA view —
    and what makes the whole construction oracle-checkable. NULL keys are
    excluded (see cms_build)."""
    df = df.where(F.col(key_col).isNotNull())
    key = F.col(key_col).cast("string")
    sketch = cms_build(df, key_col, d, w)

    top = (
        df.groupBy(key.alias("key"))
        .agg(F.count(F.lit(1)).alias("true_n"))
        .orderBy(F.col("true_n").desc(), F.col("key").asc())
        .limit(top_k)
    )
    probes = top.select(
        "key",
        "true_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _cms_col(i, F.col("key"), w).alias("j"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("s"),
    ).select("key", "true_n", "s.i", "s.j")
    est = (
        probes.join(F.broadcast(sketch), ["i", "j"])
        .groupBy("key", "true_n")
        .agg(F.min("c").alias("cms_n"))
    )
    return est.select(
        "key",
        "true_n",
        "cms_n",
        (F.col("cms_n") - F.col("true_n")).alias("overestimate"),
    )


def cms_join_size_estimate(
    df_a: DataFrame,
    key_a: str,
    df_b: DataFrame,
    key_b: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Equi-join cardinality estimation from two CMS sketches: the inner
    product ``sum_j cA(i,j)·cB(i,j)`` over-estimates ``|A ⋈ B|`` for every
    hash row i; the estimate is the min over rows. The join-planning
    primitive for 100 TB: both sides reduce to d×w counters (mergeable,
    computable in one pass each — no shuffle of either table against the
    other), then the estimate is a d×w-sized join. The paired exact size
    (per-key count join — itself never materializing the join) makes the
    output oracle-checkable and doubles as the calibration view."""
    # each side reduces ONCE to its per-key counts (guide §2.3 "shuffle
    # keys instead of payloads"; r16): both the CMS cells and the exact
    # join size are functions of that vocabulary-sized table, so the
    # previous two full scans per side (cell explode + per-key count)
    # collapse to one groupBy. Cell counts are identical: the count of
    # rows hashing to a cell IS the sum of its keys' counts. NULL keys
    # are excluded up front exactly as cms_build does — they never joined
    # in the exact-size branch either (equi-join on key), so both outputs
    # are unchanged. Left LAZY on purpose: both consumers sit above the
    # key-count groupBy's own exchange, which AQE's runtime exchange reuse
    # computes once — a localCheckpoint here benched 2.3 → 4.9 s (the two
    # barriers serialized four independent subtrees).
    def _key_counts(df: DataFrame, key_col: str, alias: str) -> DataFrame:
        return (
            df.where(F.col(key_col).isNotNull())
            .groupBy(F.col(key_col).cast("string").alias("key"))
            .agg(F.count(F.lit(1)).alias(alias))
        )

    def _cells(kc: DataFrame, n_col: str, out: str) -> DataFrame:
        arr = F.array(
            *[
                F.struct(F.lit(i).alias("i"), _cms_col(i, F.col("key"), w).alias("j"))
                for i in range(d)
            ]
        )
        return (
            kc.select(F.col(n_col).alias("__n"), F.explode(arr).alias("s"))
            .select("s.i", "s.j", "__n")
            .groupBy("i", "j")
            .agg(F.sum("__n").alias(out))
        )

    na = _key_counts(df_a, key_a, "na")
    nb = _key_counts(df_b, key_b, "nb")
    ca = _cells(na, "na", "ca")
    cb = _cells(nb, "nb", "cb")
    est = (
        ca.join(cb, ["i", "j"])
        .groupBy("i")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
        .agg(F.min("ip").alias("cms_join_rows"))
    )
    true = na.join(nb, "key").agg(
        F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0)).alias(
            "true_join_rows"
        )
    )
    return true.crossJoin(F.broadcast(est)).select(
        "true_join_rows",
        "cms_join_rows",
        (F.col("cms_join_rows") - F.col("true_join_rows")).alias("overestimate"),
    )


def cms_join_size_oracle_sql(
    table_a: str,
    key_a: str,
    table_b: str,
    key_b: str,
    d: int = 4,
    w: int = 1024,
) -> str:
    def cells(table: str, key: str) -> str:
        h = (
            f"(('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || key), 1, 12))"
            f"::BIGINT % {w})"
        )
        return f"""(
      SELECT i, {h} AS j, count(*) AS c
      FROM (SELECT CAST({key} AS VARCHAR) AS key FROM {table}
            WHERE {key} IS NOT NULL),
           (SELECT unnest(range(0, {d})) AS i)
      GROUP BY 1, 2)"""

    return f"""
    WITH ca AS {cells(table_a, key_a)},
    cb AS {cells(table_b, key_b)},
    est AS (
      SELECT CAST(min(ip) AS BIGINT) AS cms_join_rows FROM (
        SELECT a.i, CAST(sum(a.c * b.c) AS BIGINT) AS ip
        FROM ca a JOIN cb b USING (i, j) GROUP BY 1)),
    tj AS (
      SELECT CAST(coalesce(sum(na.n * nb.n), 0) AS BIGINT) AS true_join_rows
      FROM (SELECT CAST({key_a} AS VARCHAR) AS key, count(*) AS n
            FROM {table_a} GROUP BY 1) na
      JOIN (SELECT CAST({key_b} AS VARCHAR) AS key, count(*) AS n
            FROM {table_b} GROUP BY 1) nb USING (key))
    SELECT true_join_rows, cms_join_rows,
           cms_join_rows - true_join_rows AS overestimate
    FROM tj, est
    """


def hll_registers(
    df: DataFrame, key_col: str, p: int = 10
) -> DataFrame:
    """HyperLogLog register table ``(j, r)`` over ``2^p`` registers: register
    j holds the max leading-zero rank of the 48-bit md5-derived hash values
    routed to it (absent registers are rank 0). Mergeable: registers of a
    union are the element-wise MAX — the property that makes distinct
    counting one fixed-size state per partition/stream at any cardinality.

    The rank is computed with ``instr(lpad(bin(v)))`` — string position of
    the first '1' bit — identical in Spark and DuckDB, so unlike production
    HLL implementations (whose hash and bias tables are engine-private)
    this sketch is exactly oracle-able. No libm anywhere."""
    m = 1 << p
    bits = 48 - p
    key = F.col(key_col).cast("string")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll|"), key)), 1, 12), 16, 10
    ).cast("long")
    # h DIV 2^p as a right shift (h is a non-negative 48-bit value; DuckDB
    # mirrors it as integer // — identical for powers of two)
    rows = df.select((h % m).alias("j"), F.shiftright(h, p).alias("__v"))
    rho = F.when(F.col("__v") == 0, F.lit(bits + 1)).otherwise(
        F.instr(F.lpad(F.bin(F.col("__v")), bits, "0"), "1")
    )
    return rows.select("j", rho.alias("rho")).groupBy("j").agg(
        F.max("rho").alias("r")
    )


def hll_sketch_summary(df: DataFrame, key_col: str, p: int = 10) -> DataFrame:
    """One-row HLL accounting next to the exact distinct count:
    ``(m, n_exact, harmonic_scaled, n_zero_registers)``. The float estimate
    is ``alpha_m · m² / (harmonic_scaled / 2^48)`` — derived OFFLINE from the
    integer output (keeping the entry's columns pure integers makes them
    engine-version-proof; see README's DuckDB-version sensitivity policy).
    ``harmonic_scaled = sum_j 2^(48 − r_j)`` over all m registers (empty
    register ⇒ 2^48), bounded by m·2^48 < 2^63 for p ≤ 14."""
    m = 1 << p
    # BOTH outputs are functions of the distinct key set alone (register
    # max is duplicate-invariant; n_exact IS the distinct count), so the
    # corpus reduces ONCE to its distinct keys instead of two full scans
    # (one md5+groupBy pass over every duplicate + a separate count_distinct
    # shuffle) — guide §2.3 "shuffle keys instead of payloads", r16. The
    # distinct table is checkpointed because the register build and the
    # exact count both read it; values are identical: md5 is per-key, and
    # count(col) over distinct keys skips NULLs exactly like count_distinct.
    keys = df.select(F.col(key_col)).distinct().localCheckpoint(eager=False)
    regs = hll_registers(keys, key_col, p)
    full = (
        df.sparkSession.range(m)
        .select(F.col("id").alias("j"))
        .join(regs, "j", "left")
        .select(F.coalesce("r", F.lit(0)).alias("r"))
    )
    summary = full.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 48 - r)")).alias(
            "harmonic_scaled"
        ),
        F.sum((F.col("r") == 0).cast("long")).alias("n_zero_registers"),
    )
    exact = keys.agg(F.count(F.col(key_col)).alias("n_exact"))
    return exact.crossJoin(F.broadcast(summary)).select(
        "m", "n_exact", "harmonic_scaled", "n_zero_registers"
    )


def hll_sketch_oracle_sql(table: str, key_expr: str, p: int = 10) -> str:
    m = 1 << p
    bits = 48 - p
    h = f"(('0x' || substr(md5('hll|' || CAST({key_expr} AS VARCHAR)), 1, 12))::BIGINT)"
    return f"""
    WITH rows_ AS (
      SELECT {h} % {m} AS j, {h} // {m} AS v FROM {table}),
    regs AS (
      SELECT j, max(CASE WHEN v = 0 THEN {bits + 1}
                         ELSE strpos(lpad(bin(v), {bits}, '0'), '1') END) AS r
      FROM rows_ GROUP BY 1),
    full_ AS (
      SELECT coalesce(regs.r, 0) AS r
      FROM (SELECT unnest(range(0, {m})) AS j) g LEFT JOIN regs USING (j)),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(1::BIGINT << CAST(48 - r AS INT)) AS BIGINT)
               AS harmonic_scaled,
             CAST(sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_registers
      FROM full_),
    e AS (SELECT count(DISTINCT {key_expr}) AS n_exact FROM {table})
    SELECT m, n_exact, harmonic_scaled, n_zero_registers FROM e, s
    """


def cms_estimate_oracle_sql(
    table: str, key_expr: str, d: int = 4, w: int = 256, top_k: int = 10
) -> str:
    """Exact SQL mirror — rebuilds the sketch and the estimates in DuckDB."""
    h = (
        f"(('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || key), 1, 12))"
        f"::BIGINT % {w})"
    )
    return f"""
    WITH keys AS (
      SELECT CAST({key_expr} AS VARCHAR) AS key FROM {table}
      WHERE {key_expr} IS NOT NULL),
    cells AS (
      SELECT i, {h} AS j, count(*) AS c
      FROM keys, (SELECT unnest(range(0, {d})) AS i)
      GROUP BY 1, 2),
    top AS (
      SELECT key, count(*) AS true_n FROM keys GROUP BY 1
      ORDER BY true_n DESC, key ASC LIMIT {top_k}),
    probes AS (
      SELECT key, true_n, i, {h} AS j
      FROM top, (SELECT unnest(range(0, {d})) AS i)),
    est AS (
      SELECT p.key, p.true_n, min(c.c) AS cms_n
      FROM probes p JOIN cells c USING (i, j)
      GROUP BY 1, 2)
    SELECT key, true_n, cms_n, cms_n - true_n AS overestimate
    FROM est
    """


def hll_grouped_registers(
    df: DataFrame, group_cols: list[str], key_col: str, p: int = 10
) -> DataFrame:
    """Per-GROUP HLL registers ``(group_cols..., j, r)`` — the same
    oracle-able rank construction as :func:`hll_registers`, grouped. The
    load-bearing property for rollup serving: element-wise MAX is
    associative, so registers merged from ANY partition of the data (a
    materialized grain, an append-only increment, a coarser re-grouping)
    are BIT-IDENTICAL to registers computed directly on the union — the
    sketch-defined estimate is therefore exactly stable across serving
    paths, unlike re-running an engine-private HLL++. NULL keys are
    excluded (count_distinct semantics)."""
    m = 1 << p
    bits = 48 - p
    key = F.col(key_col).cast("string")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll|"), key)), 1, 12), 16, 10
    ).cast("long")
    rows = df.filter(key.isNotNull()).select(
        *[F.col(c) for c in group_cols],
        (h % m).alias("j"),
        F.shiftright(h, p).alias("__v"),
    )
    rho = F.when(F.col("__v") == 0, F.lit(bits + 1)).otherwise(
        F.instr(F.lpad(F.bin(F.col("__v")), bits, "0"), "1")
    )
    return (
        rows.select(*[F.col(c) for c in group_cols], "j", rho.alias("rho"))
        .groupBy(*[F.col(c) for c in group_cols], F.col("j"))
        .agg(F.max("rho").alias("r"))
    )


def hll_merge_grouped(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register rows to a coarser grouping: ``max(r)`` per (group, j).
    Exact by max-associativity (see :func:`hll_grouped_registers`)."""
    return regs.groupBy(*[F.col(c) for c in group_cols], F.col("j")).agg(
        F.max("r").alias("r")
    )


def hll_estimate_grouped(
    regs: DataFrame,
    group_cols: list[str],
    p: int = 10,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Per-group HLL estimate (Flajolet et al.: harmonic mean of register
    ranks, linear-counting correction in the small range), rounded to a
    BIGINT count. Absent registers contribute rank 0 (2^48 to the harmonic
    sum); integer pieces stay exact, the final estimate is the one
    deliberately-float step (it is an ESTIMATE — both serving paths run
    this same expression on identical registers, so it cannot drift
    between them)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    two48 = 1 << 48
    agg = regs.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("__np"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 48 - r)")).alias("__hp"),
    )
    harmonic = F.col("__hp") + (F.lit(m) - F.col("__np")) * F.lit(two48)
    e_raw = (
        F.lit(alpha)
        * F.lit(float(m))
        * F.lit(float(m))
        * F.lit(float(two48))
        / harmonic.cast("double")
    )
    v_zero = (F.lit(m) - F.col("__np")).cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero),
    ).otherwise(e_raw)
    return agg.select(
        *[F.col(c) for c in group_cols],
        F.round(est).cast("long").alias(out_col),
    )


def hll_grouped_oracle_sql(
    table: str, group_expr: str, key_expr: str, p: int = 10
) -> str:
    """Bit-equal DuckDB mirror of :func:`hll_grouped_registers`: identical
    md5 hash, identical ``bin/lpad/strpos`` rank, identical NULL-key
    exclusion. The register table is pure integers, so the mirror is exact
    on every engine — ready to lift into a driver-gated catalog entry."""
    m = 1 << p
    bits = 48 - p
    h = f"(('0x' || substr(md5('hll|' || CAST({key_expr} AS VARCHAR)), 1, 12))::BIGINT)"
    return f"""
    WITH rows_ AS (
      SELECT {group_expr} AS g, {h} % {m} AS j, {h} // {m} AS v
      FROM {table} WHERE CAST({key_expr} AS VARCHAR) IS NOT NULL)
    SELECT g, CAST(j AS INT) AS j,
           CAST(max(CASE WHEN v = 0 THEN {bits + 1}
                         ELSE strpos(lpad(bin(v), {bits}, '0'), '1') END)
                AS INT) AS r
    FROM rows_ GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# Binned quantile rollup: a MERGEABLE fixed-size summary serving per-group
# quantile ESTIMATES without re-scanning the fact — the quantile analog of
# the HLL register tier. `operators/quantiles.exact_quantiles` is exact but
# needs the fact every time; at 100 TB a p50/p95 dashboard wants a
# groups × bins table (counts + per-bin value bounds) that partitions,
# streams, and increments merge into by plain sum/min/max. Error is bounded
# by bin width; when every distinct value gets its own bin the estimate is
# BIT-EQUAL to quantile_cont (pinned by test). Everything is deterministic
# IEEE arithmetic on integer counts, so the whole pipeline — binning,
# cumulative ranks, within-bin interpolation, quantile_cont-style rank
# blending — has an exact DuckDB mirror.
# ---------------------------------------------------------------------------


def _bin_col(value: Column, boundaries: list[float]) -> Column:
    """Bin index: number of boundaries <= value (bin 0 = below the first
    boundary; bin len(boundaries) = at/above the last). Pure comparisons —
    identical in the SQL mirror."""
    b = F.lit(0)
    for bound in boundaries:
        b = b + F.when(value >= F.lit(float(bound)), 1).otherwise(0)
    return b


def binned_quantile_rollup(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    boundaries: list[float],
) -> DataFrame:
    """Per-(group, bin) summary rows ``(…group_cols, bin, c, bmin, bmax)``.

    Fixed size: ≤ |groups| × (len(boundaries)+1) rows no matter the corpus.
    MERGEABLE: rollups of any partition of the data combine exactly via
    ``groupBy(group, bin).agg(sum(c), min(bmin), max(bmax))`` — see
    :func:`merge_binned_rollups` — which is what makes this the rollup-tier
    shape (daily increments fold in without touching history).
    NULL values are excluded (quantile semantics)."""
    v = F.col(value_col).cast("double")
    return (
        df.where(v.isNotNull())
        .groupBy(
            *[F.col(c) for c in group_cols],
            _bin_col(v, boundaries).alias("bin"),
        )
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min(v).alias("bmin"),
            F.max(v).alias("bmax"),
        )
    )


def merge_binned_rollups(parts: DataFrame, group_cols: list[str]) -> DataFrame:
    """Exact merge of unioned rollup parts (sum counts, widen bounds)."""
    return parts.groupBy(*[F.col(c) for c in group_cols], F.col("bin")).agg(
        F.sum("c").alias("c"),
        F.min("bmin").alias("bmin"),
        F.max("bmax").alias("bmax"),
    )


def binned_quantiles(
    rollup: DataFrame,
    group_cols: list[str],
    probs: list[float],
    out_names: list[str] | None = None,
) -> DataFrame:
    """Per-group quantile ESTIMATES from a rollup: ``group_cols + out_names``.

    quantile_cont's rank blend over estimated order statistics: target rank
    ``h = p·(n−1)``; the value at integer rank r comes from the bin whose
    cumulative range contains r, linearly interpolated between the bin's
    observed (bmin, bmax) by position — exact when the bin holds one
    distinct value, ≤ bin width off otherwise. The per-group window runs
    over ≤ n_bins rows (the rollup is fixed-size by construction — same
    bounded-window argument as the hidden-drill median)."""
    from pyspark.sql import Window

    if out_names is None:
        out_names = [f"q_{p}" for p in probs]
    assert len(out_names) == len(probs)

    w = Window.partitionBy(*group_cols).orderBy("bin")
    wg = Window.partitionBy(*group_cols)
    cum = (
        rollup.withColumn("start", F.sum("c").over(w) - F.col("c"))
        .withColumn("n", F.sum("c").over(wg))
    )

    def value_at(rank: Column) -> Column:
        # the one bin with start <= rank < start + c supplies the estimate
        hit = (F.col("start") <= rank) & (rank < F.col("start") + F.col("c"))
        est = F.when(
            F.col("c") > 1,
            F.col("bmin")
            + (F.col("bmax") - F.col("bmin"))
            * ((rank - F.col("start")).cast("double") / (F.col("c") - 1)),
        ).otherwise(F.col("bmin"))
        return F.max(F.when(hit, est))

    # the two straddling order statistics are aggregated separately (each
    # hits exactly one bin row) and blended AFTER the groupBy — blending
    # inside the aggregate would mix the two hit rows' partial terms
    sel = [F.col(c) for c in group_cols]
    agg_cols = []
    for i, p in enumerate(probs):
        h = F.lit(float(p)) * (F.col("n") - 1).cast("double")
        k = F.floor(h).cast("long")
        k1 = F.least(k + 1, F.col("n") - 1)
        agg_cols.append(value_at(k).alias(f"__vk{i}"))
        agg_cols.append(value_at(k1).alias(f"__vk1_{i}"))
        agg_cols.append(F.max(h).alias(f"__h{i}"))
    grouped = cum.groupBy(*[F.col(c) for c in group_cols]).agg(*agg_cols)
    outs = []
    for i, (p, name) in enumerate(zip(probs, out_names)):
        h = F.col(f"__h{i}")
        k = F.floor(h)
        outs.append(
            (
                (k + 1 - h) * F.col(f"__vk{i}") + (h - k) * F.col(f"__vk1_{i}")
            ).alias(name)
        )
    return grouped.select(*sel, *outs)


def derive_bin_edges(
    df: DataFrame, value_col: str, n_bins: int = 16
) -> list[float]:
    """Data-derived bin boundaries for :func:`binned_quantile_rollup`
    (VERDICT r9 #5 — a 100 TB dashboard shouldn't need a human to know the
    value distribution): the ``n_bins - 1`` interior edges are the GLOBAL
    quantiles of the value column at equally spaced probabilities
    ``i/n_bins``, computed by the distributed exact rank fold
    (:func:`~tesseract_spark.operators.quantiles.exact_quantiles` — never
    buffers a group, proven bit-equal to DuckDB ``quantile_cont``). Because
    the fold is DETERMINISTIC (unlike ``approx_percentile``'s
    partition-order-sensitive GK merge), the SQL oracle can re-derive the
    SAME edges with ``quantile_cont`` inside a CTE — no per-sf pinning.

    Equal-frequency edges put ≈ 1/n_bins of the mass in every bin, so the
    estimate's error bound (≤ the straddling bin's observed span) adapts to
    the distribution — tight where the data is dense, exactly where
    quantile queries land. The collect is bounded: n_bins − 1 doubles.
    Coincident quantiles (heavy ties) are kept, not deduped — a duplicated
    edge contributes the same ``v >= e`` term in both engines and only
    skips an (empty, never-materialized) bin index."""
    from .quantiles import exact_quantiles

    qdf = exact_quantiles(
        df.select(F.lit(1).alias("__g"), F.col(value_col).cast("double").alias("__v")),
        ["__g"],
        "__v",
        [i / n_bins for i in range(1, n_bins)],
        [f"e{i}" for i in range(1, n_bins)],
    )
    rows = qdf.collect()
    if not rows:
        # empty / all-NULL value column: no data means no edges — the
        # single-bin rollup over it is empty too, matching the SQL mirror's
        # empty result (a fresh deployment resolving boundaries before data
        # lands must not crash)
        return []
    row = rows[0]
    return [float(row[f"e{i}"]) for i in range(1, n_bins)]


def binned_quantiles_auto_oracle_sql(
    table: str,
    group_expr: str,
    group_alias: str,
    value_expr: str,
    n_bins: int,
    probs: list[float],
    out_names: list[str],
) -> str:
    """DuckDB mirror of ``derive_bin_edges`` → ``binned_quantile_rollup`` →
    ``binned_quantiles``: the edges CTE re-derives the SAME boundaries with
    ``quantile_cont`` (bit-equal to the Spark-side rank fold), then the
    binning/estimation SQL is identical to :func:`binned_quantiles_oracle_sql`
    with edge references in place of literals."""
    edge_cols = ", ".join(
        f"quantile_cont(v, {i / n_bins!r}) AS e{i}" for i in range(1, n_bins)
    )
    bin_expr = " + ".join(
        f"(CASE WHEN v >= e{i} THEN 1 ELSE 0 END)" for i in range(1, n_bins)
    )
    per_prob = []
    for i, p in enumerate(probs):
        h = f"({p!r} * CAST(n - 1 AS DOUBLE))"
        k = f"CAST(floor({h}) AS BIGINT)"
        k1 = f"least({k} + 1, n - 1)"

        def est(r: str) -> str:
            return (
                f"(CASE WHEN c > 1 THEN bmin + (bmax - bmin) * "
                f"(CAST(({r}) - start AS DOUBLE) / (c - 1)) ELSE bmin END)"
            )

        per_prob.append(
            f"max(CASE WHEN start <= {k} AND {k} < start + c "
            f"THEN {est(k)} END) AS vk{i}"
        )
        per_prob.append(
            f"max(CASE WHEN start <= {k1} AND {k1} < start + c "
            f"THEN {est(k1)} END) AS vk1_{i}"
        )
        per_prob.append(f"max({h}) AS h{i}")
    blends = ", ".join(
        f'(floor(h{i}) + 1 - h{i}) * vk{i} + (h{i} - floor(h{i})) * vk1_{i}'
        f' AS "{name}"'
        for i, name in enumerate(out_names)
    )
    return f"""
    WITH rows_ AS (
      SELECT {group_expr} AS g, CAST({value_expr} AS DOUBLE) AS v
      FROM {table} WHERE {value_expr} IS NOT NULL),
    edges AS (SELECT {edge_cols} FROM rows_),
    binned AS (SELECT g, v, ({bin_expr}) AS bin FROM rows_, edges),
    bins AS (SELECT g, bin, count(*) AS c, min(v) AS bmin, max(v) AS bmax
             FROM binned GROUP BY 1, 2),
    cum AS (SELECT g, bin, c, bmin, bmax,
                   sum(c) OVER (PARTITION BY g ORDER BY bin) - c AS start,
                   sum(c) OVER (PARTITION BY g) AS n
            FROM bins),
    grouped AS (SELECT g, {", ".join(per_prob)} FROM cum GROUP BY g)
    SELECT g AS "{group_alias}", {blends} FROM grouped
    """


def binned_quantiles_oracle_sql(
    table: str,
    group_expr: str,
    group_alias: str,
    value_expr: str,
    boundaries: list[float],
    probs: list[float],
    out_names: list[str],
) -> str:
    """Bit-equal DuckDB mirror of :func:`binned_quantile_rollup` →
    :func:`binned_quantiles`: identical CASE binning, identical cumulative
    ranks, identical within-bin interpolation and quantile_cont-style rank
    blend (same IEEE operation order; DuckDB's ``floor`` returns DOUBLE vs
    Spark's BIGINT — numerically identical below 2^53)."""
    bin_expr = " + ".join(
        f"(CASE WHEN v >= {float(b)!r} THEN 1 ELSE 0 END)" for b in boundaries
    )
    per_prob = []
    for i, p in enumerate(probs):
        h = f"({p!r} * CAST(n - 1 AS DOUBLE))"
        k = f"CAST(floor({h}) AS BIGINT)"
        k1 = f"least({k} + 1, n - 1)"

        def est(r: str) -> str:
            return (
                f"(CASE WHEN c > 1 THEN bmin + (bmax - bmin) * "
                f"(CAST(({r}) - start AS DOUBLE) / (c - 1)) ELSE bmin END)"
            )

        per_prob.append(
            f"max(CASE WHEN start <= {k} AND {k} < start + c "
            f"THEN {est(k)} END) AS vk{i}"
        )
        per_prob.append(
            f"max(CASE WHEN start <= {k1} AND {k1} < start + c "
            f"THEN {est(k1)} END) AS vk1_{i}"
        )
        per_prob.append(f"max({h}) AS h{i}")
    blends = ", ".join(
        f'(floor(h{i}) + 1 - h{i}) * vk{i} + (h{i} - floor(h{i})) * vk1_{i}'
        f' AS "{name}"'
        for i, name in enumerate(out_names)
    )
    return f"""
    WITH rows_ AS (
      SELECT {group_expr} AS g, CAST({value_expr} AS DOUBLE) AS v
      FROM {table} WHERE {value_expr} IS NOT NULL),
    binned AS (SELECT g, v, ({bin_expr}) AS bin FROM rows_),
    bins AS (SELECT g, bin, count(*) AS c, min(v) AS bmin, max(v) AS bmax
             FROM binned GROUP BY 1, 2),
    cum AS (SELECT g, bin, c, bmin, bmax,
                   sum(c) OVER (PARTITION BY g ORDER BY bin) - c AS start,
                   sum(c) OVER (PARTITION BY g) AS n
            FROM bins),
    grouped AS (SELECT g, {", ".join(per_prob)} FROM cum GROUP BY g)
    SELECT g AS "{group_alias}", {blends} FROM grouped
    """


def heavy_hitters_rollup(
    df: DataFrame,
    group_cols: list[str],
    member_col: str,
    capacity: int = 64,
) -> DataFrame:
    """Per-group fixed-capacity frequent-member summary ``(…group_cols,
    member, cnt, floor)`` — the top-``capacity`` members of each grain by
    EXACT count, ordered ``(cnt DESC, member ASC)``, plus the grain's
    truncation ``floor``: the smallest kept count when members were dropped
    (every dropped member's true count is ≤ it — it failed to out-rank the
    last kept row), else 0.

    This is the frequent-members rollup tier beside the HLL registers
    (distinct counts) and the binned-quantile summaries (quantiles): a
    bounded summary (≤ |groups| × capacity rows at ANY corpus size) a
    100 TB dashboard serves top-k from without re-scanning the fact. The
    bound is the mergeable-summaries guarantee for truncated exact counts
    (Agarwal et al., PODS 2012 §3 / Metwally et al.'s SpaceSaving
    invariant, public methods): merging grain summaries via
    :func:`merge_heavy_hitters` brackets every member's true coarse count
    between the sum of its kept counts and that sum plus the floors of the
    grains that dropped it — EXACT (floor 0 everywhere) whenever no grain
    exceeds capacity. Unlike a streaming SpaceSaving counter the per-grain
    summary is a deterministic function of the DATA (exact counts, total
    tie-break order), never of partition layout — which is what makes the
    merge SQL-mirrorable bit-for-bit.

    Scale shape: one ``groupBy(grain, member)`` count (map-side partial),
    one rank window over each grain's member counts (sorts within the
    already-shuffled grain partition), bounded output."""
    counts = df.groupBy(
        *[F.col(c) for c in group_cols], F.col(member_col).alias("member")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    # asc_nulls_last: Spark's bare ASC is NULLS FIRST but DuckDB's is NULLS
    # LAST — a NULL member at a truncation boundary would survive in one
    # engine and be dropped in the other without the explicit null order
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("cnt").desc(), F.col("member").asc_nulls_last()
    )
    wg = Window.partitionBy(*group_cols)
    ranked = counts.withColumn("rn", F.row_number().over(w)).withColumn(
        "nm", F.count(F.lit(1)).over(wg)
    )
    kept = ranked.filter(F.col("rn") <= capacity)
    return (
        kept.withColumn(
            "floor",
            F.when(
                F.col("nm") > capacity,
                F.max(
                    F.when(F.col("rn") == capacity, F.col("cnt"))
                ).over(wg),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .select(*group_cols, "member", "cnt", "floor")
    )


def merge_heavy_hitters(
    rollup: DataFrame,
    coarse_cols: list[str],
    fine_cols: list[str],
    k: int = 10,
) -> DataFrame:
    """Top-``k`` members per COARSE grain served from fine-grain summaries:
    ``(…coarse_cols, member, est_cnt, max_cnt, rank)``.

    - ``est_cnt`` = sum of the member's kept counts over the coarse grain's
      fine summaries — a LOWER bound on its true count (kept counts are
      exact; grains that dropped the member contribute 0);
    - ``max_cnt`` = est_cnt + the floors of the fine grains whose summary
      does NOT carry the member — the upper bound (a dropped member's
      per-grain count is ≤ that grain's floor). Computed as
      ``est_cnt + total_floor(coarse) − Σ floor(grains carrying it)`` so no
      anti-join is needed;
    - ranking is by ``(est_cnt DESC, member ASC)`` — deterministic, and
      exact whenever no summary truncated (floors all 0 ⇒
      est_cnt = max_cnt = true count).

    Every aggregate here runs over the BOUNDED rollup, never the fact."""
    # rollup feeds both the floor tables and the member aggregate; left
    # LAZY on purpose — both consumers share the rollup's own fine-grain
    # exchange, which AQE's runtime exchange reuse computes once (only the
    # bounded truncation windows replay), so a localCheckpoint here only
    # adds a job barrier (measured: 0.99 → 1.2 s with the checkpoint; r16)
    floors = (
        rollup.select(*fine_cols, "floor")
        .groupBy(*[F.col(c) for c in fine_cols])
        .agg(F.max("floor").alias("floor"))
    )
    coarse = list(coarse_cols)
    total_floor = floors.groupBy(*[F.col(c) for c in coarse]).agg(
        F.sum("floor").cast("long").alias("total_floor")
    )
    agg = rollup.groupBy(*[F.col(c) for c in coarse], F.col("member")).agg(
        F.sum("cnt").cast("long").alias("est_cnt"),
        F.sum("floor").cast("long").alias("floors_present"),
    )
    w = Window.partitionBy(*coarse).orderBy(
        F.col("est_cnt").desc(), F.col("member").asc_nulls_last()
    )
    # null-SAFE join: groupBy keeps NULL grain keys on both sides, so the
    # join must too — a bare equi-join would silently drop the NULL grain's
    # entire top-k (the oracle mirrors with IS NOT DISTINCT FROM)
    tf = total_floor.select(
        *[F.col(c).alias(f"__tf_{i}") for i, c in enumerate(coarse)],
        "total_floor",
    )
    cond = None
    for i, c in enumerate(coarse):
        term = F.col(c).eqNullSafe(F.col(f"__tf_{i}"))
        cond = term if cond is None else (cond & term)
    return (
        agg.join(F.broadcast(tf), cond)
        .withColumn(
            "max_cnt",
            (F.col("est_cnt") + F.col("total_floor") - F.col("floors_present"))
            .cast("long"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*coarse, "member", "est_cnt", "max_cnt", "rank")
    )


def heavy_hitters_oracle_sql(
    src_sql: str,
    coarse_exprs: list[str],
    fine_exprs: list[str],
    capacity: int,
    k: int,
) -> str:
    """DuckDB mirror of :func:`heavy_hitters_rollup` →
    :func:`merge_heavy_hitters`: replay the per-grain exact counts, the
    ``(cnt DESC, member ASC)`` truncation with its floor, and the
    bracketed merge. ``src_sql`` must yield the fine grain columns plus a
    ``member`` column. Everything is counts + total-order ranks — the merge
    is a deterministic function of the data, so the mirror is bit-exact.
    NULL handling mirrors the operator exactly: members order NULLS LAST
    (DuckDB's ASC default; the Spark side says asc_nulls_last explicitly)
    and NULL coarse keys survive the merge join (IS NOT DISTINCT FROM,
    matching the Spark side's eqNullSafe)."""
    fine = ", ".join(fine_exprs)
    coarse = ", ".join(coarse_exprs)
    nsj = " AND ".join(
        f"agg.{c} IS NOT DISTINCT FROM total_floor.{c}" for c in coarse_exprs
    )
    return f"""
    WITH hh_src AS ({src_sql}),
    counts AS (
      SELECT {fine}, member, CAST(count(*) AS BIGINT) AS cnt
      FROM hh_src GROUP BY {fine}, member),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY {fine}
                                ORDER BY cnt DESC, member ASC) AS rn,
             count(*) OVER (PARTITION BY {fine}) AS nm
      FROM counts),
    kept AS (SELECT * FROM ranked WHERE rn <= {capacity}),
    summ AS (
      SELECT *,
             CASE WHEN nm > {capacity}
                  THEN max(CASE WHEN rn = {capacity} THEN cnt END)
                       OVER (PARTITION BY {fine})
                  ELSE 0 END AS floor_
      FROM kept),
    floors AS (
      SELECT {fine}, max(floor_) AS floor_ FROM summ GROUP BY {fine}),
    total_floor AS (
      SELECT {coarse}, CAST(sum(floor_) AS BIGINT) AS total_floor
      FROM floors GROUP BY {coarse}),
    agg AS (
      SELECT {coarse}, member,
             CAST(sum(cnt) AS BIGINT) AS est_cnt,
             CAST(sum(floor_) AS BIGINT) AS floors_present
      FROM summ GROUP BY {coarse}, member)
    SELECT {coarse}, member, est_cnt, max_cnt, rank FROM (
      SELECT agg.*,
             CAST(est_cnt + total_floor - floors_present AS BIGINT) AS max_cnt,
             CAST(row_number() OVER (PARTITION BY {", ".join(f"agg.{c}" for c in coarse_exprs)}
                                ORDER BY est_cnt DESC, member ASC) AS INTEGER) AS rank
      FROM agg JOIN total_floor ON {nsj})
    WHERE rank <= {k}
    """
