"""Deterministic sampling & dataset splitting for training-data pipelines.

The reference has no sampling surface (its only row-dropping operators are
cuts/filters — SURVEY.md §2.2); these are the standard LLM-corpus operations:

- :func:`deterministic_split` — stable train/val/test assignment from a hash
  of the document id. Pure per-row column expression: no shuffle, no RNG
  state, reproducible across runs/cluster sizes/partitionings — the property
  that matters at 100 TB, where ``df.randomSplit`` (per-task RNG) changes
  membership whenever partitioning changes.
- :func:`sample_per_group` — exact k-per-group uniform sample via a
  ``row_number`` window ordered by a keyed hash. ONE shuffle on the group
  key; deterministic, so the same rows are sampled on every run.

Hashing: first 8 hex chars of ``md5(seed || '|' || id)`` = 32 uniform bits,
compared lexicographically against hex thresholds (lowercase hex sorts
numerically, and DuckDB/Spark md5 hex strings are identical — the same trick
the dedup operators use), so every function here has an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: default split weights (name, fraction); fractions must sum to 1
DEFAULT_SPLITS: tuple[tuple[str, float], ...] = (
    ("train", 0.8),
    ("val", 0.1),
    ("test", 0.1),
)


def _hex_threshold(p: float) -> str:
    """Hex literal h such that P[first-8-hex-chars(md5) < h] == p (8 chars,
    32 bits)."""
    return format(min(int(p * 16**8), 16**8 - 1), "08x")


def _hash8(seed: str, id_col: Column) -> Column:
    return F.substring(
        F.md5(F.concat_ws("|", F.lit(seed), id_col.cast("string"))), 1, 8
    )


def split_col(
    id_col: Column,
    seed: str = "split-v1",
    weights: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
) -> Column:
    """Split-name column: deterministic hash-bucket assignment with the given
    cumulative weights."""
    h = _hash8(seed, id_col)
    cum = 0.0
    conds: list[tuple[Column, str]] = []
    for name, w in weights[:-1]:
        cum += w
        conds.append((h < F.lit(_hex_threshold(cum)), name))
    out: Column = F.lit(weights[-1][0])
    for cond, name in reversed(conds):
        out = F.when(cond, F.lit(name)).otherwise(out)
    return out


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "split-v1",
    weights: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    out_col: str = "split",
) -> DataFrame:
    """Attach a stable split assignment; membership depends only on
    (seed, id) — never on partitioning or cluster size."""
    return df.withColumn(out_col, split_col(F.col(id_col), seed, weights))


def split_case_sql(
    id_expr: str,
    seed: str = "split-v1",
    weights: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
) -> str:
    """DuckDB CASE expression mirroring :func:`split_col` bit-for-bit."""
    h = f"substr(md5('{seed}|' || {id_expr}), 1, 8)"
    cum = 0.0
    branches = []
    for name, w in weights[:-1]:
        cum += w
        branches.append(f"WHEN {h} < '{_hex_threshold(cum)}' THEN '{name}'")
    return f"CASE {' '.join(branches)} ELSE '{weights[-1][0]}' END"


def sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    id_col: str = "doc_id",
    seed: str = "sample-v1",
) -> DataFrame:
    """Exactly min(k, group size) uniformly-chosen rows per group,
    deterministic in (seed, id). The hash orders rows randomly-but-stably;
    ``id_col`` breaks md5 ties (only possible with duplicate ids)."""
    w = Window.partitionBy(*group_cols).orderBy(
        _hash8(seed, F.col(id_col)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def sample_per_group_oracle_sql(
    table: str,
    group_cols: list[str],
    k: int,
    select_cols: list[str],
    id_expr: str = "doc_id",
    seed: str = "sample-v1",
) -> str:
    gc = ", ".join(group_cols)
    sc = ", ".join(select_cols)
    return f"""
    SELECT {sc} FROM (
      SELECT {sc}, row_number() OVER (
        PARTITION BY {gc}
        ORDER BY substr(md5('{seed}|' || {id_expr}), 1, 8), {id_expr}) AS rn
      FROM {table})
    WHERE rn <= {k}
    """


def curriculum_order(
    df: DataFrame,
    score_col: str,
    n_buckets: int = 4,
    id_col: str = "doc_id",
    seed: str = "curriculum-0",
    ascending: bool = True,
) -> DataFrame:
    """Curriculum data ordering: bucket rows by EXACT score quantiles
    (``operators.quantiles.exact_quantiles`` — the scale-safe path, never a
    per-group value buffer) and shuffle deterministically WITHIN each
    bucket — the standard easy→hard curriculum shape where difficulty
    tiers are strict but order inside a tier is random-but-reproducible.

    Returns the input plus ``(bucket, order_hash)``: train in ``bucket``
    ascending (or descending when ``ascending=False``), ``order_hash``
    ascending within it; a writer range-partitions on the pair — no global
    single-task sort anywhere. ``bucket`` = number of quantile thresholds
    at or below the score (0..n_buckets-1), thresholds at probabilities
    ``1/n .. (n-1)/n``; ties at a threshold go to the higher bucket, so the
    mapping is a pure function of the score and engine-portable (the
    thresholds are interpolated doubles shared with the oracle
    bit-for-bit)."""
    from .quantiles import exact_quantiles

    probs = [i / n_buckets for i in range(1, n_buckets)]
    names = [f"__t{i}" for i in range(1, n_buckets)]
    th = exact_quantiles(
        df.select(F.lit(1).alias("__g"), F.col(score_col)),
        ["__g"],
        score_col,
        probs,
        names,
    ).drop("__g")
    out = df.crossJoin(F.broadcast(th))
    bucket = None
    for nm in names:
        b = F.when(F.col(score_col) >= F.col(nm), 1).otherwise(0)
        bucket = b if bucket is None else bucket + b
    if not ascending:
        bucket = F.lit(n_buckets - 1) - bucket
    return out.select(
        *df.columns,
        bucket.cast("int").alias("bucket"),
        _hash8(seed, F.col(id_col)).alias("order_hash"),
    )


def curriculum_order_oracle_sql(
    table: str,
    score_expr: str,
    select_cols: list[str],
    n_buckets: int = 4,
    id_expr: str = "doc_id",
    seed: str = "curriculum-0",
    ascending: bool = True,
) -> str:
    """Mirror: quantile_cont thresholds (bit-equal to exact_quantiles) +
    the same md5 order hash."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    th = ", ".join(
        f"quantile_cont({score_expr}, {p!r}) AS t{i}"
        for i, p in enumerate(probs, start=1)
    )
    bucket = " + ".join(
        f"CASE WHEN {score_expr} >= th.t{i} THEN 1 ELSE 0 END"
        for i in range(1, n_buckets)
    )
    if not ascending:
        bucket = f"{n_buckets - 1} - ({bucket})"
    sc = ", ".join(select_cols)
    return f"""
    WITH th AS (SELECT {th} FROM {table})
    SELECT {sc},
           CAST({bucket} AS INT) AS bucket,
           substr(md5('{seed}|' || {id_expr}), 1, 8) AS order_hash
    FROM {table}, th
    """


def epoch_shuffle(
    df: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    seed: str = "epoch-0",
) -> DataFrame:
    """Deterministic training order for one epoch: every row gets a stable
    ``(shard, pos)`` — shard is a hash bucket of the id, pos the rank of a
    second keyed hash within the shard. Changing ``seed`` (e.g. per epoch)
    re-deals both. This is the scalable substitute for a global ORDER BY
    rand(): ONE shuffle on shard, per-shard ranking windows (never a global
    single-partition sort), and membership/order independent of
    partitioning — a data loader reads shard files in pos order."""
    id_c = F.col(id_col)
    shard = (
        F.conv(F.substring(F.md5(F.concat_ws("|", F.lit(seed + "/shard"), id_c.cast("string"))), 1, 4), 16, 10).cast("long")
        % n_shards
    )
    w = Window.partitionBy("shard").orderBy(
        _hash8(seed + "/pos", id_c).asc(), id_c.asc()
    )
    return (
        df.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
    )


def epoch_shuffle_oracle_sql(
    table: str,
    select_cols: list[str],
    n_shards: int = 8,
    id_expr: str = "doc_id",
    seed: str = "epoch-0",
) -> str:
    sc = ", ".join(select_cols)
    shard = f"(('0x' || substr(md5('{seed}/shard|' || {id_expr}), 1, 4))::BIGINT % {n_shards})"
    pos_key = f"substr(md5('{seed}/pos|' || {id_expr}), 1, 8)"
    return f"""
    SELECT {sc}, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY {pos_key}, {id_expr})
                AS BIGINT) AS pos
    FROM (SELECT *, {shard} AS shard FROM {table})
    """


def subsample_by_group(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix-v1",
    default_rate: float = 1.0,
) -> DataFrame:
    """Data-mixture control: keep a deterministic hash-fraction of each
    group (e.g. downsample an over-represented source to rebalance the
    corpus mixture). Pure per-row expression — no shuffle, stable across
    partitionings and runs; groups absent from ``rates`` keep
    ``default_rate``."""
    h = _hash8(seed, F.col(id_col))
    keep: Column = F.lit(default_rate >= 1.0) if default_rate >= 1.0 else (
        h < F.lit(_hex_threshold(default_rate))
    )
    for g, r in sorted(rates.items()):
        cond = h < F.lit(_hex_threshold(r)) if r < 1.0 else F.lit(True)
        keep = F.when(F.col(group_col) == g, cond).otherwise(keep)
    return df.filter(keep)


def subsample_by_group_oracle_where(
    rates: dict[str, float],
    group_col: str = "source",
    id_expr: str = "doc_id",
    seed: str = "mix-v1",
    default_rate: float = 1.0,
) -> str:
    """DuckDB WHERE fragment mirroring :func:`subsample_by_group`."""
    h = f"substr(md5('{seed}|' || {id_expr}), 1, 8)"
    branches = []
    for g, r in sorted(rates.items()):
        cond = f"{h} < '{_hex_threshold(r)}'" if r < 1.0 else "TRUE"
        branches.append(f"WHEN {group_col} = '{g}' THEN {cond}")
    default = "TRUE" if default_rate >= 1.0 else f"{h} < '{_hex_threshold(default_rate)}'"
    return f"CASE {' '.join(branches)} ELSE {default} END"


def temperature_mixture(
    df: DataFrame,
    target_total: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix-v1",
) -> DataFrame:
    """Temperature-weighted mixture rebalancing (the multilingual-corpus
    p_s ∝ n_s^α recipe at α = 0.5): per-source keep rates are computed
    IN-PLAN from the source counts so over-represented sources are
    downsampled toward sqrt-proportional shares of ``target_total``.

    Everything is engine-portable arithmetic: weights are INTEGER
    floor(sqrt(n)) (an exact, order-independent integer sum across sources —
    a raw double sqrt-sum would be addition-order-dependent), the rate is a
    single IEEE multiply/divide chain on exact integers, and the keep
    decision compares the 32-bit md5 bucket against floor(rate·2^32) (the
    2^32 scaling is exact power-of-two arithmetic). Returns per-source
    accounting (source, n_docs, weight, rate, n_kept); the same keep
    predicate filters the corpus itself in a real pipeline.

    Plan shape: one groupBy for counts, a 1-row broadcast total, a broadcast
    rates join, one per-row hash comparison — no corpus shuffle."""
    c = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    c = c.withColumn(
        "w", F.floor(F.sqrt(F.col("n").cast("double"))).cast("long")
    )
    tot = c.agg(F.sum("w").alias("sw"))
    rates = c.crossJoin(F.broadcast(tot)).withColumn(
        "rate",
        F.least(
            F.lit(1.0),
            (F.lit(float(target_total)) * F.col("w"))
            / (F.col("sw").cast("double") * F.col("n")),
        ),
    )
    h = F.conv(_hash8(seed, F.col(id_col)), 16, 10).cast("long")
    kept = (
        df.join(F.broadcast(rates), group_col)
        .withColumn("__keep", h < F.floor(F.col("rate") * F.lit(4294967296.0)).cast("long"))
        .groupBy(group_col, "n", "w", "rate")
        .agg(F.sum(F.col("__keep").cast("long")).alias("n_kept"))
    )
    return kept.select(
        F.col(group_col), F.col("n").alias("n_docs"), "w", "rate", "n_kept"
    )


def temperature_mixture_oracle_sql(
    target_total: int,
    table: str = "documents",
    group_col: str = "source",
    id_expr: str = "doc_id",
    seed: str = "mix-v1",
) -> str:
    """DuckDB mirror of :func:`temperature_mixture` — identical expression
    trees so every IEEE operation rounds identically."""
    h = f"('0x' || substr(md5('{seed}|' || {id_expr}), 1, 8))::BIGINT"
    return f"""
    WITH c AS (
      SELECT {group_col}, count(*) AS n,
             CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS w
      FROM {table} GROUP BY 1),
    t AS (SELECT sum(w) AS sw FROM c),
    r AS (
      SELECT {group_col}, n, w,
             least(1.0, (CAST({target_total} AS DOUBLE) * w)
                        / (CAST(sw AS DOUBLE) * n)) AS rate
      FROM c, t)
    SELECT d.{group_col}, r.n AS n_docs, r.w, r.rate,
           CAST(sum(CASE WHEN {h} < CAST(floor(r.rate * 4294967296.0) AS BIGINT)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM {table} d JOIN r USING ({group_col})
    GROUP BY 1, 2, 3, 4
    """


def stratified_sample_exact(
    df: DataFrame,
    total_n: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "strat-v1",
) -> DataFrame:
    """Stratified sampling with EXACT proportional allocation: ``total_n``
    rows split across strata by the largest-remainder (Hamilton) method —
    pure integer arithmetic, so the allocation is deterministic and
    engine-portable — then selected within each stratum by keyed-hash order.
    Returns the per-stratum manifest
    ``(group, n_docs, n_target, n_sampled, ids_md5)``; the same rank
    predicate filters the corpus itself in a real pipeline.

    Allocation: ``base_g = total_n·n_g DIV N``, leftover seats go to the
    strata with the largest integer remainders (ties on group asc), so
    ``sum(n_target) == min(total_n, N)`` exactly — the property quota
    sampling needs and ``rate``-based filters can't give.

    Selection at scale: ranking within a stratum would be a single task per
    stratum (the skew shape VERDICT r4 #3 flagged for quantiles), so rows
    are ranked within (stratum, hash-prefix bucket) — 256 uniform md5
    buckets — and offset by a carry table of per-bucket counts (≤256 tiny
    rows per stratum), the same range-bucket + carry pattern as
    ``exact_quantiles``. The bucket prefix IS the hash prefix, so
    bucket-major order equals global hash order. One data-sized shuffle
    (the bucketed rank), everything else is stratum-count-sized.

    NULL strata are excluded up front (ADVICE r5: a NULL group would
    receive a Hamilton allocation but its rows are unreachable through the
    non-null-safe ``__g`` joins, silently under-filling ``total_n``).
    Bucket NULL-group rows into a real stratum before calling if they
    should participate."""
    g, idc = F.col(group_col), F.col(id_col)
    df = df.where(g.isNotNull())
    # the corpus reduces ONCE to a narrow (group, id, hash8, bucket) proxy
    # that every later step reads (guide §2.4, §8 "decide with small rows"):
    # left lazy, the stratum counts, the bucket counts, and the ranked
    # selection each re-scanned the corpus and re-hashed every id (the
    # r16-open plan showed 12 parquet scans / 19 Exchanges for one entry).
    h = _hash8(seed, idc)
    rows = (
        df.select(g.alias("__g"), idc.alias("__id"), h.alias("__h"))
        .withColumn(
            "__b", F.conv(F.substring(F.col("__h"), 1, 2), 16, 10).cast("int")
        )
        .localCheckpoint(eager=False)
    )
    # stratum counts derive from the proxy (identical rows, hence identical
    # counts); checkpointed because BOTH the total and the seat table read
    # it (stratum-count-sized — tiny)
    c = (
        rows.groupBy("__g")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(F.col("__g").alias(group_col), "n_docs")
        .localCheckpoint(eager=False)
    )
    tot = c.agg(F.sum("n_docs").alias("N"))
    seats = c.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        (F.lit(total_n) * F.col("n_docs")).cast("long").alias("scaled"),
        "N",
    )
    seats = seats.select(
        group_col,
        "n_docs",
        # DIV, not '/': Spark's '/' on longs is double division, which loses
        # exactness once total_n·n_g crosses 2^53
        F.expr("scaled DIV N").alias("base"),
        (F.col("scaled") % F.col("N")).alias("rem"),
        "N",
    )
    # leftover seats: total_n - sum(base); strata ranked by remainder.
    # Window-free seat math over the stratum-count-sized table: fold the
    # strata into ONE array, array_sort on the (-rem, group) struct key,
    # posexplode for the remainder rank — a literal-partition window here
    # would emit Spark's "No Partition Defined" warning (VERDICT r7 #7;
    # literal partitions warn identically to none in Spark 4.1).
    seat_xs = F.array_sort(
        F.collect_list(
            F.struct(
                (-F.col("rem")).alias("negrem"),
                F.col(group_col).alias("g"),
                "n_docs",
                "base",
            )
        )
    )
    folded = seats.groupBy("N").agg(
        seat_xs.alias("xs"), F.sum("base").alias("sum_base")
    )
    alloc = (
        folded.select(
            "N",
            "sum_base",
            F.posexplode("xs").alias("pos", "x"),
        )
        .select(
            F.col("x.g").alias(group_col),
            F.col("x.n_docs").alias("n_docs"),
            F.least(
                F.col("x.n_docs"),
                F.col("x.base")
                + F.when(
                    (F.col("pos") + 1)
                    <= F.least(F.lit(total_n), F.col("N")) - F.col("sum_base"),
                    F.lit(1),
                ).otherwise(F.lit(0)),
            ).alias("n_target"),
        )
        # read twice (the selection filter and the output manifest join);
        # stratum-count-sized
        .localCheckpoint(eager=False)
    )

    bc = rows.groupBy("__g", "__b").agg(F.count(F.lit(1)).alias("__cnt"))
    w_cum = (
        Window.partitionBy("__g")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    starts = bc.withColumn(
        "__start", F.coalesce(F.sum("__cnt").over(w_cum), F.lit(0))
    ).select("__g", "__b", "__start")
    w_in = Window.partitionBy("__g", "__b").orderBy(
        F.col("__h").asc(), F.col("__id").asc()
    )
    ranked = rows.join(F.broadcast(starts), ["__g", "__b"]).withColumn(
        "__grank", F.col("__start") + F.row_number().over(w_in)
    )
    sel = ranked.join(
        F.broadcast(alloc.select(F.col(group_col).alias("__g"), "n_target")), "__g"
    ).where(F.col("__grank") <= F.col("n_target"))
    picked = sel.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.col("__id"))),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("ids_md5"),
    )
    return (
        alloc.join(picked.withColumnRenamed("__g", group_col), group_col, "left")
        .select(
            group_col,
            "n_docs",
            "n_target",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            "ids_md5",
        )
    )


def stratified_sample_oracle_sql(
    total_n: int,
    table: str = "documents",
    group_col: str = "source",
    id_expr: str = "doc_id",
    seed: str = "strat-v1",
) -> str:
    """DuckDB mirror of :func:`stratified_sample_exact` — identical integer
    allocation and hash-order selection (global rank equals the bucketed
    rank by construction, so the mirror uses the plain per-stratum
    row_number)."""
    h = f"substr(md5('{seed}|' || {id_expr}), 1, 8)"
    return f"""
    WITH c AS (
      SELECT {group_col}, count(*) AS n_docs FROM {table}
      WHERE {group_col} IS NOT NULL GROUP BY 1),
    t AS (SELECT sum(n_docs) AS N FROM c),
    seats AS (
      SELECT {group_col}, n_docs,
             ({total_n} * n_docs) // N AS base,
             ({total_n} * n_docs) % N AS rem, N
      FROM c, t),
    alloc AS (
      SELECT {group_col}, n_docs,
             CAST(least(n_docs, base + CASE WHEN
               row_number() OVER (ORDER BY rem DESC, {group_col} ASC)
               <= least({total_n}, N) - sum(base) OVER ()
             THEN 1 ELSE 0 END) AS BIGINT) AS n_target
      FROM seats),
    ranked AS (
      SELECT {group_col}, {id_expr} AS id,
             row_number() OVER (PARTITION BY {group_col}
                                ORDER BY {h}, {id_expr}) AS grank
      FROM {table}),
    picked AS (
      SELECT r.{group_col}, count(*) AS n_sampled,
             md5(string_agg(r.id::VARCHAR, ',' ORDER BY r.id)) AS ids_md5
      FROM ranked r JOIN alloc a USING ({group_col})
      WHERE r.grank <= a.n_target
      GROUP BY 1)
    SELECT a.{group_col}, a.n_docs, a.n_target,
           coalesce(p.n_sampled, 0) AS n_sampled, p.ids_md5
    FROM alloc a LEFT JOIN picked p USING ({group_col})
    """


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "wsample-v1",
) -> DataFrame:
    """Importance sampling: min(k, group size) rows per group, inclusion
    probability increasing with INTEGER ``weight_col`` (priority sampling:
    order by hash/weight ascending — a weight-w row is ~w times likelier to
    make the cut than a weight-1 row).

    Engine-portable by construction: the md5 bucket is an exact 32-bit
    integer, the weight is an integer, and their quotient as an IEEE double
    divide is correctly rounded — so both engines order rows identically,
    with (priority, id) tie-breaks making equal quotients deterministic.
    The standard A-ES form (u^(1/w)) needs pow/log — libm calls whose last
    ulp varies per build — which is why the priority form is used instead.
    Rows with NULL or non-positive weight are excluded (they have no
    well-defined priority)."""
    h = F.conv(_hash8(seed, F.col(id_col)), 16, 10).cast("long")
    priority = h.cast("double") / F.col(weight_col).cast("double")
    w = Window.partitionBy(*group_cols).orderBy(
        priority.asc(), F.col(id_col).asc()
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def weighted_sample_oracle_sql(
    select_cols: str,
    k: int,
    weight_expr: str,
    table: str = "documents",
    group_col: str = "source",
    id_expr: str = "doc_id",
    seed: str = "wsample-v1",
) -> str:
    """DuckDB mirror of :func:`weighted_sample_per_group`."""
    h = f"('0x' || substr(md5('{seed}|' || {id_expr}), 1, 8))::BIGINT"
    return f"""
    SELECT {select_cols} FROM (
      SELECT *, row_number() OVER (
               PARTITION BY {group_col}
               ORDER BY CAST({h} AS DOUBLE) / CAST({weight_expr} AS DOUBLE) ASC,
                        {id_expr} ASC) AS rn
      FROM {table}
      WHERE ({weight_expr}) IS NOT NULL AND ({weight_expr}) > 0)
    WHERE rn <= {k}
    """


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    seed: str = "split-v1",
    weights: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    out_col: str = "split",
) -> DataFrame:
    """Cluster-aware train/val/test assignment: near-duplicate documents
    NEVER straddle a split boundary.

    :func:`deterministic_split` hashes each document independently, so the
    two sides of a near-dup pair land in train and test with probability
    ``2·p_train·p_test`` — the classic eval-contamination leak (a held-out
    document whose 0.95-Jaccard twin was trained on is not held out).
    Here the candidate ``pairs`` (``id_a``/``id_b`` — LSH candidates or
    verified near-dups) are resolved to connected components and every
    member inherits the split of its cluster CANONICAL id: one hash
    decision per cluster, so whole duplicate families move together.
    Returns ``(doc_id, canonical_id, split)`` covering the whole corpus
    (singletons hash their own id, making this a strict superset of
    :func:`deterministic_split` semantics).

    Scale shape: adds nothing beyond cluster resolution itself (driver
    union-find below the edge threshold, iterative min-label propagation
    above — ``dedup.resolve_duplicate_clusters``); the split is a per-row
    expression on the resolved mapping. Deterministic in (seed, canonical),
    independent of partitioning.
    """
    from .dedup import resolve_duplicate_clusters

    ids = df.select(F.col(id_col).alias("id"))
    clusters = resolve_duplicate_clusters(pairs, corpus_ids=ids)
    return clusters.withColumn(
        out_col, split_col(F.col("canonical_id"), seed, weights)
    )


def leakage_safe_split_oracle_sql(
    cluster_sql: str,
    seed: str = "split-v1",
    weights: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    out_col: str = "split",
) -> str:
    """DuckDB mirror of :func:`leakage_safe_split`: wraps a cluster oracle
    (``doc_id``, ``canonical_id`` — e.g. ``dedup.cluster_oracle_sql()``'s
    recursive-CTE closure) with the bit-identical split CASE expression on
    the canonical id."""
    case = split_case_sql("canonical_id", seed, weights)
    return f"""
    SELECT doc_id, canonical_id, {case} AS {out_col}
    FROM ({cluster_sql})
    """
