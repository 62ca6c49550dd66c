"""Skew mitigation: salted aggregation and salted broadcast-free joins.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin``) handles moderate
skew automatically; these helpers cover the pathological cases — a handful of
keys owning a large fraction of 100 TB — where pre-splitting the key space is
the only reliable fix.

Salts are DERIVED (hash of a value column, mod n), not random: deterministic
across task retries and across engines, so salted plans stay reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (partial expr builder, final expr builder) per decomposable aggregate
_SALT_AGGS = {
    "sum": (lambda c: F.sum(c), lambda c: F.sum(c)),
    "count": (lambda c: F.count(c), lambda c: F.sum(c)),
    "max": (lambda c: F.max(c), lambda c: F.max(c)),
    "min": (lambda c: F.min(c), lambda c: F.min(c)),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    salt_from: str,
    num_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation with a derived salt: stage 1 groups by
    (keys, salt) spreading each hot key over ``num_salts`` reducers; stage 2
    combines the partials. ``aggs`` = [(fn, column, alias)] with fn in
    sum/count/max/min. Equivalent to a plain groupBy for these decomposable
    aggregates.

    Note: Spark's own partial aggregation already handles map-side skew; the
    salt matters when a single reducer key still overflows (extreme skew) or
    when the upstream is already partitioned pathologically.
    """
    for fn, _, _ in aggs:
        if fn not in _SALT_AGGS:
            raise ValueError(f"non-decomposable aggregate {fn!r} cannot be salted")
    salt = F.pmod(F.hash(F.col(salt_from)), F.lit(num_salts)).alias("__salt")
    stage1 = df.groupBy(*[F.col(k) for k in keys], salt).agg(
        *[_SALT_AGGS[fn][0](F.col(col)).alias(alias) for fn, col, alias in aggs]
    )
    return stage1.groupBy(*[F.col(k) for k in keys]).agg(
        *[_SALT_AGGS[fn][1](F.col(alias)).alias(alias) for fn, _, alias in aggs]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt_from: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s join key is hot: the skewed side gets a
    derived salt, the other side is exploded ×``num_salts``, and the join runs
    on (key, salt) — each hot key spreads over ``num_salts`` tasks. Use when
    ``other`` is too big to broadcast but much smaller than ``skewed``."""
    salted = skewed.withColumn(
        "__salt", F.pmod(F.hash(F.col(salt_from)), F.lit(num_salts))
    )
    replicated = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = salted.join(replicated, [on, "__salt"], how)
    return out.drop("__salt")
