"""Aggregate navigation: serve coarse OLAP queries from materialized rollups.

The classic agg-table pattern (Mondrian aggregate tables; the mondrian
lineage the reference descends from — mondrian-tesseract.md — but which
tesseract itself never implemented: every reference query re-scans the fact
table through ClickHouse). At 100 TB the fact scan is the entire cost of a
dashboard query, so the standard warehouse move is to materialize ONE rollup
at a mid-grain (say Year × Brand × Region) and answer every coarser query
(Year; Year × Region; …) from it — GBs instead of TBs, with partition
pruning on top.

Spark-first design:

- **Materialize = pass-1 partials, not final values.** The rollup stores the
  engine's existing two-phase pass-1 columns (``aggregators.pass1_cols``):
  decimal sums for exact-mode measures, (num, cnt) pairs for averages,
  sum-of-squares for MOE. Serving re-aggregates with ``pass2_col`` — the
  same composition already proven bit-equal to single-pass results by the
  two-phase entries — so a served result is BIT-IDENTICAL to running the
  query against the fact table, decimal associativity doing the work.
  (Measures WITHOUT ``exact_scale`` sum plain doubles; re-aggregating their
  partials can shift the last ulp — the same non-associativity any plan
  reshape (AQE, semi-join pushdown) already exhibits on the fact path, per
  ``aggregators._exact_sum``. Declare ``exact_scale`` where bit-stability
  across serving paths matters.)
- **Partition pruning.** The rollup is written partitioned by a chosen
  low-cardinality drill column; a cut on that level becomes a directory
  prune (``PartitionFilters``), not a scan+filter.
- **Ancestor serving.** Materializing with ``parents=True`` stores each
  drill's ancestor columns, so queries at ANY ancestor grain (Region from a
  Nation rollup) are served too — the alias-subset check makes this
  automatic, no hierarchy walk at serve time.
- **Conservative fallback.** Anything not provably equivalent — calculations
  (growth/RCA/rate), non-decomposable aggregators (grouped median, distinct
  counts, custom templates, fk-grain averages), cuts on levels absent from
  the grain, differing default-member implicit cuts — falls through to the
  fact-table ``PlanBuilder`` path untouched.

Self-describing on disk: ``{path}/partials`` (parquet, parquet-safe column
tokens) + ``{path}/meta`` (single-row parquet with the real column names,
dtypes, grain definition) — ``load_grain`` re-registers an existing rollup
in a fresh process, mirroring ``operators/ann_index``'s persistent-index
contract.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query.model import LevelName, Query
from ..schema.aggregator import (
    Average,
    Count,
    Max,
    Min,
    Moe,
    ReplicateWeightMoe,
    Sum,
    WeightedAverage,
    WeightedAverageMoe,
    WeightedSum,
)
from . import aggregators as agg_mod
from .builder import level_key_alias


def _decomposable(measure, avg_grain: str) -> bool:
    """True when pass-1 partials for this aggregator re-aggregate correctly
    at ANY coarser grain. Grouped median (median-of-medians ≠ median),
    distinct counts (not mergeable without sketch state), custom templates
    (arbitrary SQL), and fk-grain averages (the reference's
    average-of-averages is grain-dependent, aggregator.rs:163) are not."""
    agg = measure.aggregator
    if isinstance(agg, Average):
        return avg_grain != "fk"
    return isinstance(
        agg,
        (
            Sum,
            Count,
            Max,
            Min,
            WeightedSum,
            WeightedAverage,
            Moe,
            ReplicateWeightMoe,
            WeightedAverageMoe,
        ),
    )


@dataclass
class MaterializedGrain:
    cube: str
    drilldowns: list[str]
    measures: list[str]
    path: str
    columns: list[str]  # real (engine-alias) column names, in written order
    dtypes: list[str]  # matching Spark dtype strings
    partition_by: list[str]  # real names of partition columns
    implicit_sig: str  # default-member cut signature at materialize time
    parents: bool


def _safe_names(columns: list[str]) -> list[str]:
    # parquet rejects " ,;{}()\n\t=" in field names; engine aliases carry
    # spaces ("Extended Price__num"). Positional tokens round-trip anything.
    return [f"c{i}" for i in range(len(columns))]


def _implicit_sig(builder, cube, query: Query) -> str:
    cuts = builder._implicit_cuts(cube, query)
    return ";".join(
        sorted(f"{c.level_name}|{','.join(map(str, c.members))}" for c in cuts)
    )


class AggregateNavigator:
    """Routes queries to a compatible materialized grain, else to the
    fact-table builder. Register grains via :meth:`materialize` (build) or
    :meth:`load_grain` (existing rollup)."""

    def __init__(self, builder):
        self.builder = builder
        self.grains: list[MaterializedGrain] = []

    # ---------------- build side ----------------

    def materialize(
        self,
        cube_name: str,
        drilldowns: list[str],
        measures: list[str],
        path: str,
        partition_by: str | None = None,
        parents: bool = True,
        mode: str = "overwrite",
    ) -> MaterializedGrain:
        """Aggregate the cube at ``drilldowns`` grain storing pass-1 partials,
        written partitioned by ``partition_by`` (a drill unique-name whose KEY
        column becomes the partition directory; default: first drilldown).
        One fact-table scan, ever; every served query afterwards reads only
        this rollup."""
        b = self.builder
        cube = b.schema.cube(cube_name)
        params: dict = {"drilldowns": drilldowns, "measures": measures}
        if parents:
            params["parents"] = "true"
        q = Query.from_params(params)
        b._validate(cube, q)
        specs = b._drill_specs(cube, q)
        mea_objs = [cube.measure(m) for m in q.measures]
        bad = [m.name for m in mea_objs if not _decomposable(m, b.avg_grain)]
        if bad:
            raise ValueError(
                f"measures not decomposable for aggregate navigation: {bad}"
            )

        fact = b.registry.load(cube.table)
        fact = b._apply_cuts(cube, q, fact)  # implicit default-member cuts
        for alias, col in b._degenerate_projection(specs).items():
            fact = fact.withColumn(alias, col)
        joined = b._join_dims(specs, fact)
        group_cols = b._group_aliases(specs)
        p1 = [c for m in mea_objs for c in agg_mod.pass1_cols(m, b.avg_grain)]
        pre = joined.groupBy(*[F.col(c) for c in group_cols]).agg(*p1)

        columns = pre.columns
        dtypes = [dict(pre.dtypes)[c] for c in columns]
        safe = dict(zip(columns, _safe_names(columns)))

        part_ref = (
            b.resolve_level(cube, LevelName.parse(partition_by))
            if partition_by
            else None
        )
        part_cols = (
            [level_key_alias(part_ref.level)] if part_ref else [group_cols[0]]
        )
        missing = [c for c in part_cols if c not in columns]
        if missing:
            raise ValueError(f"partition column(s) not in grain output: {missing}")

        out = pre.select(*[F.col(c).alias(safe[c]) for c in columns])
        out.repartition(*[safe[c] for c in part_cols]).write.mode(mode).partitionBy(
            *[safe[c] for c in part_cols]
        ).parquet(f"{path}/partials")

        grain = MaterializedGrain(
            cube=cube_name,
            drilldowns=list(drilldowns),
            measures=list(measures),
            path=path,
            columns=columns,
            dtypes=dtypes,
            partition_by=part_cols,
            implicit_sig=_implicit_sig(b, cube, q),
            parents=parents,
        )
        self._write_meta(fact.sparkSession, grain, mode)
        self.grains.append(grain)
        return grain

    @staticmethod
    def _write_meta(spark: SparkSession, g: MaterializedGrain, mode: str) -> None:
        row = [
            (
                g.cube,
                g.drilldowns,
                g.measures,
                g.columns,
                g.dtypes,
                g.partition_by,
                g.implicit_sig,
                g.parents,
            )
        ]
        spark.createDataFrame(
            row,
            "cube string, drilldowns array<string>, measures array<string>,"
            " columns array<string>, dtypes array<string>,"
            " partition_by array<string>, implicit_sig string, parents boolean",
        ).coalesce(1).write.mode(mode).parquet(f"{g.path}/meta")

    def load_grain(self, spark: SparkSession, path: str) -> MaterializedGrain:
        """Re-register a rollup materialized by another process."""
        r = spark.read.parquet(f"{path}/meta").collect()[0]
        grain = MaterializedGrain(
            cube=r.cube,
            drilldowns=list(r.drilldowns),
            measures=list(r.measures),
            path=path,
            columns=list(r.columns),
            dtypes=list(r.dtypes),
            partition_by=list(r.partition_by),
            implicit_sig=r.implicit_sig,
            parents=r.parents,
        )
        self.grains.append(grain)
        return grain

    # ---------------- serve side ----------------

    def _read_partials(self, spark: SparkSession, g: MaterializedGrain) -> DataFrame:
        """Read the rollup with real column names/dtypes restored. Partition
        columns come back via directory inference; the recorded dtype cast
        normalizes them (keys are written via ``str()`` of the key value, so
        the cast is lossless for the int/string keys levels carry)."""
        df = spark.read.parquet(f"{g.path}/partials")
        safe = _safe_names(g.columns)
        sel = []
        for real, tok, dt in zip(g.columns, safe, g.dtypes):
            c = F.col(tok)
            if real in g.partition_by:
                c = c.cast(dt)
            sel.append(c.alias(real))
        return df.select(*sel)

    def match(self, cube_name: str, query: Query) -> MaterializedGrain | None:
        """First registered grain that can answer ``query`` exactly."""
        b = self.builder
        cube = b.schema.cube(cube_name)
        if (
            query.rca is not None
            or query.growth is not None
            or query.rate is not None
            or query.conditional_cuts
        ):
            return None
        if any(not c.members for c in query.cuts):
            return None  # memberless semi-join markers need the fact table
        try:
            query = b._with_calc_drills(cube, query)
            specs = b._drill_specs(cube, query)
        except Exception:
            return None
        mea_objs = [cube.measure(m) for m in query.measures]
        if any(not _decomposable(m, b.avg_grain) for m in mea_objs):
            return None
        need = set(b._group_aliases(specs))
        cut_keys = []
        for cut in query.cuts:
            ref = b.resolve_level(cube, cut.level_name)
            cut_keys.append(level_key_alias(ref.level))
        for g in self.grains:
            if g.cube != cube_name:
                continue
            have = set(g.columns)
            if not need <= have:
                continue
            if not set(query.measures) <= set(g.measures):
                continue
            if any(k not in have for k in cut_keys):
                continue
            if _implicit_sig(b, cube, query) != g.implicit_sig:
                continue
            return g
        return None

    def serve(self, cube_name: str, query: Query) -> DataFrame | None:
        """Answer ``query`` from a matching rollup, or None. The plan reads
        ONLY ``{path}/partials`` — never the fact table — and cuts on the
        partition drill prune directories."""
        g = self.match(cube_name, query)
        if g is None:
            return None
        b = self.builder
        cube = b.schema.cube(cube_name)
        query = b._with_calc_drills(cube, query)
        b._validate(cube, query)
        specs = b._drill_specs(cube, query)
        mea_objs = [cube.measure(m) for m in query.measures]

        df = self._read_partials(b.spark, g)
        for cut in query.cuts:
            ref = b.resolve_level(cube, cut.level_name)
            key = level_key_alias(ref.level)
            df = df.filter(b._cut_predicate(ref.level, cut, key))

        group_cols = b._group_aliases(specs)
        p2 = [agg_mod.pass2_col(m, b.avg_grain) for m in mea_objs]
        if group_cols:
            df = df.groupBy(*[F.col(c) for c in group_cols]).agg(*p2)
        else:
            df = df.agg(*p2)
        return b._apply_options(cube, query, specs, df)

    def dataframe(self, cube_name: str, query: Query) -> DataFrame:
        """Serve from a rollup when possible, else the fact-table plan."""
        served = self.serve(cube_name, query)
        if served is not None:
            return served
        return self.builder.dataframe(cube_name, query)
