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
  (growth/RCA/rate), non-decomposable aggregators (grouped median, exact
  distinct counts, custom templates, fk-grain averages), cuts on levels
  absent from the grain, differing default-member implicit cuts — falls
  through to the fact-table ``PlanBuilder`` path untouched.
- **Approximate-distinct tier (opt-in).** ``materialize(sketch_p=...)``
  stores ApproxDistinctCount measures as per-group HLL register datasets;
  element-wise register max is associative, so serving at any coarser
  grain (and append-only refresh) reproduces the direct fact-side sketch
  BIT-identically. The estimate is the package's oracle-able HLL
  (``operators.sketch``), not approx_count_distinct's engine-private
  HLL++ — see the MaterializedGrain field docs for the contract.

Self-describing on disk: ``{path}/partials`` (parquet, parquet-safe column
tokens) + ``{path}/meta`` (single-row parquet with the real column names,
dtypes, grain definition) — ``load_grain`` re-registers an existing rollup
in a fresh process, mirroring ``operators/ann_index``'s persistent-index
contract.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query.model import LevelName, Query
from ..schema.aggregator import (
    ApproxDistinctCount,
    Average,
    BinnedQuantile,
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
            # fixed-size array partials (per-bin count/min/max) merge
            # exactly at any coarser grain — see _merge_cols
            BinnedQuantile,
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
    n_rows: int  # rollup cardinality — match() prefers the smallest cover
    # approximate-distinct tier (opt-in via materialize(sketch_p=...)):
    # ApproxDistinctCount measures materialized as per-group HLL register
    # datasets ({path}/hll_<i>). Register MAX is associative, so rollup-
    # served registers are bit-identical to direct registers at any coarser
    # grain — the ESTIMATE is exactly stable across serving paths. It is
    # NOT the engine-private HLL++ of approx_count_distinct, so a
    # sketch-served value differs from the fact path's approx value within
    # the same rsd-class error; materializing sketches is the explicit
    # opt-in to that contract.
    sketch_measures: list[str] = field(default_factory=list)
    sketch_p: int = 0


def _safe_names(columns: list[str]) -> list[str]:
    # parquet rejects " ,;{}()\n\t=" in field names; engine aliases carry
    # spaces ("Extended Price__num"). Positional tokens round-trip anything.
    return [f"c{i}" for i in range(len(columns))]


def _implicit_sig(builder, cube, query: Query) -> str:
    cuts = builder._implicit_cuts(cube, query)
    return ";".join(
        sorted(f"{c.level_name}|{','.join(map(str, c.members))}" for c in cuts)
    )


def _merge_cols(measure, avg_grain: str) -> list[Column]:
    """Partial-PRESERVING merge of pass-1 columns — ``pass2_col`` without the
    final fold, so merged rollup rows keep the exact pass-1 schema (decimal
    sums stay decimal, (num,cnt) pairs stay pairs) and remain serveable.
    Every pass-1 partial is a sum except min/max, which merge as min/max;
    deletes are NOT expressible (min/max can't retract) — refresh is
    append-only by contract."""
    agg = measure.aggregator
    n = measure.name
    if isinstance(agg, Max):
        return [F.max(n).alias(n)]
    if isinstance(agg, Min):
        return [F.min(n).alias(n)]
    if isinstance(agg, Average) and avg_grain != "fk":
        names = [f"{n}__num", f"{n}__cnt"]
    elif isinstance(agg, WeightedAverage):
        names = [f"{n}__num", f"{n}__den"]
    elif isinstance(agg, Moe):
        names = [f"{n}__sub"]
    elif isinstance(agg, ReplicateWeightMoe):
        names = [f"{n}__p"] + [
            f"{n}__s{i}" for i in range(len(agg.secondary_columns))
        ]
    elif isinstance(agg, WeightedAverageMoe):
        names = [f"{n}__pnum", f"{n}__pden"]
        for i in range(len(agg.secondary_weight_columns)):
            names += [f"{n}__snum{i}", f"{n}__sden{i}"]
    elif isinstance(agg, BinnedQuantile):
        # elementwise array merge: counts add, bounds widen — rebuilt as
        # arrays so merged rollup rows keep the exact pass-1 schema
        nb = len(agg.boundaries) + 1
        return [
            F.array(
                *[F.sum(F.element_at(F.col(f"{n}__bc"), j + 1)) for j in range(nb)]
            ).alias(f"{n}__bc"),
            F.array(
                *[F.min(F.element_at(F.col(f"{n}__bmin"), j + 1)) for j in range(nb)]
            ).alias(f"{n}__bmin"),
            F.array(
                *[F.max(F.element_at(F.col(f"{n}__bmax"), j + 1)) for j in range(nb)]
            ).alias(f"{n}__bmax"),
        ]
    elif isinstance(agg, (Sum, Count, WeightedSum)):
        names = [n]
    else:  # same gate as _decomposable — unreachable via materialize()
        raise ValueError(f"non-mergeable aggregator {agg!r}")
    return [F.sum(c).alias(c) for c in names]


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
        sketch_p: int | None = None,
    ) -> MaterializedGrain:
        """Aggregate the cube at ``drilldowns`` grain storing pass-1 partials,
        written partitioned by ``partition_by`` (a drill unique-name whose KEY
        column becomes the partition directory; default: first drilldown).
        One fact-table scan, ever; every served query afterwards reads only
        this rollup.

        ``sketch_p``: opt-in approximate-distinct tier — ApproxDistinctCount
        measures in ``measures`` are materialized as per-group HLL register
        datasets (``2^sketch_p`` registers; ``operators.sketch``) instead of
        being rejected as non-decomposable. See the MaterializedGrain field
        docs for the serving contract."""
        b = self.builder
        cube = b.schema.cube(cube_name)
        sketch_meas = (
            [
                m
                for m in measures
                if isinstance(cube.measure(m).aggregator, ApproxDistinctCount)
            ]
            if sketch_p
            else []
        )
        part_meas = [m for m in measures if m not in sketch_meas]
        if not part_meas:
            raise ValueError(
                "aggregate navigation needs at least one decomposable "
                "measure in the grain (the sketch tier rides alongside)"
            )
        q, group_cols, joined, mea_objs = self._grain_rows(
            cube_name, drilldowns, part_meas, parents
        )
        bad = [m.name for m in mea_objs if not _decomposable(m, b.avg_grain)]
        if bad:
            raise ValueError(
                f"measures not decomposable for aggregate navigation: {bad}"
            )
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

        from ..operators.sketch import hll_grouped_registers

        for i, mname in enumerate(sketch_meas):
            # same `joined` grain rows as the partials — Spark re-executes
            # the scan per action, but the PLAN is shared (and at 100 TB a
            # build is a one-off; serving never touches the fact again)
            regs = hll_grouped_registers(
                joined, group_cols, cube.measure(mname).column, sketch_p
            )
            regs_out = regs.select(
                *[F.col(c).alias(safe[c]) for c in group_cols], "j", "r"
            )
            regs_out.repartition(*[safe[c] for c in part_cols]).write.mode(
                mode
            ).partitionBy(*[safe[c] for c in part_cols]).parquet(
                f"{path}/hll_{i}"
            )

        grain = MaterializedGrain(
            cube=cube_name,
            drilldowns=list(drilldowns),
            measures=list(part_meas),
            path=path,
            columns=columns,
            dtypes=dtypes,
            partition_by=part_cols,
            implicit_sig=_implicit_sig(b, cube, q),
            parents=parents,
            # parquet metadata count — no data scan; lets match() rank grains
            n_rows=b.spark.read.parquet(f"{path}/partials").count(),
            sketch_measures=list(sketch_meas),
            sketch_p=int(sketch_p or 0),
        )
        self._write_meta(b.spark, grain, mode)
        self.grains.append(grain)
        return grain


    def _build_partials(
        self,
        cube_name: str,
        drilldowns: list[str],
        measures: list[str],
        parents: bool,
        fact: DataFrame | None = None,
    ):
        """The grain pipeline shared by materialize (full fact) and refresh
        (an increment): projection + dim joins + pass-1 partial aggregation.
        Returns (query, grain group aliases, partials DataFrame)."""
        q, group_cols, joined, mea_objs = self._grain_rows(
            cube_name, drilldowns, measures, parents, fact
        )
        b = self.builder
        bad = [m.name for m in mea_objs if not _decomposable(m, b.avg_grain)]
        if bad:
            raise ValueError(
                f"measures not decomposable for aggregate navigation: {bad}"
            )
        p1 = [c for m in mea_objs for c in agg_mod.pass1_cols(m, b.avg_grain)]
        pre = joined.groupBy(*[F.col(c) for c in group_cols]).agg(*p1)
        return q, group_cols, pre

    def _grain_rows(
        self,
        cube_name: str,
        drilldowns: list[str],
        measures: list[str],
        parents: bool,
        fact: DataFrame | None = None,
    ):
        """Pre-aggregation grain pipeline: projection + implicit cuts + dim
        joins. Shared by the partial builder and the HLL sketch builder."""
        b = self.builder
        cube = b.schema.cube(cube_name)
        params: dict = {"drilldowns": drilldowns, "measures": measures}
        if parents:
            params["parents"] = "true"
        q = Query.from_params(params)
        b._validate(cube, q)
        specs = b._drill_specs(cube, q)
        mea_objs = [cube.measure(m) for m in q.measures]
        if fact is None:
            fact = b.registry.load(cube.table)
        fact = b._apply_cuts(cube, q, fact)  # implicit default-member cuts
        for alias, col in b._degenerate_projection(specs).items():
            fact = fact.withColumn(alias, col)
        joined = b._join_dims(specs, fact)
        group_cols = b._group_aliases(specs)
        return q, group_cols, joined, mea_objs

    def refresh(self, grain: MaterializedGrain, new_fact: DataFrame) -> list:
        """APPEND-ONLY incremental maintenance: fold new fact rows into the
        rollup, rewriting ONLY the partition directories the increment
        touches (Spark dynamic partition overwrite). The 100 TB shape: a
        daily fact arrival re-aggregates one day's rows and rewrites the
        affected Year (or whatever the partition drill is) directories —
        the rest of the rollup is untouched bytes. Deletes/corrections are
        not expressible (min/max partials can't retract); rebuild with
        :meth:`materialize` for those. Returns the affected partition values.

        Exactness: merged partials keep the pass-1 schema via
        :func:`_merge_cols` (decimal sums stay decimal), so a refreshed
        rollup serves bit-identically to one materialized from the full
        fact — pinned by ``tests/test_aggnav.py``."""
        b = self.builder
        cube = b.schema.cube(grain.cube)
        _, group_cols, new_partials = self._build_partials(
            grain.cube, grain.drilldowns, grain.measures, grain.parents, new_fact
        )
        # normalize column order to the grain's written layout; materialize
        # once (bounded: increment grain cardinality) — the affected-value
        # collect below and the merge both consume it, and a lazy frame
        # would re-run the increment's join+aggregation per action
        new_partials = new_partials.select(
            *[F.col(c) for c in grain.columns]
        ).localCheckpoint(eager=False)

        part_col = grain.partition_by[0]
        # bounded collect: one row per AFFECTED partition value (partition
        # drills are low-cardinality by design — see rollup_sink notes)
        affected = [
            r[0] for r in new_partials.select(part_col).distinct().collect()
        ]
        if not affected:
            return []

        existing = self._read_partials(b.spark, grain).filter(
            F.col(part_col).isin(affected)
        )
        mea_objs = [cube.measure(m) for m in grain.measures]
        merged = (
            existing.unionByName(new_partials)
            .groupBy(*[F.col(c) for c in group_cols])
            .agg(*[c for m in mea_objs for c in _merge_cols(m, b.avg_grain)])
            .select(*[F.col(c) for c in grain.columns])
        )
        # break lineage before overwriting the path being read (bounded:
        # only the affected partitions' rollup rows — grain cardinality)
        merged = merged.localCheckpoint(eager=True)

        safe = dict(zip(grain.columns, _safe_names(grain.columns)))
        out = merged.select(*[F.col(c).alias(safe[c]) for c in grain.columns])
        spark = b.spark
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            out.repartition(safe[part_col]).write.mode("overwrite").partitionBy(
                safe[part_col]
            ).parquet(f"{grain.path}/partials")
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        # sketch tier: merge increment registers into the affected
        # partitions by element-wise max — the merge is EXACT (registers of
        # a union are the max of the parts), so a refreshed sketch serves
        # identically to one built from the full fact
        if grain.sketch_measures:
            from ..operators.sketch import hll_grouped_registers

            safe_map = dict(zip(grain.columns, _safe_names(grain.columns)))
            _, gcols, joined_inc, _ = self._grain_rows(
                grain.cube,
                grain.drilldowns,
                grain.measures,
                grain.parents,
                new_fact,
            )
            for i, mname in enumerate(grain.sketch_measures):
                inc = hll_grouped_registers(
                    joined_inc,
                    group_cols,
                    cube.measure(mname).column,
                    grain.sketch_p,
                )
                existing_regs = self._read_sketch_raw(spark, grain, i).filter(
                    F.col(part_col).isin(affected)
                )
                merged_regs = (
                    existing_regs.unionByName(
                        inc.select(*[F.col(c) for c in group_cols], "j", "r")
                    )
                    .groupBy(*[F.col(c) for c in group_cols], F.col("j"))
                    .agg(F.max("r").alias("r"))
                    .localCheckpoint(eager=True)
                )
                out_regs = merged_regs.select(
                    *[F.col(c).alias(safe_map[c]) for c in group_cols],
                    "j",
                    "r",
                )
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", "dynamic"
                )
                try:
                    out_regs.repartition(safe_map[part_col]).write.mode(
                        "overwrite"
                    ).partitionBy(safe_map[part_col]).parquet(
                        f"{grain.path}/hll_{i}"
                    )
                finally:
                    spark.conf.set(
                        "spark.sql.sources.partitionOverwriteMode", prev
                    )

        grain.n_rows = spark.read.parquet(f"{grain.path}/partials").count()
        self._write_meta(spark, grain, "overwrite")
        return affected

    def _read_sketch_raw(
        self, spark: SparkSession, g: MaterializedGrain, i: int
    ) -> DataFrame:
        """Register dataset with real group-column names/dtypes restored."""
        raw = spark.read.parquet(f"{g.path}/hll_{i}")
        sel = []
        for real, tok, dt in zip(g.columns, _safe_names(g.columns), g.dtypes):
            if tok in raw.columns:
                c = F.col(tok)
                if real in g.partition_by:
                    c = c.cast(dt)
                sel.append(c.alias(real))
        return raw.select(*sel, "j", "r")

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
                g.n_rows,
                g.sketch_measures,
                g.sketch_p,
            )
        ]
        from ..session import local_df

        local_df(
            spark,
            row,
            "cube string, drilldowns array<string>, measures array<string>,"
            " columns array<string>, dtypes array<string>,"
            " partition_by array<string>, implicit_sig string,"
            " parents boolean, n_rows long,"
            " sketch_measures array<string>, sketch_p long",
        ).coalesce(1).write.mode(mode).parquet(f"{g.path}/meta")

    def load_grain(self, spark: SparkSession, path: str) -> MaterializedGrain:
        """Re-register a rollup materialized by another process."""
        r = spark.read.parquet(f"{path}/meta").collect()[0]
        d = r.asDict()
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
            n_rows=r.n_rows,
            # metas written before the sketch tier lack these fields
            sketch_measures=list(d.get("sketch_measures") or []),
            sketch_p=int(d.get("sketch_p") or 0),
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
            # disjunctive cut groups (single-plan L5, r12): serve()'s
            # cut_filter applies only the conjunctive query.cuts — serving
            # a cut_groups query from a rollup would silently DROP the
            # OR-of-cuts filter (code-review r12 finding #1); the fact
            # path applies them correctly
            or query.cut_groups
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
        # ApproxDistinctCount rides the sketch tier (coverage checked per
        # grain below); every other non-decomposable aggregator falls back
        if any(
            not _decomposable(m, b.avg_grain)
            and not isinstance(m.aggregator, ApproxDistinctCount)
            for m in mea_objs
        ):
            return None
        approx_names = {
            m.name
            for m in mea_objs
            if isinstance(m.aggregator, ApproxDistinctCount)
        }
        exact_names = [m for m in query.measures if m not in approx_names]
        need = set(b._group_aliases(specs))
        cut_keys = []
        for cut in query.cuts:
            ref = b.resolve_level(cube, cut.level_name)
            cut_keys.append(level_key_alias(ref.level))
        # smallest covering rollup wins: fewer rows = less to rescan
        for g in sorted(self.grains, key=lambda g: g.n_rows):
            if g.cube != cube_name:
                continue
            have = set(g.columns)
            if not need <= have:
                continue
            if not set(exact_names) <= set(g.measures):
                continue
            if not approx_names <= set(g.sketch_measures):
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

        sketch_objs = [
            m for m in mea_objs if m.name in set(g.sketch_measures)
        ]
        exact_objs = [m for m in mea_objs if m.name not in set(g.sketch_measures)]

        def cut_filter(frame: DataFrame) -> DataFrame:
            for cut in query.cuts:
                ref = b.resolve_level(cube, cut.level_name)
                key = level_key_alias(ref.level)
                frame = frame.filter(b._cut_predicate(ref.level, cut, key))
            return frame

        df = cut_filter(self._read_partials(b.spark, g))

        group_cols = b._group_aliases(specs)
        p2 = [agg_mod.pass2_col(m, b.avg_grain) for m in exact_objs]
        if not p2:
            # all-sketch query: the base frame is the grain's group rows
            df = df.select(*[F.col(c) for c in group_cols]).distinct()
        elif group_cols:
            df = df.groupBy(*[F.col(c) for c in group_cols]).agg(*p2)
        else:
            df = df.agg(*p2)

        for m in sketch_objs:
            est = self._serve_sketch(g, m, group_cols, cut_filter)
            if group_cols:
                df = df.join(est, group_cols, "left").withColumn(
                    m.name, F.coalesce(F.col(m.name), F.lit(0))
                )
            else:
                df = df.crossJoin(F.broadcast(est))
        # restore the query's measure column order after the sketch joins
        df = df.select(
            *[F.col(c) for c in group_cols],
            *[F.col(m.name) for m in mea_objs],
        )
        return b._apply_options(cube, query, specs, df)

    def _serve_sketch(
        self, g: MaterializedGrain, measure, group_cols: list[str], cut_filter
    ) -> DataFrame:
        """Estimate one ApproxDistinctCount measure at the requested grain
        from the grain's register dataset: cut-filter, merge registers by
        element-wise max (exact — see operators.sketch), then the HLL
        estimate. Reads only {path}/hll_<i>; cuts on the partition drill
        prune directories exactly like the partials."""
        from ..operators.sketch import hll_estimate_grouped, hll_merge_grouped

        b = self.builder
        i = list(g.sketch_measures).index(measure.name)
        regs = cut_filter(self._read_sketch_raw(b.spark, g, i))
        merged = hll_merge_grouped(regs, group_cols)
        return hll_estimate_grouped(
            merged, group_cols, g.sketch_p, out_col=measure.name
        )

    def dataframe(self, cube_name: str, query: Query) -> DataFrame:
        """Serve from a rollup when possible, else the fact-table plan."""
        served = self.serve(cube_name, query)
        if served is not None:
            return served
        return self.builder.dataframe(cube_name, query)
