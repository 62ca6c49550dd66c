"""PlanBuilder: compile (cube schema, Query) → a PySpark DataFrame plan.

This replaces the reference's SQL-string generation
(tesseract-core/src/lib.rs:390-793 resolution + tesseract-clickhouse/src/sql/*
codegen) with declarative DataFrame construction; Catalyst supplies predicate
pushdown, column pruning, join selection, and partial aggregation (SURVEY.md §4).

Plan shape, scale-first:

- default: cuts → filters/semi-joins on the fact scan, broadcast inner joins to
  dimension tables, ONE ``groupBy`` at drill grain. With broadcast dims this is a
  single shuffle; partial (map-side) aggregation is Catalyst's HashAggregate
  partial→final.
- two-phase mode (``basic_grouped_median`` present, or ``avg_grain="fk"``
  reference-parity): explicit pre-aggregation at fact/foreign-key grain before
  the dim joins, mirroring the reference plan (primary_agg.rs:93-121, 162-167,
  215-231). Costs one extra shuffle, required for the non-decomposable grain
  semantics (SURVEY.md §2.4 note).

Cuts on non-fact tables become broadcast ``left_semi`` joins *before*
aggregation — the reference's semi-join pushdown (primary_agg.rs:123-160); when
the cut level is the hierarchy's primary key the semi-join collapses to a direct
``fk IN (...)`` filter on the fact scan (pushed to parquet by Catalyst).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query.model import (
    Calculation,
    Comparison,
    Cut,
    FilterQuery,
    LevelName,
    Mask,
    Query,
    SortDirection,
)
from ..schema.model import (
    Cube,
    Dimension,
    Hierarchy,
    Level,
    Measure,
    MemberType,
    Property,
    Schema,
)
from ..sources.registry import TableRegistry
from . import aggregators as agg_mod
from .calculations import apply_growth, apply_rate, apply_rca


class QueryValidationError(ValueError):
    pass


def level_key_alias(level: Level) -> str:
    """Header naming contract (lib.rs:1046-1202): levels with a name column emit
    an ``{Level} ID`` key column paired with a ``{Level}`` name column."""
    return f"{level.name} ID" if level.name_column else level.name


def level_name_alias(level: Level) -> str | None:
    return level.name if level.name_column else None


@dataclass
class ResolvedLevelRef:
    """A (dimension, hierarchy, level) triple resolved from a LevelName."""

    dim: Dimension
    hier: Hierarchy
    level: Level
    level_idx: int

    @property
    def degenerate(self) -> bool:
        return self.hier.is_degenerate()


@dataclass
class DrillSpec:
    """One drilldown's output columns: the level itself, ancestor levels when
    ``parents=true`` (lib.rs:977-1004), plus requested properties."""

    ref: ResolvedLevelRef
    levels: list[Level]  # parents-first chain ending at the drilled level
    properties: list[Property] = field(default_factory=list)
    #: level name → caption column substituting the level's name column
    #: (locale captions, lib.rs:917-960)
    captions: dict[str, str] = field(default_factory=dict)

    def name_source(self, lv: Level) -> str | None:
        if lv.name_column is None:
            return None
        return self.captions.get(lv.name, lv.name_column)

    def output_aliases(self) -> list[str]:
        out = []
        for lv in self.levels:
            out.append(level_key_alias(lv))
            if lv.name_column:
                out.append(level_name_alias(lv))
        out.extend(p.name for p in self.properties)
        return out


class PlanBuilder:
    def __init__(
        self,
        spark: SparkSession,
        schema: Schema,
        registry: TableRegistry,
        avg_grain: str = "flat",
    ):
        if avg_grain not in ("flat", "fk"):
            raise ValueError("avg_grain must be 'flat' or 'fk'")
        self.spark = spark
        self.schema = schema
        self.registry = registry
        self.avg_grain = avg_grain
        # plan cache (prepared-statement analog): building a query's
        # DataFrame costs ~0.1s of DRIVER-side py4j analysis, which under
        # 100 concurrent HTTP requests serializes on the GIL — repeated
        # dashboard shapes should not re-pay it. Freshness contract
        # (corrected r12 — measured, not assumed): repeat collects on a
        # cached plan REUSE its materialized AQE shuffle stages, so repeat
        # queries skip the scan+partial-aggregate (the steady-state serving
        # win) and would NOT see data rewritten on disk mid-generation.
        # That adds no staleness class beyond the registry's file-listing
        # memo, which already pins the scan until refresh_files()/flush:
        # any data change requires the generation bump, and the bump
        # invalidates every cached plan here. Keyed on the registry
        # generation so a swapped table (aggnav hist/fact swap, /flush
        # reload) invalidates plans built on the old frame.
        import threading
        from collections import OrderedDict

        self._plan_cache: OrderedDict[tuple, DataFrame] = OrderedDict()
        self._plan_cache_max = 256
        # serializes get→move_to_end and insert→evict: the individual dict
        # ops are GIL-atomic but the SEQUENCES are not — a hit racing a
        # concurrent eviction of the same (LRU-oldest) key would raise
        # KeyError out of dataframe() under server load (r11 review pass)
        self._plan_cache_lock = threading.Lock()
        # single-flight (r12, VERDICT r11 #3 cold-plan cliff): under a cold
        # 100-client burst several threads miss the plan cache on the SAME
        # key simultaneously and each pays the full ~190-py4j-roundtrip
        # build; one future per key makes duplicates wait instead of
        # rebuild (the probe's 100 requests span ~28 distinct plans — 3-4
        # redundant builds per plan otherwise)
        self._in_flight: dict[tuple, object] = {}
        # parameterized plan templates (r12, same verdict item): the
        # cut-INDEPENDENT subtree (fact scan + degenerate projection + dim
        # joins) is cached per drill shape, so 100 distinct cut literals on
        # one dashboard shape pay the join construction py4j cost once —
        # cuts are applied ABOVE the template and Catalyst pushes them back
        # below the inner joins to the scan (plan-shape tests pin that the
        # executed plans are unchanged)
        self._template_cache: OrderedDict[tuple, DataFrame] = OrderedDict()
        self._template_cache_max = 64
        # observability for the warm-path tests/probes (r15, VERDICT r14
        # next-round #7): counts template-cache hits/misses so a standing
        # test can assert a warmup-replayed shape serves a DIFFERENT cut
        # literal without a cold join-template build
        self.template_cache_hits = 0
        self.template_cache_misses = 0

    # ---------------- name resolution ----------------

    def resolve_level(self, cube: Cube, ln: LevelName) -> ResolvedLevelRef:
        dim = cube.dimension(ln.dimension)
        # 2-part shorthand sets hierarchy == dimension name (names.rs:56-62);
        # fall back to the dimension's default/single hierarchy when that name
        # doesn't literally exist.
        try:
            hier = dim.hierarchy(ln.hierarchy)
        except KeyError:
            if ln.hierarchy == ln.dimension:
                hier = dim.hierarchy(None)
            else:
                raise
        for i, lv in enumerate(hier.levels):
            if lv.name == ln.level:
                return ResolvedLevelRef(dim, hier, lv, i)
        raise QueryValidationError(
            f"level {ln.level!r} not found in {ln.dimension}.{hier.name}"
        )

    def _drill_specs(self, cube: Cube, query: Query) -> list[DrillSpec]:
        specs: list[DrillSpec] = []
        for ln in query.drilldowns:
            ref = self.resolve_level(cube, ln)
            if query.parents:
                levels = list(ref.hier.levels[: ref.level_idx + 1])
            else:
                levels = [ref.level]
            props = []
            for pln, pname in query.properties:
                pref = self.resolve_level(cube, pln)
                if (
                    pref.dim.name == ref.dim.name
                    and pref.hier.name == ref.hier.name
                    and pref.level.name == ref.level.name
                ):
                    match = [p for p in pref.level.properties if p.name == pname]
                    if not match:
                        raise QueryValidationError(
                            f"property {pname!r} not on level {pln.level!r}"
                        )
                    props.append(match[0])
            # caption substitution (lib.rs:917-960): a caption property's column
            # replaces its level's name column; with parents=true, captions on
            # ancestor levels of the same dimension also apply
            captions: dict[str, str] = {}
            for cln, cprop in query.captions:
                if query.parents:
                    if cln.dimension != ref.dim.name:
                        continue
                elif not (
                    cln.dimension == ref.dim.name and cln.level == ref.level.name
                ):
                    continue
                for lv in levels:
                    if lv.name == cln.level:
                        match = [p for p in lv.properties if p.name == cprop]
                        if not match:
                            raise QueryValidationError(
                                f"cannot find caption property {cprop!r} on {cln.level!r}"
                            )
                        captions[lv.name] = match[0].column
            specs.append(
                DrillSpec(ref=ref, levels=levels, properties=props, captions=captions)
            )
        return specs

    # ---------------- dimension tables ----------------


    def _dim_hint(self, hier: Hierarchy, df: DataFrame) -> DataFrame:
        """Broadcast hint for dimension-side join inputs — omitted for tables
        the registry marks fact-scaled (AQE then picks the strategy)."""
        if hier.table is not None and not self.registry.is_broadcastable(
            hier.table.full_name()
        ):
            return df
        return F.broadcast(df)

    def _dim_df(self, hier: Hierarchy) -> DataFrame:
        if hier.inline_table is not None:
            return self.registry.inline_table(hier.inline_table)
        if hier.table is None:
            raise QueryValidationError(f"hierarchy {hier.name!r} is degenerate")
        return self.registry.load(hier.table)

    # ---------------- cuts ----------------

    def _member_literals(self, level: Level, members: tuple[str, ...]) -> list:
        if level.key_type is MemberType.NONTEXT:
            out = []
            for m in members:
                try:
                    out.append(int(m))
                except ValueError:
                    out.append(float(m))
            return out
        return list(members)

    def _cut_predicate(self, level: Level, cut: Cut, key_col: str) -> Column:
        """IN / NOT-IN / LIKE predicate over a single column
        (query_ir.rs:180-234, cuts.rs:3-10)."""
        if cut.for_match:
            # LIKE against the level's name column (query_ir.rs:193-216)
            target = F.col(level.name_column or key_col)
            if cut.mask is Mask.INCLUDE:
                pred = target.like(f"%{cut.members[0]}%")
                for m in cut.members[1:]:
                    pred = pred | target.like(f"%{m}%")
            else:
                pred = ~target.like(f"%{cut.members[0]}%")
                for m in cut.members[1:]:
                    pred = pred & ~target.like(f"%{m}%")
            return pred
        lits = self._member_literals(level, cut.members)
        pred = F.col(key_col).isin(lits)
        return ~pred if cut.mask is Mask.EXCLUDE else pred

    def _implicit_cuts(self, cube: Cube, query: Query) -> list[Cut]:
        """Default-hierarchy and default-member auto-cuts (lib.rs:324-388,
        432-522 → P9/P10):

        - dims absent from the query whose ``default_hierarchy`` is set get a
          memberless cut on that hierarchy's lowest level → unconditional
          semi-join dedup against the default hierarchy's table
        - dims absent from the query whose (default or only) hierarchy declares
          a ``default_member`` get that cut; ``exclude_default_members``
          additionally negates the default member on dims that ARE drilled
        """
        drilled = {ln.dimension for ln in query.drilldowns}
        cut_dims = {c.level_name.dimension for c in query.cuts} | {
            c.level_name.dimension for g in query.cut_groups for c in g
        }
        implicit: list[Cut] = []
        for dim in cube.dimensions:
            absent = dim.name not in drilled and dim.name not in cut_dims
            if absent and dim.default_hierarchy:
                hier = dim.hierarchy(dim.default_hierarchy)
                if not hier.is_degenerate():
                    implicit.append(
                        Cut(
                            level_name=LevelName(
                                dim.name, hier.name, hier.levels[-1].name
                            ),
                            members=(),  # memberless marker (primary_agg.rs:139-146)
                        )
                    )
            if dim.default_hierarchy or len(dim.hierarchies) == 1:
                hier = dim.hierarchy(dim.default_hierarchy)
                if hier.default_member:
                    if absent:
                        implicit.append(Cut.parse(hier.default_member))
                    elif (
                        query.exclude_default_members
                        and dim.name in drilled
                        and dim.name not in cut_dims
                    ):
                        s = hier.default_member
                        s = s[1:] if s.startswith("~") else f"~{s}"
                        implicit.append(Cut.parse(s))
        return implicit

    def _apply_cuts(self, cube: Cube, query: Query, fact: DataFrame) -> DataFrame:
        for cut in list(query.cuts) + self._implicit_cuts(cube, query):
            fact = self._apply_one_cut(cube, cut, fact)
        for group in query.cut_groups:
            fact = self._apply_cut_group(cube, group, fact)
        for cc in query.conditional_cuts:
            fact = self._apply_conditional_cut(cube, cc, fact)
        return fact

    def _apply_conditional_cut(self, cube: Cube, cc, fact: DataFrame) -> DataFrame:
        """C5 (completed): keep rows of groups (by group_level's fact-grain key)
        containing ≥1 row matching the member cut — the semantics the
        reference sketched as 'robust' (conditional_cut.rs:50-57).

        r10 rewrite (VERDICT r9 #4 — the 10× gate's 3.53× top): each fact
        row first gets a LOCAL match flag (plain predicate for degenerate
        member cuts; a broadcast dim-keys left join otherwise — member cuts
        filter a DIMENSION level, so that key set is dim-sized, never
        fact-sized). Then two strategies by group-key cardinality:

        - group level backed by a broadcastable dim (e.g. Supplier): the
          qualifying group keys are ⊆ that dim's primary keys — map-side
          partial distinct shrinks the probe to dim size, and the fact is
          filtered with an explicitly-broadcast semi-join. The FACT NEVER
          SHUFFLES; the old form's 3.53× growth was AQE electing a shuffle
          semi-join here once the un-hinted probe looked big at 10×.
        - degenerate / fact-scaled group key (e.g. Order at fact grain):
          the probe can be fact-sized, so broadcasting is unsound; one
          window `max(flag) OVER (PARTITION BY group_key)` keeps
          qualifying groups in a SINGLE fact scan + single shuffle by
          group key — the same shuffle a semi-join would have needed, with
          the second fact scan and the fact-sized distinct gone."""
        from pyspark.sql import Window

        gref = self.resolve_level(cube, cc.group_level)
        if gref.degenerate:
            group_col = gref.level.key_column
            group_bounded = False
        else:
            if gref.dim.foreign_key is None:
                raise QueryValidationError(
                    f"conditional cut group dim {gref.dim.name!r} has no foreign key"
                )
            group_col = gref.dim.foreign_key
            group_bounded = gref.hier.table is not None and self.registry.is_broadcastable(
                gref.hier.table.full_name()
            )
        cut = cc.member_cut
        mref = self.resolve_level(cube, cut.level_name)
        flagged, flag = self._row_match_flag(fact, mref, cut)
        if group_bounded:
            keys = (
                flagged.filter(flag)
                .select(F.col(group_col).alias("__cc_key"))
                .distinct()
            )
            return fact.join(
                F.broadcast(keys), fact[group_col] == F.col("__cc_key"), "left_semi"
            )
        w = Window.partitionBy(group_col)
        return (
            flagged.withColumn("__cc_any", F.max(flag).over(w))
            # the IS NOT NULL term pins both strategies to the same NULL
            # semantics: the semi-join branch is null-rejecting (a NULL
            # group key matches no `IN` set — the reference's robust-cut
            # sketch and the oracle both say IN), so the window branch must
            # drop NULL-key rows too, not pool them into one kept "group"
            .filter(F.col("__cc_any") & F.col(group_col).isNotNull())
            .drop("__cc_any", "__cc_mk")
        )

    def _row_match_flag(
        self, fact: DataFrame, mref, cut: Cut
    ) -> tuple[DataFrame, Column]:
        """Per-row boolean 'this row matches the member cut', computed without
        re-reading the fact: degenerate / join-key cuts are plain predicates;
        dim-table cuts left-join the (dim-sized, broadcast-hinted) matching
        key set and test for a hit (column ``__cc_mk`` — caller drops it)."""
        if not cut.members:
            # memberless: every row with a dim match qualifies
            if mref.degenerate:
                return fact, F.lit(True)
            pk = mref.hier.effective_primary_key()
            fk = mref.dim.foreign_key
            dim_keys = (
                self._dim_df(mref.hier).select(F.col(pk).alias("__cc_mk")).distinct()
            )
            joined = fact.join(
                self._dim_hint(mref.hier, dim_keys),
                fact[fk] == F.col("__cc_mk"),
                "left",
            )
            return joined, F.col("__cc_mk").isNotNull()
        if mref.degenerate:
            return fact, self._cut_predicate(mref.level, cut, mref.level.key_column)
        pk = mref.hier.effective_primary_key()
        fk = mref.dim.foreign_key
        if fk is None:
            raise QueryValidationError(
                f"dimension {mref.dim.name!r} has a table but no foreign key"
            )
        if not cut.for_match and mref.level.key_column == pk:
            return fact, self._cut_predicate(mref.level, cut, fk)
        dim_keys = (
            self._dim_df(mref.hier)
            .filter(self._cut_predicate(mref.level, cut, mref.level.key_column))
            .select(F.col(pk).alias("__cc_mk"))
            .distinct()
        )
        joined = fact.join(
            self._dim_hint(mref.hier, dim_keys),
            fact[fk] == F.col("__cc_mk"),
            "left",
        )
        return joined, F.col("__cc_mk").isNotNull()

    def _apply_cut_group(
        self, cube: Cube, cuts: tuple[Cut, ...], fact: DataFrame
    ) -> DataFrame:
        """Disjunctive cut group: a fact row passes if ANY member cut
        matches (single-plan L5 — SURVEY §2.10). When a cut's level is
        DRILLED its key alias column is already on every row (the
        single-plan path applies groups above the joined template), so the
        disjunction is ONE plain filter — no extra joins, and an
        all-degenerate group pushes to the parquet scan. A cut whose alias
        is absent (cuts-first path: two-phase aggregators, conditional
        cuts) falls back to the conditional-cut flag machinery — a
        broadcast left join per cut, the same per-cut cost as the
        conjunctive semi-join."""
        from functools import reduce as _reduce

        flag_cols: list[str] = []
        pure: list[Column] = []
        for i, cut in enumerate(cuts):
            ref = self.resolve_level(cube, cut.level_name)
            alias = level_key_alias(ref.level)
            if alias in fact.columns and cut.members:
                pure.append(self._cut_predicate(ref.level, cut, alias))
                continue
            fact, flag = self._row_match_flag(fact, ref, cut)
            if "__cc_mk" in fact.columns:
                # joined flag: materialize under a per-cut name so the next
                # cut's join can reuse the shared __cc_mk scratch column
                name = f"__cg_{i}"
                fact = fact.withColumn(name, flag).drop("__cc_mk")
                flag_cols.append(name)
            else:
                pure.append(flag)
        preds = pure + [F.col(c) for c in flag_cols]
        fact = fact.filter(
            _reduce(lambda a, b: a | b, preds)
        )
        return fact.drop(*flag_cols) if flag_cols else fact

    def _apply_one_cut(self, cube: Cube, cut: Cut, fact: DataFrame) -> DataFrame:
        ref = self.resolve_level(cube, cut.level_name)
        if not cut.members:
            # memberless default-hierarchy cut: unconditional semi-join dedup
            # against the hierarchy table (primary_agg.rs:139-146)
            if ref.degenerate:
                return fact
            pk = ref.hier.effective_primary_key()
            fk = ref.dim.foreign_key
            dim_keys = self._dim_df(ref.hier).select(F.col(pk).alias("__cut_key"))
            return fact.join(
                self._dim_hint(ref.hier, dim_keys),
                fact[fk] == F.col("__cut_key"),
                "left_semi",
            )
        if ref.degenerate:
            # cut column lives on the fact table — plain filter, pushed to scan
            return fact.filter(self._cut_predicate(ref.level, cut, ref.level.key_column))
        pk = ref.hier.effective_primary_key()
        fk = ref.dim.foreign_key
        if fk is None:
            raise QueryValidationError(
                f"dimension {ref.dim.name!r} has a table but no foreign key"
            )
        if not cut.for_match and ref.level.key_column == pk:
            # cut on the join key itself: skip the dim scan, filter the fact fk
            # directly (generalizes the reference's fact-table cut inlining,
            # primary_agg.rs:123-137)
            return fact.filter(self._cut_predicate(ref.level, cut, fk))
        # semi-join pushdown (primary_agg.rs:139-160): fk IN (SELECT pk FROM dim WHERE cut)
        dim_df = self._dim_df(ref.hier)
        dim_keys = dim_df.filter(
            self._cut_predicate(ref.level, cut, ref.level.key_column)
        ).select(F.col(pk).alias("__cut_key"))
        return fact.join(
            self._dim_hint(ref.hier, dim_keys),
            fact[fk] == F.col("__cut_key"),
            "left_semi",
        )

    # ---------------- auto boundary resolution ----------------

    def resolve_binned_boundaries(self, cube_name: str) -> None:
        """Resolve every auto (``n_bins``, no literal boundaries)
        BinnedQuantile measure of the cube into concrete equal-frequency
        edges derived from the fact column by the deterministic exact rank
        fold (operators/sketch.derive_bin_edges — VERDICT r9 #5). One
        bounded job per auto measure (n_bins−1 doubles collected), run once
        at materialization/setup time; the schema is swapped in place so
        every later plan — including aggnav rollup materialization — sees
        literal boundaries. Idempotent: resolved measures are literal and
        are skipped on re-entry."""
        from dataclasses import replace as _rep

        from ..operators.sketch import derive_bin_edges
        from ..schema.aggregator import BinnedQuantile as _BQ

        cube = self.schema.cube(cube_name)
        fact = self.registry.load(cube.table)
        new_measures = []
        changed = False
        for m in cube.measures:
            a = m.aggregator
            if isinstance(a, _BQ) and not a.boundaries and a.n_bins > 0:
                edges = derive_bin_edges(fact, m.column, n_bins=a.n_bins)
                new_measures.append(
                    _rep(m, aggregator=_rep(a, boundaries=tuple(edges)))
                )
                changed = True
            else:
                new_measures.append(m)
        if changed:
            new_cube = _rep(cube, measures=tuple(new_measures))
            self.schema = _rep(
                self.schema,
                cubes=tuple(
                    new_cube if c.name == cube_name else c
                    for c in self.schema.cubes
                ),
            )

    # ---------------- main entry ----------------

    def dataframe(self, cube_name: str, query: Query) -> DataFrame:
        # dataclass repr is deterministic and covers every field; a missed
        # hit (hand-built Query with unusual field order) costs a rebuild,
        # never a wrong plan
        from concurrent.futures import Future

        key = (self.registry.generation, cube_name, repr(query))
        my_fut = Future()
        registered = False
        try:
            with self._plan_cache_lock:
                hit = self._plan_cache.get(key)
                if hit is not None:
                    self._plan_cache.move_to_end(key)
                    return hit
                theirs = self._in_flight.get(key)
                if theirs is None:
                    self._in_flight[key] = my_fut
                    registered = True
            if not registered:
                # duplicate concurrent request: wait for the owner's build
                # (or its exception — same query, same error) instead of
                # re-paying the py4j construction
                return theirs.result()
            df = self._build_dataframe(cube_name, query)
            with self._plan_cache_lock:
                self._plan_cache[key] = df
                if len(self._plan_cache) > self._plan_cache_max:
                    self._plan_cache.popitem(last=False)
                self._in_flight.pop(key, None)
            my_fut.set_result(df)
            return df
        finally:
            # ANY exit (build exception, KeyboardInterrupt between any two
            # statements above) must resolve a registered future, or every
            # later request for this key would wait on it forever
            if registered and not my_fut.done():
                with self._plan_cache_lock:
                    self._in_flight.pop(key, None)
                import sys as _sys

                exc = _sys.exc_info()[1]
                my_fut.set_exception(
                    exc
                    if exc is not None
                    else RuntimeError("plan build interrupted")
                )

    def _build_dataframe(self, cube_name: str, query: Query) -> DataFrame:
        cube = self.schema.cube(cube_name)
        self._validate(cube, query)

        query = self._with_calc_drills(cube, query)
        specs = self._drill_specs(cube, query)
        measures = [cube.measure(m) for m in query.measures]

        # RCA routes cuts asymmetrically (rca.rs:103-123): only external cuts
        # reach the primary aggregation; d1 cuts are applied inside apply_rca
        # after the b/d window totals; d2 cuts are dropped.
        agg_query = query
        if query.rca is not None:
            from .calculations import _split_rca_cuts

            ext_cuts, _, _ = _split_rca_cuts(self, cube, query)
            import copy

            agg_query = copy.copy(query)
            agg_query.cuts = ext_cuts

        two_phase = any(
            agg_mod.needs_two_phase(m.aggregator, self.avg_grain) for m in measures
        )

        if two_phase or agg_query.conditional_cuts:
            # cuts must precede the fact-grain pre-aggregation (raw cut
            # columns don't survive it), so the two-phase path keeps the
            # cuts-first order and no template applies. Conditional cuts
            # are GROUP-based (a window flag over the cut group) and do not
            # commute with a row-dropping inner dim join when orphan fks
            # exist, so they also take the cuts-first path.
            fact = self.registry.load(cube.table)
            fact = self._apply_cuts(cube, agg_query, fact)
            if two_phase:
                df = self._two_phase_plan(cube, specs, measures, fact)
            else:
                df = self._single_pass_plan(specs, measures, fact)
        else:
            # parameterized plan template (VERDICT r11 #3): the
            # cut-independent subtree (scan + degenerate projection + dim
            # joins) is shared across every query that differs only in cut
            # literals; cuts are applied ON TOP — filters and semi-joins on
            # fact columns commute with the inner dim joins, and Catalyst
            # pushes them back below the joins to the scan, so the executed
            # plan is the same as the cuts-first construction
            # (test_plan_shapes pins pushdown + join shapes per entry)
            joined = self._joined_template(cube, specs)
            joined = self._apply_cuts(cube, agg_query, joined)
            group_cols = self._group_aliases(specs)
            aggs = [agg_mod.single_pass_agg(m) for m in measures]
            if group_cols:
                df = joined.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)
            else:
                df = joined.agg(*aggs)

        # calculations wrap the primary aggregation (sql.rs:35-61 dispatch)
        out_specs = specs
        if query.growth is not None:
            df = apply_growth(self, cube, query, specs, df)
        if query.rca is not None:
            df = apply_rca(self, cube, query, specs, df)
        if query.rate is not None:
            df = apply_rate(self, cube, query, specs, df)
            # the rate level is a hidden drill: it is aggregated away again
            # (rate.rs:25-37), so downstream options see the original drills
            rate_ln = query.rate.level_name
            out_specs = [
                s
                for s in specs
                if not (
                    s.ref.dim.name == rate_ln.dimension
                    and s.ref.level.name == rate_ln.level
                )
            ]

        df = self._apply_options(cube, query, out_specs, df)
        df = self._order_headers(cube, query, specs, out_specs, df)
        return df

    def drillthrough(
        self, cube_name: str, query: Query, limit: int = 1000
    ) -> DataFrame:
        """The fact rows BEHIND an aggregate cell (classic OLAP
        drill-through — absent from the reference, which only serves
        aggregates): apply the query's cuts exactly as the aggregate path
        does (IN/LIKE/semi-join pushdown, default-member implicit cuts),
        label each row with the drilled levels' key/caption columns, and
        project the measures' RAW fact columns instead of aggregating.

        Deterministic page: rows order by every projected column (the cut
        cell is a small slice of the fact table by construction — the sort
        runs on the filtered subset, never the full fact) and ``limit``
        bounds the page. Reuses the aggregate path's cut/join machinery,
        so a drill-through always sees exactly the rows its cell
        aggregated."""
        cube = self.schema.cube(cube_name)
        self._validate(cube, query)
        specs = self._drill_specs(cube, query)
        measures = [cube.measure(m) for m in query.measures]
        fact = self.registry.load(cube.table)
        fact = self._apply_cuts(cube, query, fact)
        for alias, col in self._degenerate_projection(specs).items():
            fact = fact.withColumn(alias, col)
        joined = self._join_dims(specs, fact)
        out_cols = [F.col(a) for a in self._group_aliases(specs)]
        out_cols += [F.col(m.column).alias(m.name) for m in measures]
        out = joined.select(*out_cols)
        return out.orderBy(*[F.col(c) for c in out.columns]).limit(limit)

    def _order_headers(
        self,
        cube: Cube,
        query: Query,
        specs: list[DrillSpec],
        out_specs: list[DrillSpec],
        df: DataFrame,
    ) -> DataFrame:
        """Column-order contract (lib.rs:709-771): growth moves its time columns
        to the end of the drills and its measure + Growth/Growth Value to the end
        of the measures; RCA's measure column comes first among measures and
        debug a/b/c/d sit between drills and measures; Rate is always last."""
        if query.growth is None and query.rca is None and query.rate is None:
            return df
        cols = list(df.columns)
        drill_aliases = [a for a in self._group_aliases(out_specs) if a in cols]
        rest = [c for c in cols if c not in drill_aliases]

        if query.growth is not None:
            from .calculations import _spec_aliases

            time_aliases = [
                a
                for a in _spec_aliases(self, specs, query.growth.time_drill)
                if a in drill_aliases
            ]
            drill_aliases = [a for a in drill_aliases if a not in time_aliases] + time_aliases
            g_mea = query.growth.mea
            tail = [g_mea, f"{g_mea} Growth", f"{g_mea} Growth Value"]
            rest = [c for c in rest if c not in tail] + [c for c in tail if c in cols]

        if query.rca is not None:
            debug_cols = [c for c in ("a", "b", "c", "d") if c in rest]
            rca_col = f"{query.rca.mea} RCA"
            others = [c for c in rest if c not in debug_cols and c != rca_col]
            rest = debug_cols + [rca_col] + others

        if query.rate is not None and "Rate" in rest:
            rest = [c for c in rest if c != "Rate"] + ["Rate"]

        return df.select(*[F.col(c) for c in drill_aliases + rest])

    # ---------------- plan variants ----------------

    def _degenerate_projection(self, specs: list[DrillSpec]) -> dict[str, Column]:
        """Aliased fact-side columns for degenerate drills."""
        cols: dict[str, Column] = {}
        for spec in specs:
            if not spec.ref.degenerate:
                continue
            for lv in spec.levels:
                cols[level_key_alias(lv)] = F.col(lv.key_column)
                if lv.name_column:
                    cols[level_name_alias(lv)] = F.col(spec.name_source(lv))
            for p in spec.properties:
                cols[p.name] = F.col(p.column)
        return cols

    def _join_dims(self, specs: list[DrillSpec], df: DataFrame) -> DataFrame:
        """Broadcast inner-join each drilled non-degenerate hierarchy
        (primary_agg.rs:169-213 → J1), one join per (dim, hierarchy)."""
        seen: dict[tuple[str, str], DrillSpec] = {}
        for spec in specs:
            if spec.ref.degenerate:
                continue
            key = (spec.ref.dim.name, spec.ref.hier.name)
            if key in seen:
                # merge level/property sets drilled through the same hierarchy
                merged = seen[key]
                have = {lv.name for lv in merged.levels}
                merged.levels.extend(lv for lv in spec.levels if lv.name not in have)
                merged.properties.extend(
                    p for p in spec.properties if p.name not in {q.name for q in merged.properties}
                )
                merged.captions.update(spec.captions)
            else:
                seen[key] = DrillSpec(
                    ref=spec.ref,
                    levels=list(spec.levels),
                    properties=list(spec.properties),
                    captions=dict(spec.captions),
                )
        for (dim_name, _), spec in seen.items():
            hier = spec.ref.hier
            fk = spec.ref.dim.foreign_key
            pk = hier.effective_primary_key()
            dim_df = self._dim_df(hier)
            sel = [F.col(pk).alias("__jk")]
            for lv in spec.levels:
                sel.append(F.col(lv.key_column).alias(level_key_alias(lv)))
                if lv.name_column:
                    sel.append(F.col(spec.name_source(lv)).alias(level_name_alias(lv)))
            for p in spec.properties:
                sel.append(F.col(p.column).alias(p.name))
            dim_sel = dim_df.select(*sel)
            df = df.join(
                self._dim_hint(hier, dim_sel), df[fk] == dim_sel["__jk"], "inner"
            ).drop("__jk")
        return df

    def _joined_template(self, cube: Cube, specs: list[DrillSpec]) -> DataFrame:
        """The cut-independent pre-aggregation subtree for a drill shape:
        fact scan + degenerate level projection + broadcast dim joins.
        LRU-cached per (registry generation, cube, drill-spec signature) so
        cold queries that share a dashboard shape but differ in cut
        literals re-pay only the cut filter + aggregate construction
        (~half the py4j roundtrips of a full build). The cached object is
        an immutable logical plan — execution always re-scans."""
        key = (self.registry.generation, cube.name, repr(specs))
        with self._plan_cache_lock:
            hit = self._template_cache.get(key)
            if hit is not None:
                self._template_cache.move_to_end(key)
                self.template_cache_hits += 1
                return hit
            self.template_cache_misses += 1
        fact = self.registry.load(cube.table)
        for alias, col in self._degenerate_projection(specs).items():
            fact = fact.withColumn(alias, col)
        joined = self._join_dims(specs, fact)
        with self._plan_cache_lock:
            self._template_cache[key] = joined
            if len(self._template_cache) > self._template_cache_max:
                self._template_cache.popitem(last=False)
        return joined

    def _single_pass_plan(
        self, specs: list[DrillSpec], measures: list[Measure], fact: DataFrame
    ) -> DataFrame:
        for alias, col in self._degenerate_projection(specs).items():
            fact = fact.withColumn(alias, col)
        joined = self._join_dims(specs, fact)
        group_cols = self._group_aliases(specs)
        aggs = [agg_mod.single_pass_agg(m) for m in measures]
        if group_cols:
            return joined.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)
        return joined.agg(*aggs)

    def _two_phase_plan(
        self,
        cube: Cube,
        specs: list[DrillSpec],
        measures: list[Measure],
        fact: DataFrame,
    ) -> DataFrame:
        """Reference plan shape: pre-aggregate at fact grain (degenerate drill
        cols + join fks + hidden median dims), join dims, re-aggregate
        (primary_agg.rs:93-121, 162-167, 215-231)."""
        for alias, col in self._degenerate_projection(specs).items():
            fact = fact.withColumn(alias, col)

        pre_keys: list[str] = []
        for spec in specs:
            if spec.ref.degenerate:
                pre_keys.extend(a for a in spec.output_aliases())
            else:
                fk = spec.ref.dim.foreign_key
                if fk not in pre_keys:
                    pre_keys.append(fk)
        # hidden drilldowns for grouped median (lib.rs:536-554)
        for m in measures:
            agg = m.aggregator
            if getattr(agg, "group_dimension", None):
                href = self.resolve_level(cube, LevelName.parse(agg.group_dimension))
                if not href.degenerate:
                    raise QueryValidationError(
                        "basic_grouped_median group_dimension must be a degenerate"
                        f" dimension in this engine (got {agg.group_dimension!r})"
                    )
                if href.level.key_column not in pre_keys:
                    pre_keys.append(href.level.key_column)
        pre_keys = list(dict.fromkeys(pre_keys))

        p1 = []
        for m in measures:
            p1.extend(agg_mod.pass1_cols(m, self.avg_grain))
        pre = fact.groupBy(*[F.col(c) for c in pre_keys]).agg(*p1)

        joined = self._join_dims(specs, pre)
        group_cols = self._group_aliases(specs)
        p2 = [agg_mod.pass2_col(m, self.avg_grain) for m in measures]
        if group_cols:
            return joined.groupBy(*[F.col(c) for c in group_cols]).agg(*p2)
        return joined.agg(*p2)

    def _group_aliases(self, specs: list[DrillSpec]) -> list[str]:
        out: list[str] = []
        for spec in specs:
            out.extend(a for a in spec.output_aliases() if a not in out)
        return out

    # ---------------- validation ----------------

    def _validate(self, cube: Cube, query: Query) -> None:
        # lib.rs:403-430 semantic checks
        has_calc_mea = query.rca is not None or query.rate is not None
        if not query.measures and not has_calc_mea:
            raise QueryValidationError("query must have at least one measure")
        if not query.drilldowns and not query.cuts and not has_calc_mea:
            raise QueryValidationError("query must have at least one drilldown or cut")
        if query.properties:
            drilled = {
                (ln.dimension, ln.level) for ln in query.drilldowns
            }
            for pln, pname in query.properties:
                if (pln.dimension, pln.level) not in drilled:
                    raise QueryValidationError(
                        f"property {pname!r} requires a drilldown on {pln.level!r}"
                    )

    def _with_calc_drills(self, cube: Cube, query: Query) -> Query:
        """Auto-add drilldowns required by growth/rca (the reference validates
        instead — lib.rs:477-498; auto-adding is a superset convenience)."""
        import copy

        q = copy.deepcopy(query)
        present = {(ln.dimension, ln.hierarchy, ln.level) for ln in q.drilldowns}

        def ensure(ln: LevelName):
            if (ln.dimension, ln.hierarchy, ln.level) not in present:
                q.drilldowns.append(ln)
                present.add((ln.dimension, ln.hierarchy, ln.level))

        if q.growth is not None:
            ensure(q.growth.time_drill)
            if q.growth.mea not in q.measures:
                q.measures.append(q.growth.mea)
        if q.rca is not None:
            ensure(q.rca.drill_1)
            ensure(q.rca.drill_2)
            if q.rca.mea not in q.measures:
                q.measures.append(q.rca.mea)
        if q.rate is not None:
            if not q.measures:
                raise QueryValidationError("rate requires a measure")
            # the rate level joins the aggregation grain as a hidden drill
            # (rate.rs:25-37); apply_rate re-aggregates it away
            ensure(q.rate.level_name)
        return q

    # ---------------- post-agg options ----------------

    _CMP = {
        Comparison.EQ: "==",
        Comparison.NEQ: "!=",
        Comparison.LT: "<",
        Comparison.LTE: "<=",
        Comparison.GT: ">",
        Comparison.GTE: ">=",
    }

    def _constraint_pred(self, target: Column, fq: FilterQuery) -> Column:
        def one(c):
            op = c.comparison
            if op is Comparison.EQ:
                return target == c.n
            if op is Comparison.NEQ:
                return target != c.n
            if op is Comparison.LT:
                return target < c.n
            if op is Comparison.LTE:
                return target <= c.n
            if op is Comparison.GT:
                return target > c.n
            return target >= c.n

        pred = one(fq.constraint)
        if fq.operator is not None and fq.constraint2 is not None:
            second = one(fq.constraint2)
            pred = (pred & second) if fq.operator.value == "and" else (pred | second)
        return pred

    def _calc_column_name(self, calc_or_mea, query: Query) -> str:
        """Map a measure name or rca/growth keyword to its output column."""
        if isinstance(calc_or_mea, Calculation):
            if calc_or_mea is Calculation.GROWTH:
                if query.growth is None:
                    raise QueryValidationError(
                        "sort/top/filter by 'growth' requires a growth calculation"
                    )
                return f"{query.growth.mea} Growth"
            if query.rca is None:
                raise QueryValidationError(
                    "sort/top/filter by 'rca' requires an rca calculation"
                )
            return f"{query.rca.mea} RCA"
        return calc_or_mea

    def _apply_options(
        self, cube: Cube, query: Query, specs: list[DrillSpec], df: DataFrame
    ) -> DataFrame:
        # measure filters = HAVING (options.rs:69-83)
        for fq in query.filters:
            col = F.col(self._calc_column_name(fq.by_mea_or_calc, query))
            df = df.filter(self._constraint_pred(col, fq))

        # sparse: drop rows where all measures are null (options.rs:85-94)
        if query.sparse and query.measures:
            pred = F.col(query.measures[0]).isNotNull()
            for m in query.measures[1:]:
                pred = pred | F.col(m).isNotNull()
            df = df.filter(pred)

        # top_where pre-filter (options.rs:20-28)
        if query.top_where is not None:
            col = F.col(self._calc_column_name(query.top_where.by_mea_or_calc, query))
            df = df.filter(
                self._constraint_pred(
                    col,
                    FilterQuery(
                        by_mea_or_calc=query.top_where.by_mea_or_calc,
                        constraint=query.top_where.constraint,
                    ),
                )
            )

        sort_cols: list[Column] = []
        if query.top is not None:
            # top-k per by_dimension member via ranking window (options.rs:20-29)
            from pyspark.sql import Window

            by_ref = self.resolve_level(cube, query.top.by_dimension)
            # by_dimension must be drilled (lib.rs:570-585)
            drilled = {
                (s.ref.dim.name, lv.name) for s in specs for lv in s.levels
            }
            if (by_ref.dim.name, by_ref.level.name) not in drilled:
                raise QueryValidationError(
                    f"top by_dimension {query.top.by_dimension.level!r} must be"
                    " in drilldowns"
                )
            by_aliases = [level_key_alias(by_ref.level)]
            if by_ref.level.name_column:
                by_aliases.append(level_name_alias(by_ref.level))
            order = []
            for target in query.top.sort_mea_or_calc:
                c = F.col(self._calc_column_name(target, query))
                order.append(
                    c.desc() if query.top.sort_direction is SortDirection.DESC else c.asc()
                )
            # deterministic tie-break within a group: remaining drill columns
            for alias in self._group_aliases(specs):
                if alias not in by_aliases:
                    order.append(F.col(alias).asc())
            w = Window.partitionBy(*[F.col(a) for a in by_aliases]).orderBy(*order)
            df = (
                df.withColumn("__rank", F.row_number().over(w))
                .filter(F.col("__rank") <= query.top.n)
                .drop("__rank")
            )
            # reference final order: by_dim asc, sort measure dir (options.rs:56-60)
            sort_cols = [F.col(a).asc() for a in by_aliases] + order
        elif query.sort is not None and query.sort.is_none:
            # sort=none: skip the final ORDER BY (engine extension — the
            # default all-drills sort is reference parity but pure cost when
            # the consumer is a sink; SURVEY §7 risk 7 / VERDICT r6 #3)
            sort_cols = []
        elif query.sort is not None:
            c = F.col(self._calc_column_name(query.sort.measure, query))
            first = c.desc() if query.sort.direction is SortDirection.DESC else c.asc()
            sort_cols = [first] + [
                F.col(a).asc() for a in self._group_aliases(specs)
            ]
        else:
            # default deterministic order: all drill columns asc (options.rs:60-66)
            sort_cols = [F.col(a).asc() for a in self._group_aliases(specs)]

        if query.sort is not None and query.sort.is_none:
            # sort=none also suppresses top's presentation-order sort (the
            # ranking FILTER above already ran; only the final ordering of
            # surviving rows is skipped)
            sort_cols = []
        if sort_cols:
            df = df.orderBy(*sort_cols)

        if query.limit is not None and not sort_cols:
            # limit/offset over an unordered DataFrame returns an arbitrary,
            # run-to-run-unstable row subset — silently different from the
            # reference, where limit applies after the deterministic default
            # sort. Reject rather than paginate noise (ADVICE r7); consumers
            # that genuinely want "any N rows" can sort=none without limit
            # and bound the read themselves.
            raise QueryValidationError(
                "limit/offset with sort=none would paginate an unordered "
                "result (nondeterministic rows); drop sort=none or the limit"
            )
        if query.limit is not None:
            if query.limit.offset:
                df = df.offset(query.limit.offset)
            df = df.limit(query.limit.n)
        return df
