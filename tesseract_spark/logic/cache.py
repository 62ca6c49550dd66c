"""Logic-layer member cache.

Mirrors the reference's startup cache population
(tesseract-server/src/logic_layer/cache.rs:279-539): per level — sorted
distinct members; per adjacent level pair — parent↔child maps; per time level —
the distinct value list backing ``time=year.latest/oldest`` resolution
(cache.rs:168-243) and ``:neighbors`` adjacency (cache.rs:863-904).

Scale note: caches hold DIMENSION members only (small by construction — the
reference collects the same lists into server memory). Everything is computed
with ``distinct()`` plans and collected once, lazily per level; fact-table
degenerate levels read only the needed column (pruned parquet scan).
"""

from __future__ import annotations

from bisect import bisect_left

from pyspark.sql import functions as F

from ..plans.builder import PlanBuilder, ResolvedLevelRef
from ..query.model import LevelName
from ..schema.model import Cube


class MemberCache:
    #: driver-memory guard: member/parent-child caches are meant for DIMENSION
    #: levels; a fact-grain level (e.g. an order-key degenerate dim at sf≫1)
    #: would OOM the driver — fail fast instead
    MAX_MEMBERS = 2_000_000

    def __init__(self, builder: PlanBuilder, cube: Cube):
        self.builder = builder
        self.cube = cube
        self._members: dict[tuple[str, str, str], list] = {}
        self._pc_maps: dict[tuple, dict] = {}

    def _level_source(self, ref: ResolvedLevelRef):
        if ref.degenerate:
            return self.builder.registry.load(self.cube.table)
        return self.builder._dim_df(ref.hier)

    def members(self, ln: LevelName) -> list:
        """Sorted distinct member keys of a level (cache.rs:835-860)."""
        key = (ln.dimension, ln.hierarchy, ln.level)
        if key not in self._members:
            ref = self.builder.resolve_level(self.cube, ln)
            src = self._level_source(ref)
            distinct = src.select(F.col(ref.level.key_column).alias("m")).distinct()
            rows = distinct.orderBy("m").limit(self.MAX_MEMBERS + 1).collect()
            if len(rows) > self.MAX_MEMBERS:
                raise ValueError(
                    f"level {ln.level!r} has more than {self.MAX_MEMBERS} members —"
                    " too large for the driver-side member cache; use plain cuts"
                )
            self._members[key] = [r.m for r in rows]
        return self._members[key]

    def latest(self, ln: LevelName):
        return self.members(ln)[-1]

    def oldest(self, ln: LevelName):
        return self.members(ln)[0]

    def neighbors(self, ln: LevelName, member) -> list:
        """Adjacent member ids in sorted order (cache.rs:863-904: ±2 window)."""
        ms = self.members(ln)
        i = bisect_left(ms, member)
        if i >= len(ms) or ms[i] != member:
            return []
        lo = max(0, i - 2)
        return ms[lo:i] + ms[i + 1 : i + 3]

    def _pc_map(self, ref_parent: ResolvedLevelRef, ref_child: ResolvedLevelRef):
        key = (
            ref_parent.dim.name,
            ref_parent.hier.name,
            ref_parent.level.name,
            ref_child.level.name,
        )
        if key not in self._pc_maps:
            src = self._level_source(ref_child)
            rows = (
                src.select(
                    F.col(ref_parent.level.key_column).alias("p"),
                    F.col(ref_child.level.key_column).alias("c"),
                )
                .distinct()
                .collect()
            )
            children: dict = {}
            parent_of: dict = {}
            for r in rows:
                children.setdefault(r.p, []).append(r.c)
                parent_of[r.c] = r.p
            for v in children.values():
                v.sort()
            self._pc_maps[key] = {"children": children, "parent": parent_of}
        return self._pc_maps[key]

    def children(self, ln: LevelName, member) -> tuple[LevelName, list]:
        """Children of a member at the next level down (cache.rs:748-780)."""
        ref = self.builder.resolve_level(self.cube, ln)
        if ref.level_idx + 1 >= len(ref.hier.levels):
            raise ValueError(f"level {ln.level!r} has no child level")
        child = ref.hier.levels[ref.level_idx + 1]
        child_ln = LevelName(ln.dimension, ref.hier.name, child.name)
        child_ref = self.builder.resolve_level(self.cube, child_ln)
        m = self._pc_map(ref, child_ref)
        return child_ln, m["children"].get(member, [])

    def parents(self, ln: LevelName, member) -> list[tuple[LevelName, object]]:
        """Ancestor chain of a member, top-down (cache.rs:783-831)."""
        ref = self.builder.resolve_level(self.cube, ln)
        out: list[tuple[LevelName, object]] = []
        cur_ref, cur_member = ref, member
        while cur_ref.level_idx > 0:
            parent = cur_ref.hier.levels[cur_ref.level_idx - 1]
            parent_ln = LevelName(ln.dimension, cur_ref.hier.name, parent.name)
            parent_ref = self.builder.resolve_level(self.cube, parent_ln)
            m = self._pc_map(parent_ref, cur_ref)
            cur_member = m["parent"].get(cur_member)
            out.insert(0, (parent_ln, cur_member))
            cur_ref = parent_ref
        return out
