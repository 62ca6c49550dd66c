"""Cube schema metadata model.

Mirrors the reference's schema model (tesseract-core/src/schema.rs:39-702 and
schema/json.rs) as plain Python dataclasses. This is pure metadata — the engine's
execution representation is the Spark DataFrame; tables referenced here are resolved
through :class:`tesseract_spark.sources.registry.TableRegistry`.

Differences from the reference, by design:
- no serde; :func:`tesseract_spark.schema.parse.schema_from_json` builds this model
- ``Table.name`` may be a parquet path, a registered Spark table name, or a
  registry view name — binding happens at plan-build time.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from .aggregator import Aggregator


class DimensionType(Enum):
    # schema.rs:380-392
    STANDARD = "standard"
    TIME = "time"
    GEO = "geo"


class MemberType(Enum):
    """Controls member-literal typing for cuts — query_ir.rs:237-243."""

    TEXT = "text"
    NONTEXT = "nontext"


class MeasureType(Enum):
    # schema.rs:647-658: a measure may be the error/MOE companion of another
    STANDARD = "standard"
    ERROR = "error"


@dataclass(frozen=True)
class Annotation:
    name: str
    text: str


@dataclass(frozen=True)
class Table:
    """schema.rs:669-694. ``schema`` is a namespace prefix (DB schema); for the
    Spark engine it is folded into the registry lookup key."""

    name: str
    schema: str | None = None
    primary_key: str | None = None

    def full_name(self) -> str:
        return f"{self.schema}.{self.name}" if self.schema else self.name


@dataclass(frozen=True)
class Property:
    # schema.rs:696-702
    name: str
    column: str
    caption_set: str | None = None
    annotations: tuple[Annotation, ...] = ()


@dataclass(frozen=True)
class Level:
    # schema.rs:555-563
    name: str
    key_column: str
    name_column: str | None = None
    properties: tuple[Property, ...] = ()
    key_type: MemberType = MemberType.NONTEXT
    annotations: tuple[Annotation, ...] = ()


@dataclass(frozen=True)
class InlineColumnDef:
    name: str
    key_type: MemberType = MemberType.NONTEXT
    key_column_type: str | None = None  # explicit cast type, schema.rs:462
    caption_set: str | None = None


@dataclass(frozen=True)
class InlineTable:
    """Literal dimension rows embedded in the schema — schema.rs:441-486.

    The reference compiles these to ``SELECT … UNION ALL …`` SQL; we build a
    DataFrame via ``spark.createDataFrame`` (see sources/registry.py).
    ``rows`` are stored as string values per the wire format; typing is applied
    from ``column_definitions``.
    """

    alias: str
    column_definitions: tuple[InlineColumnDef, ...]
    rows: tuple[dict[str, str], ...]


@dataclass(frozen=True)
class Hierarchy:
    """schema.rs:395-426. ``table is None and inline_table is None`` ⇒ degenerate
    dimension stored inline in the fact table. ``primary_key`` defaults to the
    lowest (last) level's key_column."""

    name: str
    levels: tuple[Level, ...]
    table: Table | None = None
    primary_key: str | None = None
    inline_table: InlineTable | None = None
    default_member: str | None = None
    annotations: tuple[Annotation, ...] = ()

    def effective_primary_key(self) -> str:
        # schema.rs:419-426: defaults to the lowest level's key_column; we also
        # honor an explicit primary_key on the hierarchy's table config first
        if self.primary_key:
            return self.primary_key
        if self.table is not None and self.table.primary_key:
            return self.table.primary_key
        return self.levels[-1].key_column

    def is_degenerate(self) -> bool:
        return self.table is None and self.inline_table is None


@dataclass(frozen=True)
class Dimension:
    # schema.rs:343-352
    name: str
    foreign_key: str | None
    hierarchies: tuple[Hierarchy, ...]
    default_hierarchy: str | None = None
    dim_type: DimensionType = DimensionType.STANDARD
    is_shared: bool = False
    annotations: tuple[Annotation, ...] = ()

    def hierarchy(self, name: str | None = None) -> Hierarchy:
        if name is None:
            if len(self.hierarchies) == 1:
                return self.hierarchies[0]
            name = self.default_hierarchy
        for h in self.hierarchies:
            if h.name == name:
                return h
        raise KeyError(f"hierarchy {name!r} not in dimension {self.name!r}")


@dataclass(frozen=True)
class Measure:
    # schema.rs:619-626
    name: str
    column: str
    aggregator: Aggregator
    measure_type: MeasureType = MeasureType.STANDARD
    annotations: tuple[Annotation, ...] = ()
    #: engine extension: when set, sum-family aggregations route through
    #: decimal(38, exact_scale) so results are order-independent (exact decimal
    #: arithmetic) — needed for bit-stable results across plan reorderings
    #: (semi-join pushdown, two-phase, AQE) and across engines. Costs ~6× on
    #: the agg stage; intended for money-typed columns where determinism
    #: matters. Final output is cast back to double.
    exact_scale: int | None = None


@dataclass(frozen=True)
class Cube:
    # schema.rs:166-176
    name: str
    table: Table
    dimensions: tuple[Dimension, ...]
    measures: tuple[Measure, ...]
    public: bool = True
    min_auth_level: int = 0
    can_aggregate: bool = False
    annotations: tuple[Annotation, ...] = ()

    def dimension(self, name: str) -> Dimension:
        for d in self.dimensions:
            if d.name == name:
                return d
        raise KeyError(f"dimension {name!r} not in cube {self.name!r}")

    def measure(self, name: str) -> Measure:
        for m in self.measures:
            if m.name == name:
                return m
        raise KeyError(f"measure {name!r} not in cube {self.name!r}")


@dataclass(frozen=True)
class Schema:
    # schema.rs:39-45
    name: str
    cubes: tuple[Cube, ...]
    annotations: tuple[Annotation, ...] = ()
    default_locale: str | None = None

    def cube(self, name: str) -> Cube:
        for c in self.cubes:
            if c.name == name:
                return c
        raise KeyError(f"cube {name!r} not in schema {self.name!r}")
