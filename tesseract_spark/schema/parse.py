"""Schema JSON + XML parsing + validation.

JSON wire shape mirrors the reference's config structs
(tesseract-core/src/schema/json.rs) including shared-dimension copy-down via
``dimension_usages`` (schema.rs:78-126) and validation rules (lib.rs:94-151).
XML follows the same path as the reference (lib.rs:82-91): the XML element tree
(schema/xml.rs element/attribute names) is converted to the JSON dict shape,
then parsed by :func:`schema_from_json`.
"""

from __future__ import annotations

import json

from .aggregator import parse_aggregator
from .model import (
    Annotation,
    Cube,
    Dimension,
    DimensionType,
    Hierarchy,
    InlineColumnDef,
    InlineTable,
    Level,
    Measure,
    MeasureType,
    MemberType,
    Property,
    Schema,
    Table,
)


class SchemaError(ValueError):
    pass


def _annotations(raw) -> tuple[Annotation, ...]:
    return tuple(Annotation(a["name"], a["text"]) for a in (raw or ()))


def _table(raw) -> Table:
    return Table(name=raw["name"], schema=raw.get("schema"), primary_key=raw.get("primary_key"))


def _member_type(raw) -> MemberType:
    return MemberType(raw) if raw else MemberType.NONTEXT


def _property(raw) -> Property:
    return Property(
        name=raw["name"],
        column=raw["column"],
        caption_set=raw.get("caption_set"),
        annotations=_annotations(raw.get("annotations")),
    )


def _level(raw) -> Level:
    return Level(
        name=raw["name"],
        key_column=raw["key_column"],
        name_column=raw.get("name_column"),
        properties=tuple(_property(p) for p in raw.get("properties") or ()),
        key_type=_member_type(raw.get("key_type")),
        annotations=_annotations(raw.get("annotations")),
    )


def _inline_table(raw) -> InlineTable | None:
    if not raw:
        return None
    coldefs = tuple(
        InlineColumnDef(
            name=c["name"],
            key_type=_member_type(c.get("key_type")),
            key_column_type=c.get("key_column_type"),
            caption_set=c.get("caption_set"),
        )
        for c in raw["column_definitions"]
    )
    rows = tuple(
        {rv["column"]: rv["value"] for rv in row["row_values"]} for row in raw["rows"]
    )
    return InlineTable(alias=raw["alias"], column_definitions=coldefs, rows=rows)


def _hierarchy(raw) -> Hierarchy:
    return Hierarchy(
        name=raw["name"],
        table=_table(raw["table"]) if raw.get("table") else None,
        primary_key=raw.get("primary_key"),
        levels=tuple(_level(lv) for lv in raw["levels"]),
        inline_table=_inline_table(raw.get("inline_table")),
        default_member=raw.get("default_member"),
        annotations=_annotations(raw.get("annotations")),
    )


def _dimension(raw, *, is_shared: bool = False, foreign_key: str | None = None) -> Dimension:
    return Dimension(
        name=raw["name"],
        foreign_key=foreign_key if foreign_key is not None else raw.get("foreign_key"),
        hierarchies=tuple(_hierarchy(h) for h in raw["hierarchies"]),
        default_hierarchy=raw.get("default_hierarchy"),
        dim_type=DimensionType(raw.get("type", "standard")),
        is_shared=is_shared,
        annotations=_annotations(raw.get("annotations")),
    )


def _measure(raw) -> Measure:
    return Measure(
        name=raw["name"],
        column=raw["column"],
        aggregator=parse_aggregator(raw["aggregator"]),
        measure_type=MeasureType(raw.get("type", "standard")),
        annotations=_annotations(raw.get("annotations")),
        exact_scale=raw.get("exact_scale"),
    )


def schema_from_json(raw: str | dict) -> Schema:
    """Parse and validate a schema config (reference: Schema::from_json, lib.rs:76-79)."""
    cfg = json.loads(raw) if isinstance(raw, str) else raw

    shared = {d["name"]: d for d in cfg.get("shared_dimensions") or ()}

    cubes = []
    for craw in cfg["cubes"]:
        dims = [_dimension(d) for d in craw.get("dimensions") or ()]
        # shared-dimension instantiation (schema.rs:78-126): copy the shared dim
        # under the usage's name/foreign_key, merging annotations
        for usage in craw.get("dimension_usages") or ():
            src = shared.get(usage["source"])
            if src is None:
                raise SchemaError(
                    f"cube {craw['name']!r}: dimension_usage source {usage['source']!r}"
                    " not found in shared_dimensions"
                )
            dim = _dimension(src, is_shared=True, foreign_key=usage["foreign_key"])
            merged_ann = dim.annotations + _annotations(usage.get("annotations"))
            dims.append(
                Dimension(
                    name=usage.get("name") or dim.name,
                    foreign_key=usage["foreign_key"],
                    hierarchies=dim.hierarchies,
                    default_hierarchy=dim.default_hierarchy,
                    dim_type=dim.dim_type,
                    is_shared=True,
                    annotations=merged_ann,
                )
            )
        cubes.append(
            Cube(
                name=craw["name"],
                table=_table(craw["table"]),
                dimensions=tuple(dims),
                measures=tuple(_measure(m) for m in craw["measures"]),
                public=craw.get("public", "true") not in ("false", False),
                min_auth_level=craw.get("min_auth_level") or 0,
                annotations=_annotations(craw.get("annotations")),
            )
        )

    schema = Schema(
        name=cfg["name"],
        cubes=tuple(cubes),
        annotations=_annotations(cfg.get("annotations")),
        default_locale=cfg.get("default_locale"),
    )
    validate(schema)
    return schema


def schema_from_xml(raw: str) -> Schema:
    """XML schema → JSON dict shape → :func:`schema_from_json`
    (reference: Schema::from_xml, lib.rs:82-91; element names from
    schema/xml.rs: Schema/SharedDimension/Cube/Dimension/DimensionUsage/
    Hierarchy/Table/Level/Property/Measure/Annotation/InlineTable/ColumnDef/
    Row/Value, fields as attributes)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(raw)
    if root.tag != "Schema":
        raise SchemaError(f"expected <Schema> root, got <{root.tag}>")

    def annotations(el):
        anns = [
            {"name": a.get("name"), "text": a.text or ""}
            for a in el.findall("Annotation")
        ]
        return anns or None

    def table(el):
        t = el.find("Table")
        if t is None:
            return None
        return {k: t.get(k) for k in ("name", "schema", "primary_key") if t.get(k)}

    def prop(el):
        return {
            "name": el.get("name"),
            "column": el.get("column"),
            "caption_set": el.get("caption_set"),
            "annotations": annotations(el),
        }

    def level(el):
        return {
            "name": el.get("name"),
            "key_column": el.get("key_column"),
            "name_column": el.get("name_column"),
            "key_type": el.get("key_type"),
            "properties": [prop(p) for p in el.findall("Property")] or None,
            "annotations": annotations(el),
        }

    def inline_table(el):
        it = el.find("InlineTable")
        if it is None:
            return None
        return {
            "alias": it.get("alias"),
            "column_definitions": [
                {
                    "name": cd.get("name"),
                    "key_type": cd.get("key_type"),
                    "key_column_type": cd.get("key_column_type"),
                    "caption_set": cd.get("caption_set"),
                }
                for cd in it.findall("ColumnDef")
            ],
            "rows": [
                {
                    "row_values": [
                        {"column": v.get("column"), "value": v.text or ""}
                        for v in row.findall("Value")
                    ]
                }
                for row in it.findall("Row")
            ],
        }

    def hierarchy(el):
        return {
            "name": el.get("name"),
            "table": table(el),
            "primary_key": el.get("primary_key"),
            "default_member": el.get("default_member"),
            "levels": [level(lv) for lv in el.findall("Level")],
            "inline_table": inline_table(el),
            "annotations": annotations(el),
        }

    def dimension(el):
        return {
            "name": el.get("name"),
            "foreign_key": el.get("foreign_key"),
            "default_hierarchy": el.get("default_hierarchy"),
            "type": el.get("type", "standard"),
            "hierarchies": [hierarchy(h) for h in el.findall("Hierarchy")],
            "annotations": annotations(el),
        }

    def measure(el):
        # XML carries only the string aggregator form; parameterized
        # aggregators use the JSON schema format
        return {
            "name": el.get("name"),
            "column": el.get("column"),
            "aggregator": el.get("aggregator"),
            "type": el.get("type", "standard"),
            "annotations": annotations(el),
        }

    cfg = {
        "name": root.get("name"),
        "default_locale": root.get("default_locale"),
        "annotations": annotations(root),
        "shared_dimensions": [
            dimension(d) for d in root.findall("SharedDimension")
        ]
        or None,
        "cubes": [
            {
                "name": c.get("name"),
                "public": c.get("public", "true"),
                "min_auth_level": int(c.get("min_auth_level") or 0),
                "table": table(c),
                "dimensions": [dimension(d) for d in c.findall("Dimension")] or None,
                "dimension_usages": [
                    {
                        "source": u.get("source"),
                        "name": u.get("name"),
                        "foreign_key": u.get("foreign_key"),
                        "annotations": annotations(u),
                    }
                    for u in c.findall("DimensionUsage")
                ]
                or None,
                "measures": [measure(m) for m in c.findall("Measure")],
                "annotations": annotations(c),
            }
            for c in root.findall("Cube")
        ],
    }
    return schema_from_json(cfg)


def validate(schema: Schema) -> None:
    """Reference validation rules, lib.rs:94-151."""
    for cube in schema.cubes:
        if not cube.dimensions:
            raise SchemaError(f"cube {cube.name!r} must have at least one dimension")
        names = [d.name for d in cube.dimensions]
        if len(names) != len(set(names)):
            raise SchemaError(f"cube {cube.name!r} has duplicate dimension names")
        for dim in cube.dimensions:
            if len(dim.hierarchies) > 1:
                if not dim.default_hierarchy:
                    raise SchemaError(
                        f"dimension {dim.name!r} has multiple hierarchies but no"
                        " default_hierarchy"
                    )
                if dim.default_hierarchy not in {h.name for h in dim.hierarchies}:
                    raise SchemaError(
                        f"dimension {dim.name!r}: default_hierarchy"
                        f" {dim.default_hierarchy!r} does not name a hierarchy"
                    )
            hnames = [h.name for h in dim.hierarchies]
            if len(hnames) != len(set(hnames)):
                raise SchemaError(f"dimension {dim.name!r} has duplicate hierarchy names")
            for hier in dim.hierarchies:
                if not hier.levels:
                    raise SchemaError(
                        f"hierarchy {dim.name}.{hier.name} must have at least one level"
                    )
        mnames = [m.name for m in cube.measures]
        if len(mnames) != len(set(mnames)):
            raise SchemaError(f"cube {cube.name!r} has duplicate measure names")
