"""Metadata + members + diagnosis surfaces.

Mirrors the reference's `/cubes` metadata serialization
(tesseract-server/src/handlers/metadata.rs:25-198, schema/metadata.rs),
`/members` scans (lib.rs:211-322) and `/diagnosis` data-QA
(handlers/diagnosis.rs:128-215: orphan foreign keys via anti-join, duplicate
dimension primary keys via groupBy-count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .plans.builder import PlanBuilder
from .query.model import LevelName
from .schema.model import Cube, Schema


def schema_metadata(schema: Schema) -> dict:
    """Auth-free serializable metadata tree (metadata.rs:25-76)."""
    return {
        "name": schema.name,
        "cubes": [cube_metadata(c) for c in schema.cubes if c.public],
    }


def cube_metadata(cube: Cube) -> dict:
    return {
        "name": cube.name,
        "dimensions": [
            {
                "name": d.name,
                "type": d.dim_type.value,
                "hierarchies": [
                    {
                        "name": h.name,
                        "levels": [
                            {
                                "name": lv.name,
                                "key_type": lv.key_type.value,
                                "has_name_column": lv.name_column is not None,
                                "properties": [p.name for p in lv.properties],
                            }
                            for lv in h.levels
                        ],
                    }
                    for d_h in [d.hierarchies]
                    for h in d_h
                ],
            }
            for d in cube.dimensions
        ],
        "measures": [
            {"name": m.name, "aggregator": m.aggregator.kind} for m in cube.measures
        ],
        "annotations": {a.name: a.text for a in cube.annotations},
    }


def members_df(
    builder: PlanBuilder,
    cube_name: str,
    level: str | LevelName,
    locale: str | None = None,
) -> DataFrame:
    """Distinct (ID[, Label]) members of a level (members_sql, lib.rs:211-239).

    With ``locale`` (comma-separated list, lib.rs:243-322 members_locale_sql),
    the Label column is replaced by one ``"<LOCALE> Label"`` column per
    requested locale: the caption-set property (or inline-table caption
    column) matching that locale, plus — for the schema's default locale —
    the level's own name column. Locales with no matching caption set
    contribute no column, exactly like the reference.
    """
    cube = builder.schema.cube(cube_name)
    ln = level if isinstance(level, LevelName) else LevelName.parse(level)
    ref = builder.resolve_level(cube, ln)
    src = (
        builder.registry.load(cube.table)
        if ref.degenerate
        else builder._dim_df(ref.hier)
    )
    cols = [F.col(ref.level.key_column).alias("ID")]
    if locale is None:
        if ref.level.name_column:
            cols.append(F.col(ref.level.name_column).alias("Label"))
    else:
        for loc in locale.split(","):
            if ref.hier.inline_table is not None:
                for cd in ref.hier.inline_table.column_definitions:
                    if cd.caption_set == loc:
                        cols.append(F.col(cd.name).alias(f"{loc.upper()} Label"))
                        break
            else:
                for prop in ref.level.properties:
                    if prop.caption_set == loc:
                        cols.append(F.col(prop.column).alias(f"{loc.upper()} Label"))
                        break
                # NOT elif: the reference appends the name column for the
                # default locale even when a caption property also matched
                if loc == builder.schema.default_locale and ref.level.name_column:
                    cols.append(
                        F.col(ref.level.name_column).alias(f"{loc.upper()} Label")
                    )
    return src.select(*cols).distinct().orderBy("ID")


def diagnosis_dfs(builder: PlanBuilder, cube_name: str) -> dict[str, DataFrame]:
    """Per joined dimension: orphan fact FKs (left_anti) and duplicate dim
    primary keys (diagnosis.rs:140-147, 167-180)."""
    cube = builder.schema.cube(cube_name)
    fact = builder.registry.load(cube.table)
    out: dict[str, DataFrame] = {}
    for dim in cube.dimensions:
        for hier in dim.hierarchies:
            if hier.is_degenerate() or dim.foreign_key is None:
                continue
            dim_df = builder._dim_df(hier)
            pk = hier.effective_primary_key()
            orphans = (
                fact.select(F.col(dim.foreign_key).alias("orphan_fk"))
                .distinct()
                .join(dim_df, F.col("orphan_fk") == F.col(pk), "left_anti")
            )
            dupes = (
                dim_df.groupBy(F.col(pk).alias("dup_key"))
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > 1)
            )
            out[f"{dim.name}.{hier.name}.orphan_fks"] = orphans
            out[f"{dim.name}.{hier.name}.duplicate_keys"] = dupes
    return out
