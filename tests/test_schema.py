"""Schema model + parser tests (reference test analogs: lib.rs:1298-1418,
schema.rs:737-846)."""

from __future__ import annotations

import pytest

from tesseract_spark.schema.aggregator import (
    Average,
    Custom,
    Moe,
    ReplicateWeightMoe,
    Sum,
    WeightedAverage,
    parse_aggregator,
)
from tesseract_spark.schema.parse import SchemaError, schema_from_json


def test_parse_aggregators():
    assert parse_aggregator("sum") == Sum()
    assert parse_aggregator("avg") == Average()
    assert parse_aggregator({"custom": "sum({}*2)"}) == Custom(template="sum({}*2)")
    assert parse_aggregator({"weighted_avg": {"weight_column": "w"}}) == WeightedAverage(
        weight_column="w"
    )
    assert parse_aggregator({"moe": {"critical_value": 1.645}}) == Moe(critical_value=1.645)
    rw = parse_aggregator(
        {
            "replicate_weight_moe": {
                "critical_value": 1.645,
                "design_factor": 4.0,
                "secondary_columns": ["a", "b"],
            }
        }
    )
    assert rw == ReplicateWeightMoe(
        critical_value=1.645, design_factor=4.0, secondary_columns=("a", "b")
    )
    with pytest.raises(ValueError):
        parse_aggregator("nope")


BASIC = {
    "name": "s",
    "cubes": [
        {
            "name": "c",
            "table": {"name": "fact"},
            "dimensions": [
                {
                    "name": "D",
                    "foreign_key": "fk",
                    "hierarchies": [
                        {
                            "name": "D",
                            "table": {"name": "dim", "primary_key": "id"},
                            "levels": [{"name": "L", "key_column": "id"}],
                        }
                    ],
                }
            ],
            "measures": [{"name": "M", "column": "v", "aggregator": "sum"}],
        }
    ],
}


def test_parse_basic_schema():
    s = schema_from_json(BASIC)
    cube = s.cube("c")
    assert cube.table.name == "fact"
    assert cube.dimension("D").hierarchy(None).effective_primary_key() == "id"
    assert cube.measure("M").aggregator == Sum()


def test_shared_dimension_copy_down():
    # schema.rs:78-126 semantics
    cfg = {
        "name": "s",
        "shared_dimensions": [
            {
                "name": "Geo",
                "hierarchies": [
                    {
                        "name": "Geo",
                        "table": {"name": "geo", "primary_key": "gid"},
                        "levels": [{"name": "Country", "key_column": "gid"}],
                    }
                ],
            }
        ],
        "cubes": [
            {
                "name": "c",
                "table": {"name": "fact"},
                "dimension_usages": [
                    {"source": "Geo", "foreign_key": "geo_id", "name": "Customer Geo"}
                ],
                "measures": [{"name": "M", "column": "v", "aggregator": "sum"}],
            }
        ],
    }
    s = schema_from_json(cfg)
    dim = s.cube("c").dimension("Customer Geo")
    assert dim.is_shared
    assert dim.foreign_key == "geo_id"
    assert dim.hierarchies[0].table.name == "geo"


def test_validation_errors():
    bad = {
        "name": "s",
        "cubes": [
            {
                "name": "c",
                "table": {"name": "fact"},
                "dimensions": [],
                "measures": [{"name": "M", "column": "v", "aggregator": "sum"}],
            }
        ],
    }
    with pytest.raises(SchemaError):
        schema_from_json(bad)

    multi_no_default = {
        "name": "s",
        "cubes": [
            {
                "name": "c",
                "table": {"name": "fact"},
                "dimensions": [
                    {
                        "name": "D",
                        "foreign_key": "fk",
                        "hierarchies": [
                            {"name": "h1", "levels": [{"name": "L", "key_column": "k"}]},
                            {"name": "h2", "levels": [{"name": "L", "key_column": "k"}]},
                        ],
                    }
                ],
                "measures": [{"name": "M", "column": "v", "aggregator": "sum"}],
            }
        ],
    }
    with pytest.raises(SchemaError):
        schema_from_json(multi_no_default)


def test_xml_schema_shared_dims():
    # the reference's own XML test fixture (lib.rs:1350-1374)
    from tesseract_spark.schema.parse import schema_from_xml

    s = """
        <Schema name="my_schema">
            <SharedDimension name="Geo">
                <Hierarchy name="Country">
                    <Level name="Country" key_column="id" />
                </Hierarchy>
            </SharedDimension>
            <Cube name="my_cube">
                <Table name="my_table" />
                <DimensionUsage name="Import Countries" source="Geo" foreign_key="country_id" />
                <DimensionUsage name="Export Countries" source="Geo" foreign_key="country_id" />
                <Measure name="my_mea" column="mea" aggregator="sum" />
            </Cube>
        </Schema>
    """
    schema = schema_from_xml(s)
    cube = schema.cube("my_cube")
    assert [d.name for d in cube.dimensions] == ["Import Countries", "Export Countries"]
    assert all(d.hierarchies[0].name == "Country" for d in cube.dimensions)
    assert all(d.foreign_key == "country_id" for d in cube.dimensions)


def test_xml_schema_inline_table_and_levels():
    from tesseract_spark.schema.parse import schema_from_xml

    s = """
        <Schema name="s">
            <Cube name="c">
                <Table name="fact" primary_key="pk" />
                <Dimension name="D" foreign_key="fk" type="time">
                    <Hierarchy name="H" primary_key="k" default_member="D.H.L.1">
                        <InlineTable alias="it">
                            <ColumnDef name="k" key_type="nontext" />
                            <ColumnDef name="n" key_type="text" />
                            <Row><Value column="k">1</Value><Value column="n">One</Value></Row>
                        </InlineTable>
                        <Level name="L" key_column="k" name_column="n">
                            <Property name="P" column="p" caption_set="pt" />
                        </Level>
                    </Hierarchy>
                </Dimension>
                <Measure name="M" column="v" aggregator="avg" />
            </Cube>
        </Schema>
    """
    schema = schema_from_xml(s)
    hier = schema.cube("c").dimension("D").hierarchies[0]
    assert hier.inline_table.rows == ({"k": "1", "n": "One"},)
    assert hier.default_member == "D.H.L.1"
    assert hier.levels[0].properties[0].caption_set == "pt"


def test_fixture_schema_loads():
    from tesseract_spark import testdata_schema

    s = testdata_schema()
    cube = s.cube("lineitem_sales")
    assert len(cube.dimensions) == 7
    assert len(cube.measures) == 21  # r9: + P90 Price Binned; r10: the
    # P50/P90 Price buffering Custom-percentile measures moved to the
    # score_bands inline-fact cube (VERDICT r9 #3)
    inline = cube.dimension("Line Status").hierarchies[0].inline_table
    assert inline is not None and len(inline.rows) == 2
