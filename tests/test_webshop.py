"""Webshop fixture (FIXTURES.md §A) — reproduces the reference's integration
test schema and its canonical asserted query
(tests/src/clickhouse_end_to_end.rs:54-131, 205-214), plus locale captions."""

from __future__ import annotations

import pytest

from tesseract_spark.plans.builder import PlanBuilder
from tesseract_spark.query.model import Query
from tesseract_spark.schema.parse import schema_from_json
from tesseract_spark.sources.registry import TableRegistry

WEBSHOP_SCHEMA = {
    "name": "webshop",
    "default_locale": "en",
    "shared_dimensions": [
        {
            "name": "Geography",
            "type": "geo",
            "hierarchies": [
                {
                    "name": "Geography",
                    "table": {"name": "tesseract_webshop_geographies"},
                    "primary_key": "country_id",
                    "levels": [
                        {
                            "name": "Continent",
                            "key_column": "continent_id",
                            "name_column": "continent_name",
                            "key_type": "text",
                            "properties": [
                                {
                                    "name": "Continent PT",
                                    "column": "continent_name_pt",
                                    "caption_set": "pt",
                                },
                                {
                                    "name": "Continent ES",
                                    "column": "continent_name_es",
                                    "caption_set": "es",
                                },
                            ],
                        },
                        {
                            "name": "Country",
                            "key_column": "country_id",
                            "name_column": "country_name",
                            "properties": [
                                {
                                    "name": "Country PT",
                                    "column": "country_name_pt",
                                    "caption_set": "pt",
                                }
                            ],
                        },
                    ],
                }
            ],
        }
    ],
    "cubes": [
        {
            "name": "Sales",
            "table": {"name": "tesseract_webshop_sales"},
            "dimension_usages": [
                {"source": "Geography", "foreign_key": "country_id"}
            ],
            "dimensions": [
                {
                    "name": "Year",
                    "foreign_key": None,
                    "type": "time",
                    "hierarchies": [
                        {"name": "Year", "levels": [{"name": "Year", "key_column": "year"}]}
                    ],
                },
                {
                    "name": "Category",
                    "foreign_key": "category_id",
                    "hierarchies": [
                        {
                            "name": "Category",
                            "primary_key": "category_idx",
                            "inline_table": {
                                "alias": "tesseract_webshop_categories",
                                "column_definitions": [
                                    {"name": "category_idx", "key_type": "nontext"},
                                    {"name": "category_name", "key_type": "text"},
                                    {
                                        "name": "category_name_pt",
                                        "key_type": "text",
                                        "caption_set": "pt",
                                    },
                                ],
                                "rows": [
                                    {
                                        "row_values": [
                                            {"column": "category_idx", "value": "1"},
                                            {"column": "category_name", "value": "Books"},
                                            {"column": "category_name_pt", "value": "Livros"},
                                        ]
                                    },
                                    {
                                        "row_values": [
                                            {"column": "category_idx", "value": "2"},
                                            {"column": "category_name", "value": "Sports"},
                                            {"column": "category_name_pt", "value": "Esportes"},
                                        ]
                                    },
                                    {
                                        "row_values": [
                                            {"column": "category_idx", "value": "3"},
                                            {"column": "category_name", "value": "Various"},
                                            {"column": "category_name_pt", "value": "Vários"},
                                        ]
                                    },
                                    {
                                        "row_values": [
                                            {"column": "category_idx", "value": "4"},
                                            {"column": "category_name", "value": "Videos"},
                                            {"column": "category_name_pt", "value": "Vídeos"},
                                        ]
                                    },
                                ],
                            },
                            "levels": [
                                {
                                    "name": "Category",
                                    "key_column": "category_idx",
                                    "name_column": "category_name",
                                    "properties": [
                                        {
                                            "name": "Category PT",
                                            "column": "category_name_pt",
                                            "caption_set": "pt",
                                        }
                                    ],
                                }
                            ],
                        }
                    ],
                },
            ],
            "measures": [
                {"name": "Price Total", "column": "price_total", "aggregator": "sum"},
                {"name": "Quantity", "column": "quantity", "aggregator": "sum"},
            ],
        }
    ],
}

SALES_ROWS = [
    # country_id, year, month_id, category_id, price_total, quantity
    (1, 2017, 1, 1, 100.0, 130.0),
    (1, 2017, 2, 2, 200.0, 136.0),
    (2, 2017, 1, 1, 50.0, 0.0),
    (2, 2018, 3, 3, 80.0, 10.0),
    (3, 2018, 2, 4, 20.0, 5.0),
]

GEO_ROWS = [
    # continent_id, continent_name, *_pt, *_es, country_id, country_name, *_pt, *_es
    ("eu", "Europe", "Europa", "Europa", 1, "Germany", "Alemanha", "Alemania"),
    ("eu", "Europe", "Europa", "Europa", 2, "France", "França", "Francia"),
    ("na", "North America", "América do Norte", "Norteamérica", 3, "USA", "EUA", "EE.UU."),
]


@pytest.fixture(scope="module")
def webshop_builder(spark):
    schema = schema_from_json(WEBSHOP_SCHEMA)
    reg = TableRegistry(spark)
    reg.register(
        "tesseract_webshop_sales",
        spark.createDataFrame(
            SALES_ROWS,
            "country_id int, year int, month_id int, category_id long,"
            " price_total double, quantity double",
        ),
    )
    reg.register(
        "tesseract_webshop_geographies",
        spark.createDataFrame(
            GEO_ROWS,
            "continent_id string, continent_name string, continent_name_pt string,"
            " continent_name_es string, country_id int, country_name string,"
            " country_name_pt string, country_name_es string",
        ),
    )
    return PlanBuilder(spark, schema, reg)


def test_reference_e2e_query(webshop_builder):
    """`/data?cube=Sales&drilldowns=Year&measures=Quantity&Year=2017` →
    [{"Year": 2017, "Quantity": 266.0}] (clickhouse_end_to_end.rs:205-214)."""
    q = Query.from_params(
        {"drilldowns": ["Year.Year"], "measures": ["Quantity"], "cuts": ["Year.Year.2017"]}
    )
    rows = webshop_builder.dataframe("Sales", q).collect()
    assert [r.asDict() for r in rows] == [{"Year": 2017, "Quantity": 266.0}]


def test_shared_dim_drill_with_caption(webshop_builder):
    q = Query.from_params(
        {
            "drilldowns": ["Geography.Geography.Continent"],
            "measures": ["Price Total"],
            "captions": ["Geography.Geography.Continent.Continent PT"],
        }
    )
    rows = {r["Continent"]: r.asDict() for r in webshop_builder.dataframe("Sales", q).collect()}
    # caption column replaces the name column under the same alias
    assert rows["Europa"]["Price Total"] == 430.0
    assert rows["América do Norte"]["Price Total"] == 20.0


def test_inline_table_caption(webshop_builder):
    q = Query.from_params(
        {
            "drilldowns": ["Category.Category"],
            "measures": ["Quantity"],
            "captions": ["Category.Category.Category.Category PT"],
        }
    )
    rows = {r["Category"]: r["Quantity"] for r in webshop_builder.dataframe("Sales", q).collect()}
    assert rows == {"Livros": 130.0, "Esportes": 136.0, "Vários": 10.0, "Vídeos": 5.0}


def test_members_locale_captions(webshop_builder):
    """/members?locale= (members_locale_sql, tesseract-core/src/lib.rs:243-322):
    one '<LOCALE> Label' column per requested locale — caption-set property
    match, plus the name column for the schema's default locale."""
    from tesseract_spark.metadata import members_df

    df = members_df(
        webshop_builder, "Sales", "Geography.Geography.Continent", locale="pt,es"
    )
    assert df.columns == ["ID", "PT Label", "ES Label"]
    rows = {r["ID"]: r.asDict() for r in df.collect()}
    assert rows["na"]["PT Label"] == "América do Norte"
    assert rows["na"]["ES Label"] == "Norteamérica"
    assert rows["eu"]["PT Label"] == "Europa"

    # default locale -> the level's own name column, reference header shape
    df_en = members_df(
        webshop_builder, "Sales", "Geography.Geography.Country", locale="en"
    )
    assert df_en.columns == ["ID", "EN Label"]
    assert {r["EN Label"] for r in df_en.collect()} == {"Germany", "France", "USA"}

    # unknown locale contributes no column (reference: silently skipped)
    df_fr = members_df(
        webshop_builder, "Sales", "Geography.Geography.Continent", locale="fr"
    )
    assert df_fr.columns == ["ID"]

    # no locale param -> unchanged base contract
    base = members_df(webshop_builder, "Sales", "Geography.Geography.Continent")
    assert base.columns == ["ID", "Label"]


def test_members_locale_inline_table(webshop_builder):
    """Inline-table hierarchies take captions from column_definitions'
    caption_set (lib.rs:273-287)."""
    from tesseract_spark.metadata import members_df

    df = members_df(webshop_builder, "Sales", "Category.Category.Category", locale="pt")
    assert df.columns == ["ID", "PT Label"]
    assert {r["PT Label"] for r in df.collect()} == {
        "Livros", "Esportes", "Vários", "Vídeos"
    }


def test_members_locale_endpoint(webshop_builder):
    """Server route passes ?locale= through to the members scan."""
    import json
    import threading
    import urllib.request

    from tesseract_spark.server.app import make_server

    srv = make_server(webshop_builder, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = (
            f"http://127.0.0.1:{srv.server_address[1]}/cubes/Sales/"
            "members.jsonrecords?level=Geography.Geography.Continent&locale=pt"
        )
        with urllib.request.urlopen(url, timeout=120) as r:
            body = json.loads(r.read())
        assert set(body["data"][0]) == {"ID", "PT Label"}
        assert {row["PT Label"] for row in body["data"]} == {
            "Europa", "América do Norte"
        }
    finally:
        srv.shutdown()


def test_parents_with_parent_caption(webshop_builder):
    q = Query.from_params(
        {
            "drilldowns": ["Geography.Geography.Country"],
            "measures": ["Quantity"],
            "parents": "true",
            "captions": ["Geography.Geography.Continent.Continent PT"],
        }
    )
    df = webshop_builder.dataframe("Sales", q)
    assert df.columns == [
        "Continent ID",
        "Continent",
        "Country ID",
        "Country",
        "Quantity",
    ]
    rows = {r["Country"]: r["Continent"] for r in df.collect()}
    assert rows["Germany"] == "Europa"
