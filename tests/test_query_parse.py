"""Query/name parsing round-trips (reference analogs: names.rs:456-597,
query.rs:562-603)."""

from __future__ import annotations

import pytest

from tesseract_spark.query.model import (
    Calculation,
    Comparison,
    Cut,
    FilterQuery,
    GrowthQuery,
    LevelName,
    LimitQuery,
    Mask,
    Operator,
    Query,
    QueryParseError,
    RateQuery,
    RcaQuery,
    SortDirection,
    SortQuery,
    TopQuery,
)


def test_level_name():
    assert LevelName.parse("D.H.L") == LevelName("D", "H", "L")
    assert LevelName.parse("D.L") == LevelName("D", "D", "L")
    assert LevelName.parse("[Dim.A].[Hier.B].[Level.C]") == LevelName(
        "Dim.A", "Hier.B", "Level.C"
    )
    with pytest.raises(QueryParseError):
        LevelName.parse("justone")


def test_cut_parse():
    c = Cut.parse("D.H.L.1,2,3")
    assert c.level_name == LevelName("D", "H", "L")
    assert c.members == ("1", "2", "3")
    assert c.mask is Mask.INCLUDE and not c.for_match

    c = Cut.parse("~D.L.5")
    assert c.mask is Mask.EXCLUDE
    assert c.level_name == LevelName("D", "D", "L")
    assert c.members == ("5",)

    c = Cut.parse("*D.H.L.abc")
    assert c.for_match and c.members == ("abc",)

    c = Cut.parse("~*D.H.L.x,y")
    assert c.mask is Mask.EXCLUDE and c.for_match and c.members == ("x", "y")

    # bracketed with &[member]
    c = Cut.parse("[D].[H].[L].&[42]")
    assert c.level_name == LevelName("D", "H", "L") and c.members == ("42",)


def test_top_sort_limit():
    t = TopQuery.parse("2,D.H.L,mea,desc")
    assert t.n == 2 and t.by_dimension == LevelName("D", "H", "L")
    assert t.sort_mea_or_calc == ("mea",)
    assert t.sort_direction is SortDirection.DESC

    t2 = TopQuery.parse("3,D.L,rca,asc")
    assert t2.sort_mea_or_calc == (Calculation.RCA,)

    s = SortQuery.parse("My Measure.desc")
    assert s.measure == "My Measure" and s.direction is SortDirection.DESC

    l1 = LimitQuery.parse("10")
    assert l1.n == 10 and l1.offset is None
    l2 = LimitQuery.parse("5,10")
    assert l2.n == 10 and l2.offset == 5


def test_filters():
    f = FilterQuery.parse("Quantity.gt.100")
    assert f.by_mea_or_calc == "Quantity"
    assert f.constraint.comparison is Comparison.GT and f.constraint.n == 100.0
    assert f.operator is None

    f = FilterQuery.parse("Quantity.gte.100.and.lt.2000")
    assert f.operator is Operator.AND
    assert f.constraint.comparison is Comparison.GTE and f.constraint.n == 100.0
    assert f.constraint2.comparison is Comparison.LT and f.constraint2.n == 2000.0


def test_calcs():
    g = GrowthQuery.parse("Time.Year,Quantity")
    assert g.time_drill == LevelName("Time", "Time", "Year") and g.mea == "Quantity"
    assert g.div0 == "inf"  # ClickHouse-parity default since r8 (growth.rs:104)
    assert GrowthQuery.parse("Time.Year,Quantity", "inf").div0 == "inf"
    with pytest.raises(QueryParseError):
        GrowthQuery.parse("Time.Year,Quantity", "zero")
    # growth_offset: same-period-last-year extension (1 = reference parity)
    assert GrowthQuery.parse("Time.Year,Quantity").offset == 1
    assert GrowthQuery.parse("Time.Month,Quantity", "inf", "12").offset == 12
    with pytest.raises(QueryParseError):
        GrowthQuery.parse("Time.Year,Quantity", "inf", "0")
    with pytest.raises(QueryParseError):
        GrowthQuery.parse("Time.Year,Quantity", "inf", "twelve")

    r = RcaQuery.parse("Geo.Nation,Part.Brand,Extended Price")
    assert r.drill_1 == LevelName("Geo", "Geo", "Nation")
    assert r.drill_2 == LevelName("Part", "Part", "Brand")
    assert r.mea == "Extended Price"

    rt = RateQuery.parse("Flag.Flag.R,A")
    assert rt.level_name == LevelName("Flag", "Flag", "Flag") and rt.values == ("R", "A")


def test_query_from_params():
    q = Query.from_params(
        {
            "drilldowns": ["Ship Date.Year"],
            "cuts": ["Return Flag.Return Flag.R"],
            "measures": ["Quantity", "Extended Price"],
            "parents": "true",
            "limit": "10",
            "sparse": True,
        }
    )
    assert q.drilldowns == [LevelName("Ship Date", "Ship Date", "Year")]
    assert q.cuts[0].members == ("R",)
    assert q.measures == ["Quantity", "Extended Price"]
    assert q.parents and q.sparse
    assert q.limit.n == 10
