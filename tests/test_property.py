"""Property-based oracle testing: random queries from a restricted family are
compiled by the PlanBuilder AND by an independent SQL generator, then compared.
Catches combination bugs single-example tests miss (cut×drill×filter interplay)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tesseract_spark.query.model import Query

from .conftest import assert_df_matches_sql

# drill name → (alias cols SQL, group-by exprs, join needed)
DRILLS = {
    "Ship Date.Year": ('year(l_shipdate)::INT AS "Year"', ['"Year"'], None),
    "Return Flag.Return Flag": ('l_returnflag AS "Return Flag"', ['"Return Flag"'], None),
    "Part.Brand": ('p.p_brand AS "Brand"', ['"Brand"'], "part"),
    "Line Status.Line Status.Status": (
        's.status_key AS "Status ID", s.status_name AS "Status"',
        ['"Status ID"', '"Status"'],
        "status",
    ),
}

MEASURES = {
    "Quantity": "sum(l_quantity)",
    "Row Count": "count(l_linenumber)",
    "Max Tax": "max(l_tax)",
    "Custom Net": "sum(l_extendedprice * (1 - l_discount))",
}

JOINS = {
    "part": "JOIN part p ON l.l_partkey = p.p_partkey",
    "status": (
        "JOIN (VALUES ('O','Open'),('F','Finished')) AS s(status_key, status_name)"
        " ON l.l_linestatus = s.status_key"
    ),
}


@st.composite
def query_and_oracle(draw):
    drills = draw(
        st.lists(st.sampled_from(sorted(DRILLS)), min_size=1, max_size=3, unique=True)
    )
    measures = draw(
        st.lists(st.sampled_from(sorted(MEASURES)), min_size=1, max_size=3, unique=True)
    )
    params: dict = {"drilldowns": drills, "measures": measures, "cuts": []}
    where = []

    if draw(st.booleans()):
        flags = draw(
            st.lists(st.sampled_from(["A", "N", "R"]), min_size=1, max_size=2, unique=True)
        )
        exclude = draw(st.booleans())
        prefix = "~" if exclude else ""
        params["cuts"].append(
            f"{prefix}Return Flag.Return Flag.{','.join(flags)}"
        )
        lits = ", ".join(f"'{f}'" for f in flags)
        where.append(
            f"l.l_returnflag {'NOT IN' if exclude else 'IN'} ({lits})"
        )
    if draw(st.booleans()):
        years = draw(
            st.lists(st.integers(1995, 2001), min_size=1, max_size=3, unique=True)
        )
        params["cuts"].append(
            "Ship Date.Ship Date.Year." + ",".join(str(y) for y in years)
        )
        where.append(f"year(l_shipdate) IN ({', '.join(str(y) for y in years)})")
    if draw(st.booleans()):
        regions = draw(
            st.lists(st.integers(0, 4), min_size=1, max_size=2, unique=True)
        )
        params["cuts"].append(
            "Customer Geography.Geography.Region." + ",".join(str(r) for r in regions)
        )
        where.append(
            "l.l_orderkey IN (SELECT o.o_orderkey FROM orders o"
            " JOIN customer c ON o.o_custkey = c.c_custkey"
            " JOIN nation n ON c.c_nationkey = n.n_nationkey"
            f" WHERE n.n_regionkey IN ({', '.join(str(r) for r in regions)}))"
        )

    having = ""
    if "Quantity" in measures and draw(st.booleans()):
        threshold = draw(st.integers(0, 2000))
        params["filters"] = [f"Quantity.gt.{threshold}"]
        having = f"HAVING sum(l_quantity) > {threshold}"

    sel_parts, group_parts, join_names = [], [], []
    for d in drills:
        sel, grp, join = DRILLS[d]
        sel_parts.append(sel)
        group_parts.extend(grp)
        if join:
            join_names.append(join)
    mea_parts = [f'{MEASURES[m]} AS "{m}"' for m in measures]
    joins = " ".join(JOINS[j] for j in dict.fromkeys(join_names))
    sql = f"""
    SELECT {", ".join(sel_parts)}, {", ".join(mea_parts)}
    FROM lineitem l {joins}
    {"WHERE " + " AND ".join(where) if where else ""}
    GROUP BY {", ".join(group_parts)} {having}
    """
    return params, sql


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(query_and_oracle())
def test_random_query_matches_oracle(builder, duck, qo):
    params, sql = qo
    df = builder.dataframe("lineitem_sales", Query.from_params(params))
    assert_df_matches_sql(df, duck, sql, rtol=1e-6)
