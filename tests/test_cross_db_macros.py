"""Cross-db macro shims, behavior pinned by the reference's
functional fixtures (``tests/functional/adapter/utils/``). r15
review: listagg's order_by_clause/limit_num were silently ignored —
the reference's fixture_listagg.py pins ordered + limited output.
"""

from __future__ import annotations


LISTAGG_SEED = """group_col,string_text,order_col
1,a,1
1,b,2
1,c,3
2,a,2
2,1,1
2,p,3
3,g,1
3,g,2
3,g,3
"""


def test_listagg_reference_fixture(make_project, spark):
    """The reference's listagg expected outputs (fixture_listagg.py):
    bottom_ordered, bottom_ordered_limited, comma_whitespace_unordered,
    distinct_comma, no_params."""
    files = {
        "dbt_project.yml": (
            "name: xdb\nmodel-paths: [models]\nseed-paths: [seeds]\n"
        ),
        "seeds/data_listagg.csv": LISTAGG_SEED,
        "models/listagg_out.sql": """
select group_col,
       {{ listagg('string_text', "'_|_'", "order by order_col") }}
           as bottom_ordered,
       {{ listagg('string_text', "'_|_'", "order by order_col", 2) }}
           as bottom_ordered_limited
from {{ ref('data_listagg') }}
group by group_col
""",
        "models/listagg_g3.sql": """
select group_col,
       {{ listagg('string_text', "', '") }} as comma_whitespace_unordered,
       {{ listagg('DISTINCT string_text', "','") }} as distinct_comma,
       {{ listagg('string_text') }} as no_params
from {{ ref('data_listagg') }}
where group_col = 3
group by group_col
""",
    }
    runner = make_project(files, schema="t_xdb_listagg")
    assert runner.seed().ok
    res = runner.run()
    assert res.ok, [str(r.message) for r in res.results]

    rows = {
        r["group_col"]: r
        for r in spark.table("t_xdb_listagg.listagg_out").collect()
    }
    assert rows[1]["bottom_ordered"] == "a_|_b_|_c"
    assert rows[2]["bottom_ordered"] == "1_|_a_|_p"
    assert rows[3]["bottom_ordered"] == "g_|_g_|_g"
    assert rows[1]["bottom_ordered_limited"] == "a_|_b"
    assert rows[2]["bottom_ordered_limited"] == "1_|_a"
    assert rows[3]["bottom_ordered_limited"] == "g_|_g"

    g3 = spark.table("t_xdb_listagg.listagg_g3").collect()[0]
    assert g3["comma_whitespace_unordered"] == "g, g, g"
    assert g3["distinct_comma"] == "g"
    assert g3["no_params"] == "g,g,g"


def test_listagg_desc_order(make_project, spark):
    files = {
        "dbt_project.yml": (
            "name: xdb2\nmodel-paths: [models]\nseed-paths: [seeds]\n"
        ),
        "seeds/data_listagg.csv": LISTAGG_SEED,
        "models/listagg_desc.sql": """
select group_col,
       {{ listagg('string_text', "'-'", "order by order_col desc") }} as v
from {{ ref('data_listagg') }}
where group_col = 1
group by group_col
""",
    }
    runner = make_project(files, schema="t_xdb_listagg2")
    assert runner.seed().ok
    assert runner.run().ok
    row = spark.table("t_xdb_listagg2.listagg_desc").collect()[0]
    assert row["v"] == "c-b-a"
