"""BNF-level syntax gate for the table-format statements the engine
emits but cannot execute in-sandbox (VERDICT r8 ask #5): every
dispatch output — MERGE INTO (incremental merge + snapshot SCD-2),
INSERT INTO ... REPLACE WHERE (microbatch on delta/iceberg), CREATE
OR REPLACE TABLE ... SHALLOW CLONE — round-trips through
``sparkt/sqlcheck.py``, parameterized over reserved-word identifiers
and multi-column unique keys. MERGE is also in vanilla Spark's
grammar, so accepted merges are cross-checked against Spark's own
parser (the statement can't RUN here, but it can PARSE)."""

from __future__ import annotations

import pytest

from sparkt.adapter import SparkAdapter
from sparkt.relation import Relation
from sparkt.sqlcheck import (
    MalformedStatement,
    check_merge_into,
    check_replace_where,
    check_shallow_clone,
    check_table_format_sql,
)

MERGE_CASES = [
    # (unique_key, columns, predicates, update_columns, exclude_columns)
    (["id"], ["id", "v"], None, None, None),
    # multi-column key + incremental_predicates
    (
        ["id", "src"],
        ["id", "src", "v", "loaded_at"],
        ["DBT_INTERNAL_DEST.loaded_at > current_date() - 7",
         "DBT_INTERNAL_SOURCE.`v` IS NOT NULL"],
        None,
        None,
    ),
    # explicit merge_update_columns
    (["id"], ["id", "a", "b"], None, ["a"], None),
    # merge_exclude_columns
    (["id"], ["id", "a", "b"], None, None, ["b"]),
    # reserved-word identifiers everywhere the emitter quotes
    (
        ["order", "select"],
        ["order", "select", "from", "group"],
        None,
        ["from"],
        None,
    ),
]


def _spark_parses(spark, sql: str) -> None:
    """Cross-check: vanilla Spark's parser (parse-only, no analysis)
    accepts the statement."""
    spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)


@pytest.mark.parametrize(
    "uk,cols,preds,upd,excl", MERGE_CASES,
    ids=["single-key", "multikey-predicates", "update-cols",
         "exclude-cols", "reserved-words"],
)
def test_merge_into_round_trips_validator_and_spark_parser(
    spark, uk, cols, preds, upd, excl
):
    for ident in ("tgt", "order"):  # incl. reserved-word TARGET name
        sql = SparkAdapter.merge_into_sql(
            Relation(schema="s", identifier=ident),
            "SELECT * FROM stage WHERE v > 0",
            unique_key=uk, columns=cols, predicates=preds,
            update_columns=upd, exclude_columns=excl,
        )
        assert check_merge_into(sql) == sql
        _spark_parses(spark, sql)


def test_snapshot_merge_round_trips_validator_and_spark_parser(spark):
    for ident, cols in [
        ("snap", ["id", "v", "dbt_scd_id", "dbt_valid_from",
                  "dbt_valid_to"]),
        # reserved-word target + reserved-word tracked columns
        ("table", ["order", "select", "dbt_scd_id", "dbt_valid_from",
                   "dbt_valid_to"]),
    ]:
        sql = SparkAdapter.snapshot_merge_sql(
            Relation(schema="snaps", identifier=ident),
            "SELECT s.*, 'insert' AS dbt_change_type FROM staging s",
            insert_cols=cols,
        )
        assert check_merge_into(sql) == sql
        _spark_parses(spark, sql)


def test_replace_where_emission_shape_validates():
    # exactly the statement shape materialize_incremental emits for
    # delta/iceberg microbatch windows (incremental.py), over plain
    # and reserved-word relation/event-time names
    for rel, et in [
        (Relation(schema="s", identifier="mb_daily"), "`ts`"),
        (Relation(schema="s", identifier="order"), "`select`"),
    ]:
        window = (
            f"{et} >= TIMESTAMP '2024-01-04 00:00:00' "
            f"AND {et} < TIMESTAMP '2024-01-05 00:00:00'"
        )
        src = ("SELECT * FROM (SELECT `id`, `ts` FROM src) __mb "
               f"WHERE {window}")
        sql = (f"INSERT INTO {rel.render()} "
               f"REPLACE WHERE {window} {src}")
        assert check_replace_where(sql) == sql
        assert check_table_format_sql(sql) == sql


def test_shallow_clone_emission_validates():
    for tgt, src in [
        (Relation(schema="dev", identifier="orders"), "prod.orders"),
        # reserved-word identifiers must come out backquoted and pass
        (Relation(schema="dev", identifier="order"),
         Relation(schema="prod", identifier="order").render()),
    ]:
        sql = (f"CREATE OR REPLACE TABLE {tgt.render()} "
               f"SHALLOW CLONE {src}")
        assert check_shallow_clone(sql) == sql


def test_reserved_relation_identifier_renders_backquoted():
    # the bug this gate caught on arrival (r9): ANSI mode is Spark 4's
    # default, where a bare reserved identifier is a parse error
    assert Relation(schema="s", identifier="order").render() == "s.`order`"
    assert Relation(schema="group", identifier="t").render() == "`group`.t"


MALFORMED = [
    # unquoted reserved word as the merge target
    ("merge", "MERGE INTO s.order AS D USING (SELECT 1) AS S ON D.a = S.a\n"
              "WHEN MATCHED THEN UPDATE SET *\n"
              "WHEN NOT MATCHED THEN INSERT *"),
    # INSERT column/value arity mismatch
    ("merge", "MERGE INTO s.t AS D USING (SELECT 1) AS S ON D.a = S.a\n"
              "WHEN NOT MATCHED THEN INSERT (`a`, `b`) VALUES (S.`a`)"),
    # no WHEN clause at all
    ("merge", "MERGE INTO s.t AS D USING (SELECT 1) AS S ON D.a = S.a"),
    # unbalanced parens in the USING subquery
    ("merge", "MERGE INTO s.t AS D USING (SELECT f(x FROM u) AS S "
              "ON D.a = S.a WHEN MATCHED THEN UPDATE SET *"),
    # unterminated backquote
    ("merge", "MERGE INTO s.`t AS D USING (SELECT 1) AS S ON D.a = S.a\n"
              "WHEN MATCHED THEN UPDATE SET *"),
    # dangling AND in the ON condition
    ("merge", "MERGE INTO s.t AS D USING (SELECT 1) AS S ON D.a = S.a AND\n"
              "WHEN MATCHED THEN UPDATE SET *"),
    # empty UPDATE SET
    ("merge", "MERGE INTO s.t AS D USING (SELECT 1) AS S ON D.a = S.a\n"
              "WHEN MATCHED THEN UPDATE SET"),
    # REPLACE WHERE predicate with no payload select
    ("rw", "INSERT INTO s.t REPLACE WHERE `ts` >= TIMESTAMP "
           "'2024-01-01 00:00:00'"),
    # predicate placement error: payload select BEFORE the predicate
    ("rw", "INSERT INTO s.t REPLACE WHERE SELECT * FROM src"),
    # clone with trailing garbage
    ("clone", "CREATE OR REPLACE TABLE dev.t SHALLOW CLONE prod.t "
              "WHERE x = 1"),
    # clone missing the source
    ("clone", "CREATE OR REPLACE TABLE dev.t SHALLOW CLONE"),
]


@pytest.mark.parametrize(
    "kind,sql", MALFORMED,
    ids=["reserved-target", "insert-arity", "no-when",
         "unbalanced-using", "unterminated-backquote", "dangling-and",
         "empty-update-set", "rw-no-payload", "rw-select-as-predicate",
         "clone-trailing", "clone-no-source"],
)
def test_malformed_statements_fail_loudly(kind, sql):
    checker = {
        "merge": check_merge_into,
        "rw": check_replace_where,
        "clone": check_shallow_clone,
    }[kind]
    with pytest.raises(MalformedStatement):
        checker(sql)


def test_non_table_format_sql_passes_through():
    assert check_table_format_sql("SELECT 1") == "SELECT 1"
    assert check_table_format_sql(
        "INSERT INTO s.t SELECT * FROM u"
    ) == "INSERT INTO s.t SELECT * FROM u"


def test_validator_accepts_real_world_compiled_sql():
    """r9 review fix: embedded user SQL (the USING subquery / payload
    select) legitimately contains line+block comments with
    apostrophes, double-quoted strings, array subscripts and
    parameter-marker characters — the tokenizer must not reject any
    of them."""
    rel = Relation(schema="s", identifier="t")
    sources = [
        "select * from u -- don't include archived rows\nwhere ok",
        'select * from u where region = "EMEA"',
        "select ids[0] as id, v from u /* block 'comment' */",
        "select 'don\\'t' as w, m['k'] as mk from u",
        "select x from u where y = :param and z = ?",
    ]
    for src in sources:
        sql = SparkAdapter.merge_into_sql(rel, src, ["id"], ["id", "v"])
        assert check_merge_into(sql) == sql
    # subscripts inside grammar-parsed predicates too
    for p in [
        "DBT_INTERNAL_DEST.tags[0] = 'gold'",
        "DBT_INTERNAL_DEST.meta['tier'] IS NOT NULL",
        'DBT_INTERNAL_DEST."Quoted Col" = 1',
    ]:
        sql = SparkAdapter.merge_into_sql(
            rel, "SELECT 1", ["id"], ["id"], predicates=[p]
        )
        assert check_merge_into(sql) == sql


def test_validator_rejects_predicate_ending_in_line_comment():
    """A predicate that ends with a line comment swallows the
    emitter's closing paren (and the next WHEN clause) — a genuine
    malformed emission Spark would also reject; it must fail at emit
    time, not on the user's cluster."""
    with pytest.raises(MalformedStatement):
        SparkAdapter.merge_into_sql(
            Relation(schema="s", identifier="t"), "SELECT 1",
            ["id"], ["id"],
            predicates=["DBT_INTERNAL_DEST.x = 1 -- trailing comment"],
        )
