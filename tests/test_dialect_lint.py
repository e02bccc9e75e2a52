"""Dialect-grammar property tests for generated SQL (no-server Postgres/
MySQL/ClickHouse coverage).

Every literal, filter clause, SELECT and CREATE TABLE we would send to a
remote server is rendered per dialect and run through the static linter
(core.dialect_lint), which encodes the grammar rules a live server would
enforce — e.g. Postgres has no DOUBLE type, MySQL has no DOUBLE PRECISION
cast, ClickHouse strings escape backslash. Postgres-dialect clauses are
additionally EXECUTED on DuckDB (whose expression grammar is Postgres-
compatible for everything we generate except decode()) as a semantic smoke.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    EqualNullSafe,
    EqualTo,
    GreaterThan,
    In,
    IsNull,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)

from datafusion_table_providers_spark.core.dialect_lint import (
    DialectLintError,
    lint_sql,
    strip_strings,
)
from datafusion_table_providers_spark.core.expr import (
    DIALECTS,
    build_select,
    translate_filters,
)
from datafusion_table_providers_spark.core.types import create_table_ddl

ALL_DIALECTS = sorted(DIALECTS)

text_values = st.text(max_size=40).filter(
    lambda s: "\x00" not in s
    and all(not (0xD800 <= ord(c) <= 0xDFFF) for c in s)
)

scalar_values = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(width=64),  # includes nan/inf
    text_values,
    st.binary(max_size=24),
    st.datetimes(min_value=dt.datetime(1, 1, 1), max_value=dt.datetime(9999, 12, 31)),
    st.dates(),
)


def _filters(value, s):
    return [
        EqualTo(("c",), value),
        EqualNullSafe(("c",), value),
        GreaterThan(("c",), value),
        LessThanOrEqual(("c",), value),
        In(("c",), (value, value)),
        IsNull(("c",)),
        Not(EqualTo(("c",), value)),
        StringContains(("c",), s),
        StringStartsWith(("c",), s),
        StringEndsWith(("c",), s),
    ]


@settings(max_examples=150, deadline=None)
@given(scalar_values, text_values)
def test_translated_filters_lint_clean_all_dialects(value, s):
    for name in ALL_DIALECTS:
        d = DIALECTS[name]
        clauses, _rest = translate_filters(_filters(value, s), d)
        # untranslatable filters legitimately fall back to Spark (Inexact);
        # everything that IS translated must be lexically valid dialect SQL
        for clause in clauses:
            lint_sql(clause, name)


@settings(max_examples=150, deadline=None)
@given(scalar_values, text_values)
def test_build_select_lints_clean(value, s):
    for name in ALL_DIALECTS:
        d = DIALECTS[name]
        clauses, _ = translate_filters(_filters(value, s), d)
        sql = build_select(
            d,
            d.quote_ident("tbl"),
            columns=["a", 'we"ird', "sel`ect"],
            where=clauses,
            order_by=[d.quote_ident("a")],
            limit=10,
        )
        lint_sql(sql, name)


@settings(max_examples=100, deadline=None)
@given(scalar_values)
def test_postgres_clauses_execute_on_duckdb(value):
    """DuckDB's expression grammar is Postgres-compatible for everything we
    generate except decode(,'hex') — semantic smoke for the dialect that has
    no live server here."""
    d = DIALECTS["postgres"]
    clauses, _ = translate_filters(
        [
            EqualTo(("c",), value),
            GreaterThan(("c",), value),
            In(("c",), (value,)),
            Not(EqualTo(("c",), value)),
        ],
        d,
    )
    con = duckdb.connect()
    for clause in clauses:
        if "decode(" in clause:
            continue  # the one Postgres spelling DuckDB lacks
        lit = d.literal(value)
        if "decode(" in lit:
            continue
        con.execute(f'SELECT 1 FROM (SELECT {lit} AS "c") t WHERE {clause}')


DDL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField('we"ird', T.StringType()),
        T.StructField("sel`ect", T.DoubleType()),
        T.StructField("b", T.BinaryType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("d", T.DateType()),
        T.StructField("dec", T.DecimalType(12, 3)),
        T.StructField("arr", T.ArrayType(T.IntegerType())),
    ]
)


@pytest.mark.parametrize("dialect", ALL_DIALECTS)
def test_create_table_ddl_lints_clean(dialect):
    sql = create_table_ddl("tbl", DDL_SCHEMA, dialect, primary_keys=("id",))
    lint_sql(sql, dialect)


def test_linter_catches_known_bug_classes():
    # the ADVICE float-literal class: DuckDB-only CAST AS DOUBLE in Postgres
    with pytest.raises(DialectLintError):
        lint_sql("SELECT CAST('1.5' AS DOUBLE) FROM t", "postgres")
    # MySQL: DOUBLE PRECISION cast is never accepted
    with pytest.raises(DialectLintError):
        lint_sql("SELECT CAST('1.5' AS DOUBLE PRECISION)", "mysql")
    # bare inf token binds as a column reference
    with pytest.raises(DialectLintError):
        lint_sql("SELECT c > inf FROM t", "postgres")
    # ClickHouse trailing-backslash string-boundary break
    with pytest.raises(DialectLintError):
        strip_strings(r"SELECT 'oops\'", "clickhouse")
    # unhex() is MySQL/ClickHouse/DuckDB, not Postgres
    with pytest.raises(DialectLintError):
        lint_sql("SELECT unhex('ff')", "postgres")
    # keyword temporal literal in ClickHouse
    with pytest.raises(DialectLintError):
        lint_sql("SELECT TIMESTAMP '2020-01-01 00:00:00'", "clickhouse")
    # identifier-quote mixups
    with pytest.raises(DialectLintError):
        lint_sql("SELECT `c` FROM t", "postgres")
    # ANSI '' doubling must NOT trip the unterminated-string check
    strip_strings("SELECT 'it''s fine'", "postgres")
    lint_sql("SELECT 'nan inside a string is fine'", "postgres")


def test_sqlite_lexical_rules():
    # '::' cast syntax is Postgres/DuckDB grammar, not SQLite
    with pytest.raises(DialectLintError):
        lint_sql("SELECT x::REAL FROM t", "sqlite")
    # ILIKE is not an SQLite operator
    with pytest.raises(DialectLintError):
        lint_sql("SELECT * FROM t WHERE s ILIKE 'a%'", "sqlite")
    # '::' inside a string literal is fine
    lint_sql("SELECT 'a::b' FROM t", "sqlite")


# ---- write path (r4: VERDICT item 6 — statement.rs is the reference's
# biggest single SQL-generation surface; lint-gate our analog) -------------

from datafusion_table_providers_spark.write.on_conflict import OnConflict
from datafusion_table_providers_spark.write.statement import render_insert

WRITE_DIALECTS = ["duckdb", "sqlite", "postgres", "mysql"]


@pytest.mark.parametrize("dialect", ALL_DIALECTS)
def test_render_insert_values_lints_clean(dialect):
    sql = render_insert(dialect, "tbl", ["id", 'we"ird', "sel`ect"])
    lint_sql(sql, dialect)


@pytest.mark.parametrize("dialect", ALL_DIALECTS)
def test_render_insert_select_lints_clean(dialect):
    d = DIALECTS[dialect]
    sql = render_insert(
        dialect,
        "tbl",
        ["id", "v"],
        select_from=d.quote_ident("staging"),
        extra_columns=(),
    )
    lint_sql(sql, dialect)


@pytest.mark.parametrize("dialect", WRITE_DIALECTS)
@pytest.mark.parametrize(
    "oc",
    [
        OnConflict.do_nothing_all(),
        OnConflict.do_nothing(["id"]),
        OnConflict.upsert(["id"]),
    ],
)
def test_render_insert_on_conflict_lints_clean(dialect, oc):
    sql = render_insert(
        dialect, "tbl", ["id", "name", "v"], on_conflict=oc
    )
    lint_sql(sql, dialect)
    # and the staged-commit SELECT shape
    sql2 = render_insert(
        dialect,
        "tbl",
        ["id", "name", "v"],
        select_from=DIALECTS[dialect].quote_ident("stg"),
        on_conflict=oc,
    )
    lint_sql(sql2, dialect)


def test_write_path_lint_catches_planted_leak():
    """The linter stays red on the round-2 bug class if it ever reaches a
    write statement: a DuckDB-ism CAST embedded in the staged-ingest
    SELECT fragment for a Postgres/MySQL target."""
    for dialect in ("postgres", "mysql"):
        sql = render_insert(
            dialect,
            "tbl",
            ["id"],
            select_from="(SELECT CAST(x AS DOUBLE) AS id FROM s) t",
        )
        with pytest.raises(DialectLintError):
            lint_sql(sql, dialect)
    # and a wrong-quote leak: backtick identifiers sent to Postgres
    with pytest.raises(DialectLintError):
        lint_sql('INSERT INTO "t" (`c`) VALUES (?)', "postgres")


def test_sqlite_insert_matches_executed_shape(tmp_path):
    """render_insert('sqlite', ...) is byte-compatible with what the
    prepared executemany path actually runs."""
    import sqlite3

    con = sqlite3.connect(str(tmp_path / "w.db"))
    con.execute('CREATE TABLE t ("id" INTEGER PRIMARY KEY, "v" TEXT)')
    sql = render_insert("sqlite", "t", ["id", "v"])
    con.executemany(sql, [(1, "a"), (2, "b")])
    up = render_insert(
        "sqlite", "t", ["id", "v"], on_conflict=OnConflict.upsert(["id"])
    )
    con.executemany(up, [(2, "B"), (3, "c")])
    rows = con.execute('SELECT "id", "v" FROM t ORDER BY 1').fetchall()
    assert rows == [(1, "a"), (2, "B"), (3, "c")]


@pytest.mark.parametrize("dialect", WRITE_DIALECTS)
def test_render_delete_update_lint_clean(dialect):
    from datafusion_table_providers_spark.write.statement import (
        render_delete,
        render_update,
    )

    lint_sql(render_delete(dialect, "tbl", "id > 5"), dialect)
    lint_sql(render_delete(dialect, 'we"ird'), dialect)
    lint_sql(
        render_update(dialect, "tbl", {"a": "lower(a)", "b": "b + 1"}, "id > 5"),
        dialect,
    )
    # planted leak in an assignment expression stays red
    with pytest.raises(DialectLintError):
        lint_sql(
            render_update("postgres", "t", {"a": "CAST(x AS DOUBLE)"}),
            "postgres",
        )
