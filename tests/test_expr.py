"""Unit tests for the filter→SQL unparser and dialect layer.

Mirrors the reference's generated-SQL string assertions
(core tests mod.rs:788-807,872-1021) and the Exact/unsupported filter split
(crates/common/src/sql/sql_provider_datafusion/expr.rs)."""

import pytest
import datetime as dt

from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    In,
    IsNull,
    Not,
    StringContains,
    StringStartsWith,
)

from datafusion_table_providers_spark.core.expr import (
    DIALECTS,
    build_select,
    translate_filters,
)

D = DIALECTS["duckdb"]


def test_equal_and_compare():
    clauses, rest = translate_filters(
        [EqualTo(("a",), 1), GreaterThan(("b",), 2.5)], D
    )
    # floats render as string-casts: bare decimal literals parse as DECIMAL
    # in several engines and the DECIMAL→DOUBLE hop can lose a ULP
    assert clauses == ['"a" = 1', "(\"b\" > CAST('2.5' AS DOUBLE PRECISION))"]
    assert rest == []


def test_in_null_not():
    clauses, rest = translate_filters(
        [In(("x",), (1, 2, 3)), IsNull(("y",)), Not(EqualTo(("z",), "v"))], D
    )
    assert clauses == ['"x" IN (1, 2, 3)', '"y" IS NULL', "\"z\" <> 'v'"]
    assert rest == []


def test_string_like_escaping():
    clauses, _ = translate_filters(
        [StringContains(("s",), "50%"), StringStartsWith(("s",), "a_b")], D
    )
    assert clauses[0] == "\"s\" LIKE '%50\\%%' ESCAPE '\\'"
    assert clauses[1] == "\"s\" LIKE 'a\\_b%' ESCAPE '\\'"


def test_unsupported_returned_not_dropped():
    class Weird:
        pass

    clauses, rest = translate_filters([Weird(), EqualTo(("a",), 1)], D)
    assert clauses == ['"a" = 1']
    assert len(rest) == 1  # Spark must re-apply it post-scan


def test_literals():
    assert D.literal(None) == "NULL"
    assert D.literal(True) == "TRUE"
    assert D.literal("o'brien") == "'o''brien'"
    assert D.literal(dt.date(2024, 1, 2)) == "DATE '2024-01-02'"
    assert (
        D.literal(dt.datetime(2024, 1, 2, 3, 4, 5))
        == "TIMESTAMP '2024-01-02 03:04:05'"
    )
    # duckdb blob rendering: X'..' is NOT a DuckDB blob literal (hypothesis
    # round-trip caught it); the generic dialect keeps X'..' for mysql/sqlite
    assert D.literal(b"\x01\xff") == "unhex('01ff')"
    from datafusion_table_providers_spark.core.expr import DIALECTS

    assert DIALECTS["sqlite"].literal(b"\x01\xff") == "X'01ff'"
    assert DIALECTS["postgres"].literal(b"\x01\xff") == "decode('01ff', 'hex')"
    assert D.literal(float("inf")) == "CAST('Infinity' AS DOUBLE PRECISION)"


def test_build_select_shapes():
    assert build_select(D, "t") == "SELECT * FROM t"
    assert (
        build_select(D, "t", ["a", "b"], ['"a" > 1'], ['"b" DESC'], 5)
        == 'SELECT "a", "b" FROM t WHERE ("a" > 1) ORDER BY "b" DESC LIMIT 5'
    )
    # empty projection → SELECT 1 (COUNT(*) pushdown trick, mod.rs:258-276)
    assert build_select(D, "t", []) == "SELECT 1 AS one FROM t"


def test_mysql_quoting():
    m = DIALECTS["mysql"]
    assert m.quote_ident("a`b") == "`a``b`"


def test_float_literal_portable_across_dialects():
    """ADVICE r1: bare DOUBLE is not a Postgres type and MySQL's CAST only
    learned DOUBLE in 8.0.17 — the base dialect must emit the ANSI
    DOUBLE PRECISION spelling and MySQL must use exponent-notation numeric
    literals (approximate type in MySQL's grammar)."""
    import math

    from datafusion_table_providers_spark.core.expr import DIALECTS

    for name in ("ansi", "duckdb", "sqlite", "postgres", "clickhouse", "odbc", "adbc"):
        lit = DIALECTS[name].literal(0.25)
        assert "DOUBLE PRECISION" in lit, (name, lit)
        assert " AS DOUBLE)" not in lit, (name, lit)
        nan = DIALECTS[name].literal(float("nan"))
        assert "DOUBLE PRECISION" in nan, (name, nan)

    my = DIALECTS["mysql"]
    assert my.literal(0.25) == "0.25E0"
    assert my.literal(1e-05) == "1e-05"
    with pytest.raises(ValueError):
        my.literal(float("inf"))
    with pytest.raises(ValueError):
        my.literal(float("nan"))

    # exactness preserved through a real engine for the ANSI form
    import duckdb

    v = 0.1 + 0.2  # not exactly representable in shorter decimal
    assert duckdb.sql(f"SELECT {DIALECTS['duckdb'].literal(v)} x").fetchone()[0] == v
