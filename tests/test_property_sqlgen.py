"""Property-based tests (hypothesis) for the SQL-generation layer.

The dialect layer's `literal`/`quote_ident`/`like_escape` feed generated SQL
sent to live engines — any value a user writes ends up inside these strings,
so round-trip correctness IS injection-safety. Each property executes the
rendered SQL against real DuckDB and asserts the original value comes back.
(The reference has no property-based coverage — SURVEY §5.6; this is our
hardening on top of its unit-test approach.)
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from datafusion_table_providers_spark.core.expr import DIALECTS

D = DIALECTS["duckdb"]

# DuckDB VARCHARs are NUL-free UTF-8; surrogates aren't valid UTF-8
text_values = st.text(max_size=60).filter(
    lambda s: "\x00" not in s and all(not (0xD800 <= ord(c) <= 0xDFFF) for c in s)
)


@settings(max_examples=200, deadline=None)
@given(text_values)
def test_string_literal_roundtrip(s):
    got = duckdb.sql(f"SELECT {D.literal(s)} AS v").fetchone()[0]
    assert got == s


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_int_literal_roundtrip(n):
    assert duckdb.sql(f"SELECT {D.literal(n)} AS v").fetchone()[0] == n


@settings(max_examples=100, deadline=None)
@given(
    st.floats(allow_nan=False, allow_infinity=False, width=64)
)
def test_float_literal_roundtrip(x):
    got = duckdb.sql(f"SELECT CAST({D.literal(x)} AS DOUBLE) AS v").fetchone()[0]
    assert got == x


@settings(max_examples=50, deadline=None)
@given(
    st.datetimes(
        min_value=dt.datetime(1, 1, 1), max_value=dt.datetime(9999, 12, 31)
    )
)
def test_datetime_literal_roundtrip(ts):
    got = duckdb.sql(f"SELECT {D.literal(ts)} AS v").fetchone()[0]
    assert got == ts


@settings(max_examples=50, deadline=None)
@given(st.dates())
def test_date_literal_roundtrip(d):
    got = duckdb.sql(f"SELECT {D.literal(d)} AS v").fetchone()[0]
    assert got == d


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=40))
def test_bytes_literal_roundtrip(b):
    got = duckdb.sql(f"SELECT {D.literal(b)} AS v").fetchone()[0]
    assert bytes(got) == b


@settings(max_examples=100, deadline=None)
@given(text_values.filter(lambda s: len(s) > 0))
def test_quote_ident_roundtrip(name):
    # an identifier, however hostile, must select back its own value
    q = D.quote_ident(name)
    got = duckdb.sql(f"SELECT 1 AS {q}").df().columns[0]
    assert got == name


@settings(max_examples=100, deadline=None)
@given(text_values, text_values)
def test_like_escape_means_literal_containment(frag, hay):
    """col LIKE '%<escaped frag>%' must behave as plain substring test."""
    pat = D.literal(f"%{D.like_escape(frag)}%")
    got = duckdb.sql(
        f"SELECT {D.literal(hay)} LIKE {pat} ESCAPE '\\' AS v"
    ).fetchone()[0]
    assert got == (frag in hay)


def test_nan_inf_literals_are_valid_sql():
    # repr() of special floats would emit bare inf/nan tokens — they must
    # still parse as doubles
    for x in (float("inf"), float("-inf"), float("nan")):
        got = duckdb.sql(f"SELECT CAST({D.literal(x)} AS DOUBLE) AS v").fetchone()[0]
        assert math.isnan(got) if math.isnan(x) else got == x


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.one_of(st.none(), st.text(max_size=8).filter(lambda s: "\x00" not in s)),
            st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)),
        ),
        min_size=0,
        max_size=400,
    ),
    st.integers(min_value=1, max_value=64),
)
def test_sqlite_arrow_batches_property(rows, batch_size):
    """Any null pattern (incl. all-NULL leading chunks) and any chunk size
    yields a schema-stable batch stream totaling exactly the input rows."""
    import sqlite3 as _sq

    from datafusion_table_providers_spark.sources.backends import SQLiteBackend

    b = SQLiteBackend(":memory:")
    con = b._connect()
    con.execute("CREATE TABLE t (id INTEGER, s TEXT, v REAL)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    con.commit()
    batches = list(
        b.query_arrow_batches("SELECT id, s, v FROM t ORDER BY s NULLS FIRST", batch_size)
    )
    assert sum(bt.num_rows for bt in batches) == len(rows)
    assert len({str(bt.schema) for bt in batches}) <= 1


# --- runtime semi-join reduction clause (sources/dynamic_filter.py) -------
# The IN-list renders DATA values (dim join keys) into connector SQL — a
# key containing quote/backslash characters must select exactly itself,
# never escape the literal. Executed against real DuckDB: build a table of
# adversarial keys, render the clause via the dialect layer (same code
# path runtime_filter_clause uses), and assert the selected set is the
# requested subset, bit-exact.
@settings(max_examples=100, deadline=None)
@given(st.lists(text_values, min_size=1, max_size=8, unique=True))
def test_in_list_clause_selects_exactly_the_keys(keys):
    keep = keys[: max(1, len(keys) // 2)]
    lits = ", ".join(D.literal(v) for v in sorted(keep))
    clause = f'"k" IN ({lits})'
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t (k VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in keys])
        got = {r[0] for r in con.execute(f"SELECT k FROM t WHERE {clause}").fetchall()}
    finally:
        con.close()
    assert got == set(keep)


def test_in_list_clause_lints_clean_for_remote_dialects(spark):
    from datafusion_table_providers_spark.core.dialect_lint import lint_sql
    from datafusion_table_providers_spark.sources.dynamic_filter import (
        runtime_filter_clause,
    )

    dim = spark.createDataFrame(
        [("a'b; DROP TABLE t--",), ("\\",), ("plain",)], "k string"
    )
    for name in ("postgres", "mysql", "clickhouse"):
        clause, strategy = runtime_filter_clause(dim, "k", DIALECTS[name])
        assert strategy == "in_list"
        lint_sql(f"SELECT x FROM t WHERE {clause}", name)  # raises on a leak
