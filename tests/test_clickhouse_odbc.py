"""ClickHouse / ODBC / ADBC dialect + factory surface (no live servers).

Reference analogs: crates/clickhouse (read-only scan + federation),
crates/odbc (DSN passthrough via arbitrary driver), crates/adbc (Arrow
driver). The SQL-generation surface is what the reference contributes on
top of the driver — that's what these tests pin.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import types as T

from datafusion_table_providers_spark.core.expr import DIALECTS
from datafusion_table_providers_spark.core.types import create_table_ddl
from datafusion_table_providers_spark.sources.remote_sql import RemoteSqlBackend


def test_clickhouse_dialect_literals():
    d = DIALECTS["clickhouse"]
    assert d.quote_ident("a`b") == "`a``b`"
    assert d.literal(True) == "true"
    assert (
        d.literal(dt.datetime(1996, 1, 2, 3, 4, 5))
        == "toDateTime64('1996-01-02 03:04:05', 6)"
    )
    assert d.literal(dt.date(1996, 1, 2)) == "toDate32('1996-01-02')"
    assert d.literal(b"\x01\xff") == "unhex('01ff')"
    # ClickHouse escapes with backslash (ANSI '' doubling is NOT safe there:
    # backslash is an escape char inside its single-quoted strings)
    assert d.literal("o'hara") == "'o\\'hara'"
    assert d.literal("x\\") == "'x\\\\'"


def test_odbc_adbc_dialects_are_ansi():
    for name in ("odbc", "adbc"):
        d = DIALECTS[name]
        assert d.quote_ident("x") == '"x"'
        assert d.literal(dt.date(2000, 1, 1)) == "DATE '2000-01-01'"


SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), nullable=False),
        T.StructField("name", T.StringType(), nullable=True),
        T.StructField("price", T.DecimalType(12, 2), nullable=True),
        T.StructField("tags", T.ArrayType(T.StringType()), nullable=True),
        T.StructField("ts", T.TimestampNTZType(), nullable=True),
    ]
)


def test_clickhouse_create_table_nullable_and_engine():
    ddl = create_table_ddl("t", SCHEMA, "clickhouse", primary_keys=("id",))
    assert ddl.startswith("CREATE TABLE `t` (")
    # non-nullable column is bare; nullable scalars wrapped; composites bare
    assert "`id` Int64" in ddl and "Nullable(Int64)" not in ddl
    assert "`name` Nullable(String)" in ddl
    assert "`price` Nullable(Decimal(12,2))" in ddl
    assert "`tags` Array(String)" in ddl  # CH forbids Nullable(Array)
    assert "`ts` Nullable(DateTime64(6))" in ddl
    # no inline PRIMARY KEY clause; keys become the MergeTree sort key
    assert "PRIMARY KEY" not in ddl
    assert ddl.endswith("ENGINE = MergeTree ORDER BY (`id`)")
    no_pk = create_table_ddl("t", SCHEMA, "clickhouse")
    assert no_pk.endswith("ENGINE = MergeTree ORDER BY tuple()")


def test_postgres_mysql_create_table_types():
    pg = create_table_ddl("t", SCHEMA, "postgres", primary_keys=("id",))
    assert '"id" BIGINT NOT NULL' in pg
    assert '"name" TEXT' in pg
    assert '"price" NUMERIC(12,2)' in pg
    assert '"tags" TEXT[]' in pg
    assert '"ts" TIMESTAMP' in pg
    assert 'PRIMARY KEY ("id")' in pg

    my = create_table_ddl("t", SCHEMA, "mysql", primary_keys=("id",))
    assert "`id` BIGINT NOT NULL" in my
    assert "`price` DECIMAL(12,2)" in my
    assert "`tags` JSON" in my
    assert "`ts` DATETIME(6)" in my
    assert "PRIMARY KEY (`id`)" in my


def test_backend_urls_and_contexts():
    ch = RemoteSqlBackend("clickhouse", "ch-host", 8123, "default", "default")
    assert ch.jdbc_url() == "jdbc:clickhouse://ch-host:8123/default"
    assert ch.compute_context() == "clickhouse:ch-host:8123/default?user=default"

    odbc = RemoteSqlBackend("odbc", "", 0, "DSN=warehouse;UID=u", "u")
    # no jdbc:odbc synthesis (the JDBC-ODBC bridge died with Java 8) — the
    # ODBC transport is the DB-API reader
    with pytest.raises(ValueError, match="no JDBC transport"):
        odbc.jdbc_url()
    assert odbc.dbapi_spec() == ("pyodbc", ["DSN=warehouse;UID=u"], {})
    adbc = RemoteSqlBackend(
        "adbc", "", 0, "postgresql://h/db", "u",
        properties={"driver": "adbc_driver_postgresql"},
    )
    assert adbc.dbapi_spec() == (
        "adbc_driver_manager.dbapi",
        [],
        {"uri": "postgresql://h/db", "driver": "adbc_driver_postgresql"},
    )
    # same DSN → same federation context; different DSN → different
    odbc2 = RemoteSqlBackend("odbc", "", 0, "DSN=other", "u")
    assert odbc.compute_context() != odbc2.compute_context()

    ddl = odbc.create_table_sql("t", SCHEMA, primary_keys=("id",))
    assert '"id" BIGINT NOT NULL' in ddl  # ANSI passthrough rendering


def test_clickhouse_factory_arg_rendering():
    from datafusion_table_providers_spark.factories import (
        ClickHouseTableFactory,
        ODBCTableFactory,
    )

    f = ClickHouseTableFactory({"host": "h", "port": "8123", "db": "d"})
    assert f.backend.kind == "clickhouse"
    # parameterized-view args render as ClickHouse literals
    lit = f.backend.dialect.literal
    rendered = ", ".join(
        f"{k} = {lit(v)}" for k, v in [("lo", 1), ("name", "x'y")]
    )
    assert rendered == "lo = 1, name = 'x\\'y'"
    try:
        f.tables()
        raise AssertionError("tables() must require a live server")
    except ConnectionError as e:
        assert "clickhouse:h:8123/d" in str(e)

    o = ODBCTableFactory({"connection_string": "DSN=wh"})
    assert o.backend.dbapi_spec() == ("pyodbc", ["DSN=wh"], {})
