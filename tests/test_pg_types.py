"""Postgres type-matrix unit tests (reference schema.rs:45-130 mirrored
row-by-row; no server in this environment — see core/pg_types.py)."""

import pytest
from pyspark.sql import types as T

from datafusion_table_providers_spark.core.pg_types import (
    pg_type_to_spark,
    schema_from_information_schema,
)
from datafusion_table_providers_spark.core.types import UnsupportedTypeAction

TIME_T = T.TimeType() if hasattr(T, "TimeType") else T.LongType()

MATRIX = [
    # (pg type, expected spark type) — ordered as in schema.rs:53-108
    ("smallint", T.ShortType()),
    ("integer", T.IntegerType()),
    ("int", T.IntegerType()),
    ("int4", T.IntegerType()),
    ("bigint", T.LongType()),
    ("int8", T.LongType()),
    ("money", T.LongType()),
    ("oid", T.LongType()),
    ("xid", T.LongType()),
    ("regproc", T.LongType()),
    ("numeric(12,3)", T.DecimalType(12, 3)),
    ("decimal(7)", T.DecimalType(7, 0)),
    ("numeric", T.DecimalType(38, 20)),  # reference default, schema.rs:250
    ("real", T.FloatType()),
    ("float4", T.FloatType()),
    ("double precision", T.DoubleType()),
    ("float8", T.DoubleType()),
    ('"char"', T.ByteType()),
    ("character", T.StringType()),
    ("character varying", T.StringType()),
    ("varchar", T.StringType()),
    ("text", T.StringType()),
    ("bpchar", T.StringType()),
    ("uuid", T.StringType()),
    ("name", T.StringType()),
    ("bytea", T.BinaryType()),
    ("date", T.DateType()),
    ("time", TIME_T),
    ("time without time zone", TIME_T),
    ("timestamp", T.TimestampNTZType()),
    ("timestamp without time zone", T.TimestampNTZType()),
    ("timestamp with time zone", T.TimestampType()),
    ("timestamptz", T.TimestampType()),
    ("boolean", T.BooleanType()),
    ("enum", T.StringType()),
    ("point", T.ArrayType(T.DoubleType(), True)),
    ("line", T.BinaryType()),
    ("lseg", T.BinaryType()),
    ("box", T.BinaryType()),
    ("path", T.BinaryType()),
    ("polygon", T.BinaryType()),
    ("circle", T.BinaryType()),
    ("geometry", T.BinaryType()),
    ("geography", T.BinaryType()),
    ("inet", T.StringType()),
    ("cidr", T.StringType()),
    ("macaddr", T.StringType()),
    ("bit", T.BinaryType()),
    ("bit varying", T.BinaryType()),
    ("tsvector", T.StringType()),
    ("tsquery", T.StringType()),
    ("xml", T.StringType()),
    ("json", T.StringType()),
    ("aclitem", T.StringType()),
    ("pg_node_tree", T.StringType()),
    ("anyarray", T.ArrayType(T.BinaryType(), True)),
    (
        "int4range",
        T.StructType(
            [
                T.StructField("lower", T.IntegerType()),
                T.StructField("upper", T.IntegerType()),
            ]
        ),
    ),
]


@pytest.mark.parametrize("pg,expected", MATRIX, ids=[m[0] for m in MATRIX])
def test_matrix(pg, expected):
    assert pg_type_to_spark(pg) == expected


def test_array_spellings():
    assert pg_type_to_spark("integer[]") == T.ArrayType(T.IntegerType(), True)
    assert pg_type_to_spark("_float8") == T.ArrayType(T.DoubleType(), True)
    assert pg_type_to_spark(
        "array", type_details={"element_type": "text"}
    ) == T.ArrayType(T.StringType(), True)


def test_composite_and_nested_composite_array():
    details = {
        "attributes": [
            {"name": "a", "type": "integer"},
            {"name": "b", "type": "text"},
        ]
    }
    st = pg_type_to_spark("composite", type_details=details)
    assert st == T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.StringType()),
        ]
    )
    arr = pg_type_to_spark(
        "array",
        type_details={
            "element_details": {"type": "composite", **details},
        },
    )
    assert arr == T.ArrayType(st, True)


def test_jsonb_gated_on_action():
    """Reference: jsonb only maps when UnsupportedTypeAction is String
    (schema.rs:108-111)."""
    with pytest.raises(TypeError):
        pg_type_to_spark("jsonb")
    assert (
        pg_type_to_spark("jsonb", UnsupportedTypeAction.STRING)
        == T.StringType()
    )
    assert pg_type_to_spark("jsonb", UnsupportedTypeAction.IGNORE) is None


def test_interval_and_unknown_follow_action():
    with pytest.raises(TypeError):
        pg_type_to_spark("interval")
    assert pg_type_to_spark("interval", UnsupportedTypeAction.IGNORE) is None
    with pytest.raises(TypeError):
        pg_type_to_spark("no_such_type")
    assert (
        pg_type_to_spark("no_such_type", UnsupportedTypeAction.STRING)
        == T.StringType()
    )


def test_decimal_beyond_spark_precision():
    with pytest.raises(TypeError):
        pg_type_to_spark("numeric(76,10)")


def test_schema_from_information_schema():
    rows = [
        {"column_name": "id", "data_type": "bigint", "is_nullable": "NO"},
        {
            "column_name": "price",
            "data_type": "numeric",
            "numeric_precision": 12,
            "numeric_scale": 2,
        },
        {"column_name": "tags", "udt_name": "_text"},
        {"column_name": "blob", "data_type": "jsonb"},  # ignored below
    ]
    s = schema_from_information_schema(rows, UnsupportedTypeAction.IGNORE)
    assert [f.name for f in s.fields] == ["id", "price", "tags"]
    assert s["id"].nullable is False
    assert s["price"].dataType == T.DecimalType(12, 2)
    assert s["tags"].dataType == T.ArrayType(T.StringType(), True)


def test_postgres_declared_schema_over_dbapi():
    """The live introspection path, executed against DuckDB's
    information_schema (Postgres-compatible spellings) over a real DB-API
    cursor — the exact code path a psycopg connection takes."""
    import duckdb

    from datafusion_table_providers_spark.sources.dbapi_source import (
        postgres_declared_schema,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (id BIGINT NOT NULL, name VARCHAR, "
        "price DECIMAL(12,2), d DATE, ok BOOLEAN, tags INTEGER[], "
        "ts TIMESTAMP)"
    )
    s = postgres_declared_schema(con, "t", "main")
    assert [f.name for f in s.fields] == [
        "id", "name", "price", "d", "ok", "tags", "ts",
    ]
    assert s["id"].dataType == T.LongType() and s["id"].nullable is False
    assert s["price"].dataType == T.DecimalType(12, 2)
    assert s["tags"].dataType == T.ArrayType(T.IntegerType(), True)
    assert s["ts"].dataType == T.TimestampNTZType()


def test_real_pg_array_and_user_defined_spellings():
    """Real Postgres information_schema reports arrays as
    data_type='ARRAY' (element type only in udt_name, e.g. '_int4') and
    enums/domains as 'USER-DEFINED' — the r3 ADVICE repro."""
    rows = [
        {"column_name": "xs", "data_type": "ARRAY", "udt_name": "_int4"},
        {"column_name": "mood", "data_type": "USER-DEFINED", "udt_name": "my_enum"},
    ]
    s = schema_from_information_schema(rows, UnsupportedTypeAction.STRING)
    assert s["xs"].dataType == T.ArrayType(T.IntegerType(), True)
    assert s["mood"].dataType == T.StringType()  # unresolvable UDT -> action
    # under ERROR the array column still resolves (no TypeError)
    s2 = schema_from_information_schema(
        [{"column_name": "xs", "data_type": "ARRAY", "udt_name": "_text"}]
    )
    assert s2["xs"].dataType == T.ArrayType(T.StringType(), True)


def test_negative_or_oversized_scale_follows_action():
    """numeric(5,-2) is legal Postgres but Spark rejects DecimalType(5,-2)
    at analysis time; route through the UnsupportedTypeAction contract."""
    with pytest.raises(TypeError):
        pg_type_to_spark("numeric(5,-2)")
    assert pg_type_to_spark("numeric(5,-2)", UnsupportedTypeAction.IGNORE) is None
    with pytest.raises(TypeError):
        pg_type_to_spark("numeric(3,7)")  # scale > precision
