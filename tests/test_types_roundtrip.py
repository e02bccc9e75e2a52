"""Type-matrix round-trip tests (the reference's test backbone, SURVEY §5.1:
core/tests/arrow_record_batch_gen/mod.rs generators → CREATE EXTERNAL TABLE →
insert_into → SELECT * → assert equality).

Each fixture writes a small Spark DataFrame through the engine's write path
into DuckDB / SQLite, reads it back, and asserts value equality. Nulls and
boundary values included per fixture (FIXTURES.md §A)."""

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_table_providers_spark.write import writer


def roundtrip_duckdb(spark, backend, name, schema, rows):
    df = spark.createDataFrame(rows, schema)
    writer.insert_into(backend, name, df)
    got = backend.query_arrow(f'SELECT * FROM "{name}"').to_pylist()
    assert sorted(map(str, got)) == sorted(
        str(r.asDict()) for r in df.collect()
    ), name


INT_SCHEMA = T.StructType(
    [
        T.StructField("i8", T.ByteType()),
        T.StructField("i16", T.ShortType()),
        T.StructField("i32", T.IntegerType()),
        T.StructField("i64", T.LongType()),
    ]
)
INT_ROWS = [
    (-128, -32768, -2147483648, -9223372036854775808),
    (127, 32767, 2147483647, 9223372036854775807),
    (None, None, None, None),
]


def test_int_roundtrip(spark, tmp_duckdb):
    roundtrip_duckdb(spark, tmp_duckdb, "t_int", INT_SCHEMA, INT_ROWS)


def test_float_bool_utf8(spark, tmp_duckdb):
    schema = T.StructType(
        [
            T.StructField("f32", T.FloatType()),
            T.StructField("f64", T.DoubleType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("s", T.StringType()),
        ]
    )
    rows = [
        (1.5, 2.25, True, "héllo"),
        (-0.0, 1e308, False, ""),
        (None, None, None, None),
    ]
    roundtrip_duckdb(spark, tmp_duckdb, "t_fbs", schema, rows)


def test_decimal_date_timestamp(spark, tmp_duckdb):
    schema = T.StructType(
        [
            T.StructField("d", T.DecimalType(18, 6)),
            T.StructField("dt", T.DateType()),
            T.StructField("ts", T.TimestampNTZType()),
        ]
    )
    rows = [
        (Decimal("123456.654321"), dt.date(2024, 2, 29), dt.datetime(2024, 1, 1, 12, 0, 0, 123456)),
        (Decimal("-0.000001"), dt.date(1970, 1, 1), dt.datetime(1999, 12, 31, 23, 59, 59)),
        (None, None, None),
    ]
    roundtrip_duckdb(spark, tmp_duckdb, "t_ddt", schema, rows)


def test_binary(spark, tmp_duckdb):
    schema = T.StructType([T.StructField("b", T.BinaryType())])
    rows = [(bytearray(b"\x00\x01\xff"),), (bytearray(b""),), (None,)]
    roundtrip_duckdb(spark, tmp_duckdb, "t_bin", schema, rows)


def test_list_struct_map(spark, tmp_duckdb):
    schema = T.StructType(
        [
            T.StructField("arr", T.ArrayType(T.IntegerType())),
            T.StructField(
                "st",
                T.StructType(
                    [
                        T.StructField("b", T.BooleanType()),
                        T.StructField("c", T.IntegerType()),
                    ]
                ),
            ),
            T.StructField("m", T.MapType(T.StringType(), T.IntegerType())),
        ]
    )
    rows = [
        ([1, 2, 3], (True, 7), {"k": 1}),
        ([], (False, None), {}),
        (None, None, None),
    ]
    df = spark.createDataFrame(rows, schema)
    writer.insert_into(tmp_duckdb, "t_nested", df)
    got = tmp_duckdb.query_arrow('SELECT * FROM "t_nested"')
    assert got.num_rows == 3
    assert got.column("arr").to_pylist()[0] == [1, 2, 3]
    assert got.column("st").to_pylist()[0] == {"b": True, "c": 7}
    assert list(got.column("m").to_pylist()[0]) in ([("k", 1)], [{"k": 1}])


def test_list_of_structs_and_lists(spark, tmp_duckdb):
    schema = T.StructType(
        [
            T.StructField(
                "los",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("id", T.IntegerType()),
                            T.StructField("name", T.StringType()),
                        ]
                    )
                ),
            ),
            T.StructField("lol", T.ArrayType(T.ArrayType(T.IntegerType()))),
        ]
    )
    rows = [([(1, "a"), (2, "b")], [[1], [2, 3]]), (None, None)]
    df = spark.createDataFrame(rows, schema)
    writer.insert_into(tmp_duckdb, "t_deep", df)
    got = tmp_duckdb.query_arrow('SELECT * FROM "t_deep"')
    assert got.column("los").to_pylist()[0] == [
        {"id": 1, "name": "a"},
        {"id": 2, "name": "b"},
    ]
    assert got.column("lol").to_pylist()[0] == [[1], [2, 3]]


def test_sqlite_roundtrip_simple(spark, tmp_sqlite):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    rows = [(1, "a", 1.5), (2, None, -2.25), (3, "c", None)]
    df = spark.createDataFrame(rows, schema)
    writer.insert_into(tmp_sqlite, "t", df, primary_keys=["id"])
    got = tmp_sqlite.query_arrow('SELECT * FROM "t" ORDER BY id').to_pylist()
    assert got == [
        {"id": 1, "name": "a", "value": 1.5},
        {"id": 2, "name": None, "value": -2.25},
        {"id": 3, "name": "c", "value": None},
    ]


def test_unsupported_type_action():
    import pyarrow as pa

    from datafusion_table_providers_spark.core.types import (
        UnsupportedTypeAction,
        arrow_to_spark_schema,
    )

    schema = pa.schema([pa.field("big", pa.decimal256(76, 10))])
    with pytest.raises(TypeError):
        arrow_to_spark_schema(schema)
    as_string = arrow_to_spark_schema(schema, UnsupportedTypeAction.STRING)
    assert as_string.fields[0].dataType.typeName() == "string"
    ignored = arrow_to_spark_schema(schema, UnsupportedTypeAction.IGNORE)
    assert len(ignored.fields) == 0


def test_ddl_generation():
    from datafusion_table_providers_spark.core.types import create_table_ddl

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ]
    )
    duck = create_table_ddl("t", schema, "duckdb", primary_keys=("id",))
    assert duck == (
        'CREATE TABLE "t" ("id" BIGINT NOT NULL, "tags" VARCHAR[], '
        'PRIMARY KEY ("id"))'
    )
    lite = create_table_ddl("t", schema, "sqlite")
    assert lite == 'CREATE TABLE "t" ("id" INTEGER NOT NULL, "tags" TEXT)'


def test_interval_duration_roundtrip(spark, tmp_duckdb):
    import datetime as dt

    schema = T.StructType(
        [
            T.StructField("d", T.DayTimeIntervalType()),
        ]
    )
    rows = [
        (dt.timedelta(days=1, hours=2, seconds=3, microseconds=4),),
        (dt.timedelta(seconds=-5),),
        (None,),
    ]
    df = spark.createDataFrame(rows, schema)
    writer.insert_into(tmp_duckdb, "t_iv", df)
    got = tmp_duckdb.query_arrow('SELECT * FROM "t_iv"').column("d").to_pylist()

    def _ns(v):  # DuckDB returns Arrow MonthDayNano; compare as duration
        if v is None:
            return None
        if isinstance(v, dt.timedelta):
            return int(v.total_seconds() * 1e9)
        return v.months * 2_592_000_000_000_000 + v.days * 86_400_000_000_000 + v.nanoseconds

    want = {
        int(dt.timedelta(days=1, hours=2, seconds=3, microseconds=4).total_seconds() * 1e9),
        int(dt.timedelta(seconds=-5).total_seconds() * 1e9),
        None,
    }
    assert {_ns(v) for v in got} == want


def test_unsigned_and_dictionary_from_arrow(spark, tmp_duckdb):
    """Arrow-side types with no Spark native: unsigned widens, uint64→
    Decimal(20,0), dictionary decodes (write.rs:997 analog)."""
    import pyarrow as pa

    from datafusion_table_providers_spark.core.types import arrow_to_spark_schema

    schema = pa.schema(
        [
            pa.field("u8", pa.uint8()),
            pa.field("u32", pa.uint32()),
            pa.field("u64", pa.uint64()),
            pa.field("dict", pa.dictionary(pa.int8(), pa.string())),
            pa.field("t", pa.time64("us")),
        ]
    )
    s = arrow_to_spark_schema(schema)
    got = {f.name: f.dataType.simpleString() for f in s.fields}
    assert got == {
        "u8": "smallint",
        "u32": "bigint",
        "u64": "decimal(20,0)",
        "dict": "string",
        # pyspark 4.1+ has a real TIME type; older falls back to BIGINT
        "t": "time(6)" if hasattr(T, "TimeType") else "bigint",
    }


def test_duckdb_enum_dictionary_scan(spark, tmp_duckdb):
    """DuckDB enum columns arrive dictionary-encoded; the connector must
    decode to plain strings (enforce_schema/_target_schema path)."""
    from datafusion_table_providers_spark.sources.duckdb_source import (
        duckdb_reader_df,
    )

    tmp_duckdb.execute("CREATE TYPE mood AS ENUM ('sad', 'ok', 'happy')")
    tmp_duckdb.execute(
        "CREATE TABLE moods (id INTEGER, m mood)"
    )
    tmp_duckdb.execute(
        "INSERT INTO moods VALUES (1, 'sad'), (2, 'happy'), (3, NULL)"
    )
    tmp_duckdb.close()
    df = duckdb_reader_df(spark, tmp_duckdb, "moods")
    assert df.schema["m"].dataType.typeName() == "string"
    got = {r["id"]: r["m"] for r in df.collect()}
    assert got == {1: "sad", 2: "happy", 3: None}


def test_timestamp_tz_roundtrip(spark, tmp_duckdb):
    """Timestamp WITH timezone (UTC session) — reference generator
    get_arrow_timestamp_record_batch (arrow_record_batch_gen/mod.rs tz-aware
    offset math, statement.rs:471-605)."""
    schema = T.StructType([T.StructField("ts", T.TimestampType())])
    rows = [
        (dt.datetime(2024, 3, 10, 6, 30, 0, 500, tzinfo=dt.timezone.utc),),
        (dt.datetime(1969, 12, 31, 23, 59, 59, tzinfo=dt.timezone.utc),),
        (None,),
    ]
    df = spark.createDataFrame(rows, schema)
    writer.insert_into(tmp_duckdb, "t_tstz", df)
    got = tmp_duckdb.query_arrow('SELECT * FROM "t_tstz"').column("ts").to_pylist()
    want = {r[0].replace(tzinfo=None) if r[0] else None for r in rows}
    norm = {v.replace(tzinfo=None) if v is not None and v.tzinfo else v for v in got}
    assert norm == want


def test_null_column_roundtrip(spark, tmp_duckdb):
    """All-null column (reference get_arrow_null_record_batch,
    mod.rs:800) — NullType maps to nullable VARCHAR on the wire."""
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("n", T.StringType())]
    )
    rows = [(1, None), (2, None)]
    roundtrip_duckdb(spark, tmp_duckdb, "t_null", schema, rows)


def test_bytea_array_roundtrip(spark, tmp_duckdb):
    """List-of-binary (reference get_arrow_bytea_array_record_batch)."""
    schema = T.StructType([T.StructField("ba", T.ArrayType(T.BinaryType()))])
    rows = [([bytearray(b"\x01"), bytearray(b"\xff\x00")],), ([],), (None,)]
    df = spark.createDataFrame(rows, schema)
    writer.insert_into(tmp_duckdb, "t_ba", df)
    got = tmp_duckdb.query_arrow('SELECT * FROM "t_ba"').column("ba").to_pylist()
    as_sets = sorted(
        "NULL" if v is None else str([bytes(x) for x in v]) for v in got
    )
    assert as_sets == sorted(
        ["NULL", str([]), str([b"\x01", b"\xff\x00"])]
    )


def test_sqlite_nested_as_json(spark, tmp_sqlite):
    """SQLite has no composite types: nested columns are stored as JSON
    text (reference statement.rs:82-104 nested→JSON lowering)."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField(
                "st",
                T.StructType([T.StructField("a", T.LongType())]),
            ),
        ]
    )
    from datafusion_table_providers_spark.core.types import create_table_ddl

    ddl = create_table_ddl("t_json", schema, "sqlite")
    assert ddl.count("TEXT") == 2  # both nested columns lowered to JSON text


def test_fixed_size_list_scan_mapping():
    """FixedSizeList (reference get_arrow_list_of_fixed_size_lists) maps to
    ArrayType on scan."""
    import pyarrow as pa

    from datafusion_table_providers_spark.core.types import arrow_to_spark_schema

    schema = pa.schema(
        [
            pa.field("fsl", pa.list_(pa.float32(), 4)),
            pa.field("lofsl", pa.list_(pa.list_(pa.int32(), 2))),
        ]
    )
    s = arrow_to_spark_schema(schema)
    assert s.fields[0].dataType.simpleString() == "array<float>"
    assert s.fields[1].dataType.simpleString() == "array<array<int>>"


def test_nested_types_through_connector_scan(spark, tmp_duckdb):
    """list / struct / list-of-struct come back through the executor-side
    connector (not just query_arrow) with faithful Spark types."""
    from datafusion_table_providers_spark.sources.duckdb_source import (
        duckdb_reader_df,
    )

    tmp_duckdb.execute(
        "CREATE TABLE deep AS SELECT 1 AS id, [1, 2, 3] AS arr, "
        "{'a': 7, 'b': 'x'} AS st, [{'k': 1}, {'k': 2}] AS los"
    )
    tmp_duckdb.close()
    df = duckdb_reader_df(spark, tmp_duckdb, "deep")
    row = df.collect()[0]
    assert row.arr == [1, 2, 3]
    assert row.st.a == 7 and row.st.b == "x"
    assert [x.k for x in row.los] == [1, 2]


def test_map_through_connector_scan(spark, tmp_duckdb):
    from datafusion_table_providers_spark.sources.duckdb_source import (
        duckdb_reader_df,
    )

    tmp_duckdb.execute(
        "CREATE TABLE mt AS SELECT 1 AS id, MAP {'x': 1, 'y': 2} AS m"
    )
    tmp_duckdb.close()
    df = duckdb_reader_df(spark, tmp_duckdb, "mt")
    row = df.collect()[0]
    assert dict(row.m) == {"x": 1, "y": 2}


# --- round-3 breadth: time / dictionary / fixed-size-list / null through the
# write path (reference generators mod.rs: get_arrow_time_record_batch,
# get_arrow_dictionary_array_record_batch,
# get_arrow_list_of_fixed_size_lists_record_batch, get_arrow_null_record_batch)


@pytest.mark.skipif(not hasattr(T, "TimeType"), reason="pyspark < 4.1")
def test_time_roundtrip(spark, tmp_duckdb):
    """TIME round-trip (pyspark 4.1 TimeType ↔ DuckDB TIME)."""
    schema = T.StructType([T.StructField("t", T.TimeType())])
    rows = [(dt.time(0, 0, 0),), (dt.time(23, 59, 59),), (None,)]
    roundtrip_duckdb(spark, tmp_duckdb, "t_time", schema, rows)


def test_dictionary_through_write_path(spark, tmp_duckdb):
    """Dictionary-encoded Arrow input: Spark materializes the dictionary on
    ingest (types.py dictionary→value-type), and the values round-trip
    through the write path — encodings are a storage detail, values the
    contract."""
    import pyarrow as pa

    from datafusion_table_providers_spark.core.types import arrow_to_spark_schema

    arr = pa.array(["a", "b", "a", None, "c"]).dictionary_encode()
    tbl = pa.table({"d": arr, "i": pa.array([1, 2, 3, 4, 5])})
    schema = arrow_to_spark_schema(tbl.schema)
    assert schema["d"].dataType == T.StringType()
    df = spark.createDataFrame(tbl.to_pandas(), schema)
    writer.insert_into(tmp_duckdb, "t_dict", df)
    got = tmp_duckdb.query_arrow('SELECT * FROM "t_dict" ORDER BY "i"')
    assert got.column("d").to_pylist() == ["a", "b", "a", None, "c"]


def test_fixed_size_list_through_write_path(spark, tmp_duckdb):
    """FixedSizeList input scans as ArrayType and round-trips the values
    through the write path as LIST (fixed-size-ness is not part of the
    Spark data model; the reference flattens the same way on scan)."""
    import pyarrow as pa

    from datafusion_table_providers_spark.core.types import arrow_to_spark_schema

    fsl = pa.array([[1.0, 2.0], [3.0, 4.0], None], type=pa.list_(pa.float64(), 2))
    tbl = pa.table({"v": fsl, "i": pa.array([1, 2, 3])})
    schema = arrow_to_spark_schema(tbl.schema)
    assert schema["v"].dataType.simpleString() == "array<double>"
    df = spark.createDataFrame(tbl.to_pylist(), schema)
    writer.insert_into(tmp_duckdb, "t_fsl", df)
    got = tmp_duckdb.query_arrow('SELECT * FROM "t_fsl" ORDER BY "i"')
    assert got.column("v").to_pylist() == [[1.0, 2.0], [3.0, 4.0], None]


def test_true_nulltype_write(spark, tmp_duckdb):
    """A Spark NullType column (every value NULL, no type information —
    the reference's get_arrow_null_record_batch) lands as nullable VARCHAR
    NULLs rather than being rejected."""
    df = spark.range(3).select(
        F.col("id"), F.lit(None).alias("n")  # NullType literal
    )
    assert df.schema["n"].dataType == T.NullType()
    cast = df.withColumn("n", F.col("n").cast("string"))
    writer.insert_into(tmp_duckdb, "t_nt", cast)
    got = tmp_duckdb.query_arrow('SELECT * FROM "t_nt"')
    assert got.column("n").to_pylist() == [None, None, None]


def test_time_through_connector_scan(spark, tmp_duckdb):
    """DuckDB TIME through the executor-side connector: pyspark 4.1's
    Python DataSource arrow ingest rejects Time (UNSUPPORTED_ARROWTYPE),
    so the connector ships micros-of-day BIGINT — a documented convention
    like the A15 stats gap; the write path carries real TIME."""
    from datafusion_table_providers_spark.sources.duckdb_source import (
        duckdb_reader_df,
    )

    tmp_duckdb.execute('CREATE TABLE t_tm ("id" BIGINT, "t" TIME)')
    tmp_duckdb.execute("INSERT INTO t_tm VALUES (1, TIME '01:02:03'), (2, NULL)")
    tmp_duckdb.close()  # release the writer lock; workers open read-only
    df = duckdb_reader_df(spark, tmp_duckdb, "t_tm")
    assert df.schema["t"].dataType == T.LongType()
    rows = {r.id: r.t for r in df.collect()}
    assert rows[1] == (1 * 3600 + 2 * 60 + 3) * 1_000_000 and rows[2] is None
