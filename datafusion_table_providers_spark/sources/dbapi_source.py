"""Generic DB-API 2.0 connector on the PySpark Python Data Source API.

Reference analog: the server-backed SQL providers (crates/postgres/src/
lib.rs:202-321, crates/mysql/src/lib.rs, crates/odbc/src/conn.rs:21-23) —
a connection per scan task, generated ``SELECT <proj> FROM rel WHERE
<filters>`` pushed to the server, Arrow batches back. The round-1 ODBC/ADBC
path synthesized ``jdbc:odbc:`` / ``jdbc:adbc:`` URLs, which no modern JVM
can load a driver for (the JDBC-ODBC bridge died with Java 8); this module
replaces that with a real transport: any importable DB-API module — pyodbc,
adbc_driver_manager.dbapi, psycopg, mysqlclient, or stdlib sqlite3 — opened
*inside the executor task*, no JVM jar involved.

Batches are produced Arrow-native when the driver cursor supports it
(ADBC ``fetch_arrow_table``, turbodbc ``fetchallarrow``), else by chunked
``fetchmany`` → columnar conversion against the declared schema — the
``rows_to_arrow`` analog (crates/postgres/src/arrow_sql_gen/mod.rs:248).

Schema comes from (in order): an explicit ``schema_ddl`` option (the
declared-DDL factory mode, crates/duckdb/src/lib.rs:419-560), an Arrow
cursor schema, or ``cursor.description`` + a sampled row (introspection
mode, dbconnection.rs:216-239).
"""

from __future__ import annotations

import datetime as dt
import decimal
import importlib
import json
from typing import Iterator, List, Optional

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from datafusion_table_providers_spark.core.expr import (
    DIALECTS,
    build_select,
    translate_filters,
)


def _connect(options):
    mod = importlib.import_module(options["module"])
    args = json.loads(options.get("connect_args", "[]"))
    kwargs = json.loads(options.get("connect_kwargs", "{}"))
    return mod.connect(*args, **kwargs)


def _spark_to_arrow(dtype: T.DataType) -> pa.DataType:
    if isinstance(dtype, T.LongType):
        return pa.int64()
    if isinstance(dtype, T.IntegerType):
        return pa.int32()
    if isinstance(dtype, T.DoubleType):
        return pa.float64()
    if isinstance(dtype, T.FloatType):
        return pa.float32()
    if isinstance(dtype, T.BooleanType):
        return pa.bool_()
    if isinstance(dtype, T.BinaryType):
        return pa.binary()
    if isinstance(dtype, T.DateType):
        return pa.date32()
    if isinstance(dtype, (T.TimestampNTZType, T.TimestampType)):
        return pa.timestamp("us")
    if isinstance(dtype, T.DecimalType):
        return pa.decimal128(dtype.precision, dtype.scale)
    if hasattr(T, "TimeType") and isinstance(dtype, T.TimeType):
        return pa.time64("us")
    return pa.string()


def _infer_spark_type(sample) -> T.DataType:
    if isinstance(sample, bool):
        return T.BooleanType()
    if isinstance(sample, int):
        return T.LongType()
    if isinstance(sample, float):
        return T.DoubleType()
    if isinstance(sample, (bytes, bytearray, memoryview)):
        return T.BinaryType()
    if isinstance(sample, dt.datetime):
        return T.TimestampNTZType()
    if isinstance(sample, dt.date):
        return T.DateType()
    if isinstance(sample, decimal.Decimal):
        return T.DecimalType(38, 18)
    return T.StringType()


class _Slice(InputPartition):
    """A range-partition slice: one disjoint WHERE fragment per task."""

    def __init__(self, idx: int, clause: Optional[str]):
        super().__init__(idx)
        self.clause = clause


class DBAPIReader(DataSourceReader):
    def __init__(self, schema, options):
        self.spark_schema = schema
        self.options = options
        self.relation = options["relation"]
        self.dialect = DIALECTS[options.get("dialect", "odbc")]
        self.where: List[str] = []
        # runtime semi-join reduction fragments (sources/dynamic_filter.py)
        self.where.extend(json.loads(options.get("extra_where", "[]")))
        self.columns = json.loads(options.get("columns", "null"))
        self.batch_size = int(options.get("batch_size", "16384"))
        self._partition_clauses = json.loads(
            options.get("partition_clauses", "[]")
        )

    def pushFilters(self, filters):
        # conservative ANSI dialect by default: only filters whose rendering
        # is portable are pushed Exact; the rest stay Spark-side
        clauses, unsupported = translate_filters(filters, self.dialect)
        self.where.extend(clauses)
        return iter(unsupported)

    def partitions(self):
        if self._partition_clauses:
            return [
                _Slice(i, c) for i, c in enumerate(self._partition_clauses)
            ]
        return [_Slice(0, None)]

    def scan_sql(self, partition=None) -> str:
        where = list(self.where)
        if partition is not None and getattr(partition, "clause", None):
            where.append(partition.clause)
        return build_select(
            self.dialect, self.relation, columns=self.columns, where=where
        )

    def read(self, partition) -> Iterator[pa.RecordBatch]:
        con = _connect(self.options)
        try:
            cur = con.cursor()
            cur.execute(self.scan_sql(partition))
            target = pa.schema(
                [
                    pa.field(f.name, _spark_to_arrow(f.dataType), f.nullable)
                    for f in self.spark_schema.fields
                ]
            )
            if hasattr(cur, "fetch_arrow_table"):  # ADBC
                for batch in cur.fetch_arrow_table().cast(target).to_batches():
                    yield batch
                return
            if hasattr(cur, "fetchallarrow"):  # turbodbc
                for batch in cur.fetchallarrow().cast(target).to_batches():
                    yield batch
                return
            while True:
                rows = cur.fetchmany(self.batch_size)
                if not rows:
                    break
                cols = list(zip(*rows))
                yield pa.record_batch(
                    [
                        pa.array(list(col), type=f.type)
                        for col, f in zip(cols, target)
                    ],
                    schema=target,
                )
        finally:
            con.close()


class DBAPIDataSource(DataSource):
    """``spark.read.format("dbapi_engine")`` — options:

    - ``module``: DB-API module ("pyodbc", "adbc_driver_manager.dbapi",
      "psycopg", "sqlite3", ...)
    - ``connect_args`` / ``connect_kwargs``: JSON for ``module.connect``
    - ``relation``: table/view name or relation SQL text
    - ``dialect``: SQL dialect for generated statements (default "odbc" =
      conservative ANSI)
    - ``columns``: JSON list → pruned projection (A3)
    - ``schema_json``: optional StructType JSON (declared schema) —
      skips introspection; ``dbapi_reader_df`` accepts DDL and encodes it
    """

    @classmethod
    def name(cls) -> str:
        return "dbapi_engine"

    def schema(self):
        # declared schema travels as StructType JSON: this method runs in a
        # session-less planning worker where DDL parsing (a JVM call) would
        # fail — dbapi_reader_df parses DDL driver-side and re-encodes
        schema_json = self.options.get("schema_json")
        cols = json.loads(self.options.get("columns", "null"))
        if schema_json:
            struct = T.StructType.fromJson(json.loads(schema_json))
            if cols:
                by_name = {f.name: f for f in struct.fields}
                return T.StructType([by_name[c] for c in cols])
            return struct
        dialect = DIALECTS[self.options.get("dialect", "odbc")]
        proj = ", ".join(dialect.quote_ident(c) for c in cols) if cols else "*"
        con = _connect(self.options)
        try:
            cur = con.cursor()
            cur.execute(
                f"SELECT * FROM (SELECT {proj} FROM {self.options['relation']}) s "
                "WHERE 1 = 0"
            )
            if hasattr(cur, "fetch_arrow_table"):  # ADBC: authoritative types
                from datafusion_table_providers_spark.core.types import (
                    arrow_to_spark_schema,
                )

                return arrow_to_spark_schema(cur.fetch_arrow_table().schema)
            names = [d[0] for d in cur.description]
            # description type codes are driver-specific; sample one row for
            # python-type inference, defaulting to string
            cur2 = con.cursor()
            cur2.execute(
                build_select(
                    dialect, self.options["relation"], columns=cols, limit=50
                )
            )
            samples = cur2.fetchall()
            fields = []
            for i, name in enumerate(names):
                sample = next(
                    (r[i] for r in samples if r[i] is not None), None
                )
                fields.append(T.StructField(name, _infer_spark_type(sample), True))
            return T.StructType(fields)
        finally:
            con.close()

    def reader(self, schema) -> DataSourceReader:
        return DBAPIReader(schema, self.options)


_REGISTERED = set()


def register(spark: SparkSession) -> None:
    if id(spark) not in _REGISTERED:
        spark.dataSource.register(DBAPIDataSource)
        _REGISTERED.add(id(spark))


def postgres_declared_schema(
    con,
    table_name: str,
    table_schema: str = "public",
    action=None,
):
    """Introspect ``information_schema.columns`` over a live DB-API
    connection and map the declared Postgres types through the reference's
    type matrix (core.pg_types ← schema.rs:45-130). Pass the result's
    ``simpleString()``-style DDL into ``dbapi_reader_df(schema_ddl=…)`` so a
    Postgres scan declares real types instead of sampling a row.

    Works against any engine exposing information_schema with
    Postgres-compatible type spellings (DuckDB included — how this is
    tested serverlessly).
    """
    from datafusion_table_providers_spark.core.pg_types import (
        schema_from_information_schema,
    )
    from datafusion_table_providers_spark.core.types import (
        UnsupportedTypeAction,
    )

    cur = con.cursor()
    q = (
        "SELECT column_name, data_type, udt_name, numeric_precision, "
        "numeric_scale, is_nullable FROM information_schema.columns "
        "WHERE table_name = {m} AND table_schema = {m} "
        "ORDER BY ordinal_position"
    )
    try:  # qmark modules (duckdb, sqlite3, pyodbc)
        cur.execute(q.format(m="?"), (table_name, table_schema))
    except Exception:  # format/pyformat modules (psycopg, MySQLdb)
        cur.execute(q.format(m="%s"), (table_name, table_schema))
    rows = [
        {
            "column_name": r[0],
            "data_type": (r[1] or r[2] or "").lower(),
            "udt_name": r[2],
            "numeric_precision": r[3],
            "numeric_scale": r[4],
            "is_nullable": r[5],
        }
        for r in cur.fetchall()
    ]
    return schema_from_information_schema(
        rows, action or UnsupportedTypeAction.ERROR
    )


def dbapi_reader_df(
    spark: SparkSession,
    module: str,
    relation: str,
    connect_args: Optional[list] = None,
    connect_kwargs: Optional[dict] = None,
    dialect: str = "odbc",
    columns: Optional[List[str]] = None,
    schema_ddl: Optional[str] = None,
    partition_column: Optional[str] = None,
    num_partitions: int = 1,
    auto_broadcast: bool = False,
    extra_where: Optional[List[str]] = None,
) -> DataFrame:
    """When ``partition_column`` (numeric) is set with ``num_partitions>1``,
    MIN/MAX bounds are introspected once driver-side over the same DB-API
    connection and the scan splits into disjoint range slices, each executed
    by its own executor task with its own server connection — the JDBC-style
    parallel read, same discipline as ``duckdb_reader_df``.

    ``auto_broadcast=True``: run one driver-side COUNT(*) over the same
    DB-API connection and attach a broadcast join hint when the relation
    is small (A15 stats → join planning; Python-DS scans otherwise always
    shuffle-join — same contract as ``duckdb_reader_df``)."""
    register(spark)
    r = (
        spark.read.format("dbapi_engine")
        .option("module", module)
        .option("relation", relation)
        .option("dialect", dialect)
        .option("connect_args", json.dumps(connect_args or []))
        .option("connect_kwargs", json.dumps(connect_kwargs or {}))
    )
    if columns:
        r = r.option("columns", json.dumps(list(columns)))
    if extra_where:
        r = r.option("extra_where", json.dumps(list(extra_where)))
    if schema_ddl:
        struct = T._parse_datatype_string(schema_ddl)  # driver-side: session up
        r = r.option("schema_json", json.dumps(struct.jsonValue()))
    if partition_column and num_partitions > 1:
        d = DIALECTS[dialect]
        q = d.quote_ident(partition_column)
        con = _connect(
            {
                "module": module,
                "connect_args": json.dumps(connect_args or []),
                "connect_kwargs": json.dumps(connect_kwargs or {}),
            }
        )
        try:
            cur = con.cursor()
            cur.execute(f"SELECT MIN({q}), MAX({q}) FROM {relation}")
            lo, hi = cur.fetchone()
        finally:
            con.close()
        clauses = []
        if lo is not None and hi is not None and hi > lo:
            step = (hi - lo) / num_partitions
            edges = [lo + step * i for i in range(1, num_partitions)]
            prev = None
            for e in edges + [None]:
                c = []
                if prev is not None:
                    c.append(f"{q} >= {prev}")
                if e is not None:
                    c.append(f"{q} < {e}")
                clauses.append(" AND ".join(c) if c else "TRUE")
                prev = e
        if clauses:
            r = r.option("partition_clauses", json.dumps(clauses))
    hint_broadcast = False
    if auto_broadcast:
        from datafusion_table_providers_spark.sources.duckdb_source import (
            AUTO_BROADCAST_ROWS,
        )

        con = _connect(
            {
                "module": module,
                "connect_args": json.dumps(connect_args or []),
                "connect_kwargs": json.dumps(connect_kwargs or {}),
            }
        )
        try:
            cur = con.cursor()
            cur.execute(f"SELECT COUNT(*) FROM {relation}")
            hint_broadcast = int(cur.fetchone()[0]) <= AUTO_BROADCAST_ROWS
        finally:
            con.close()
    df = r.load()
    return df.hint("broadcast") if hint_broadcast else df
