"""Postgres type-name → Spark type mapping (no-server type-matrix depth).

Reference analog: ``pg_data_type_to_arrow_type``
(crates/postgres/src/arrow_sql_gen/schema.rs:45-130) with composite/array
resolution via ``type_details`` (schema.rs:145-240). No Postgres server
exists in this environment, so the mapping is exercised by the
information-schema-shaped unit matrix in tests/test_pg_types.py rather than
a live scan; ``dbapi_reader_df`` callers targeting Postgres can feed
``information_schema.columns`` rows through ``schema_from_information_schema``
to get the declared Spark schema the reference would produce.

Spark-side deltas from the reference's Arrow types (same conventions as
core.types):
- Time64(ns) → TimeType on pyspark 4.1+ (BIGINT micros-of-day fallback)
- Timestamp(ns) → Timestamp/TimestampNTZ (micros; nanos truncate on read)
- Dictionary(enum) → StringType (Spark materializes dictionaries)
- FixedSizeList(point) → ArrayType(Double) (fixed-size-ness not modeled)
- Interval(MonthDayNano) → unsupported (per UnsupportedTypeAction), as in
  core.types: Spark intervals cannot hold the mixed unit.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

from pyspark.sql import types as T

from datafusion_table_providers_spark.core.types import UnsupportedTypeAction

_SIMPLE: Dict[str, T.DataType] = {
    "smallint": T.ShortType(),
    "int2": T.ShortType(),
    "integer": T.IntegerType(),
    "int": T.IntegerType(),
    "int4": T.IntegerType(),
    "bigint": T.LongType(),
    "int8": T.LongType(),
    "money": T.LongType(),
    # unsigned 32-bit system types widen to the next signed type
    "oid": T.LongType(),
    "xid": T.LongType(),
    "regproc": T.LongType(),
    "real": T.FloatType(),
    "float4": T.FloatType(),
    "double precision": T.DoubleType(),
    "float8": T.DoubleType(),
    '"char"': T.ByteType(),
    "character": T.StringType(),
    "char": T.StringType(),
    "character varying": T.StringType(),
    "varchar": T.StringType(),
    "text": T.StringType(),
    "bpchar": T.StringType(),
    "uuid": T.StringType(),
    "name": T.StringType(),
    "bytea": T.BinaryType(),
    "date": T.DateType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    # enum dictionaries materialize to their label strings
    "enum": T.StringType(),
    # geometric: point is a (x, y) double pair; the rest are opaque WKB-ish
    "line": T.BinaryType(),
    "lseg": T.BinaryType(),
    "box": T.BinaryType(),
    "path": T.BinaryType(),
    "polygon": T.BinaryType(),
    "circle": T.BinaryType(),
    "geometry": T.BinaryType(),
    "geography": T.BinaryType(),
    "bit": T.BinaryType(),
    "bit varying": T.BinaryType(),
    "inet": T.StringType(),
    "cidr": T.StringType(),
    "macaddr": T.StringType(),
    "tsvector": T.StringType(),
    "tsquery": T.StringType(),
    "xml": T.StringType(),
    "json": T.StringType(),
    "aclitem": T.StringType(),
    "pg_node_tree": T.StringType(),
}


def _time_type() -> T.DataType:
    if hasattr(T, "TimeType"):
        return T.TimeType()
    return T.LongType()  # micros-of-day convention (core.types)


def pg_type_to_spark(
    pg_type: str,
    action: UnsupportedTypeAction = UnsupportedTypeAction.ERROR,
    type_details: Optional[dict] = None,
) -> Optional[T.DataType]:
    """Map one Postgres type name (information_schema / pg_catalog spelling)
    to a Spark type; ``type_details`` resolves arrays and composites the way
    the reference's ParseContext does (schema.rs:145-240).

    Returns None when the type is unsupported and ``action`` says IGNORE;
    raises TypeError on ERROR (reference: ArrowError::ParseError).
    """
    base = pg_type.split("(")[0].strip().lower() if pg_type != '"char"' else pg_type
    if base in _SIMPLE:
        return _SIMPLE[base]
    if base in ("numeric", "decimal"):
        m = re.match(r"^\s*\w+\s*\(\s*(\d+)\s*(?:,\s*(-?\d+)\s*)?\)", pg_type)
        if not m:
            return T.DecimalType(38, 20)  # reference default (schema.rs:250)
        precision = int(m.group(1))
        scale = int(m.group(2)) if m.group(2) is not None else 0
        if precision > 38:
            return _unsupported(pg_type, action)
        if scale < 0 or scale > precision:
            # numeric(5,-2) is legal Postgres (reference Decimal128 allows an
            # i8 scale) but Spark's DecimalType rejects it at analysis time
            # with an opaque error; route through the UnsupportedTypeAction
            # contract instead.
            return _unsupported(pg_type, action)
        return T.DecimalType(precision, scale)
    if base in ("time", "time without time zone"):
        return _time_type()
    if base in ("timestamp", "timestamp without time zone"):
        return T.TimestampNTZType()
    if base in ("timestamp with time zone", "timestamptz"):
        return T.TimestampType()
    if base == "point":
        return T.ArrayType(T.DoubleType(), True)
    if base == "int4range":
        return T.StructType(
            [
                T.StructField("lower", T.IntegerType()),
                T.StructField("upper", T.IntegerType()),
            ]
        )
    if base == "jsonb":
        # reference: only representable when the user opted into String
        if action == UnsupportedTypeAction.STRING:
            return T.StringType()
        return _unsupported(pg_type, action)
    if base == "interval":
        # MonthDayNano has no Spark analog (core.types docstring)
        return _unsupported(pg_type, action)
    if base == "anyarray":
        return T.ArrayType(T.BinaryType(), True)
    if base == "array" or pg_type.endswith("[]") or pg_type.startswith("_"):
        inner_name = None
        inner_details = None
        if type_details:
            inner_name = type_details.get("element_type")
            inner_details = type_details.get("element_details")
            if (
                isinstance(inner_details, dict)
                and inner_details.get("type") == "composite"
            ):
                inner = pg_type_to_spark("composite", action, inner_details)
                return T.ArrayType(inner, True) if inner else None
        if inner_name is None:
            if pg_type.endswith("[]"):
                inner_name = pg_type[:-2]
            elif pg_type.startswith("_"):
                inner_name = pg_type[1:]
        if not inner_name:
            return _unsupported(pg_type, action)
        inner = pg_type_to_spark(inner_name, action, None)
        return T.ArrayType(inner, True) if inner else None
    if base == "composite":
        if not type_details or "attributes" not in type_details:
            return _unsupported(pg_type, action)
        fields: List[T.StructField] = []
        for attr in type_details["attributes"]:
            ft = pg_type_to_spark(
                attr["type"], action, attr.get("type_details")
            )
            if ft is None:
                return None
            fields.append(T.StructField(attr["name"], ft, True))
        return T.StructType(fields)
    return _unsupported(pg_type, action)


def _unsupported(pg_type: str, action: UnsupportedTypeAction):
    if action == UnsupportedTypeAction.STRING:
        return T.StringType()
    if action == UnsupportedTypeAction.IGNORE:
        return None
    if action == UnsupportedTypeAction.WARN:
        import warnings

        warnings.warn(f"unsupported PostgreSQL type: {pg_type}")
        return None
    raise TypeError(f"unsupported PostgreSQL type: {pg_type}")


def schema_from_information_schema(
    rows: Sequence[dict],
    action: UnsupportedTypeAction = UnsupportedTypeAction.ERROR,
) -> T.StructType:
    """Build a Spark schema from ``information_schema.columns``-shaped rows:
    dicts with ``column_name``, ``data_type`` (or ``udt_name``), optional
    ``numeric_precision``/``numeric_scale``, ``is_nullable``, and optional
    ``type_details`` for arrays/composites. This is the introspection the
    reference runs over a live connection (schema.rs context queries),
    accepted here as data so it is testable without a server.
    """
    fields = []
    for r in rows:
        name = r["column_name"]
        pg_type = r.get("data_type") or r.get("udt_name")
        # Real Postgres reports arrays as data_type='ARRAY' (element type only
        # in udt_name, e.g. '_int4') and enums/domains as 'USER-DEFINED'; the
        # udt_name spelling is the resolvable one in both cases.
        if (
            pg_type
            and pg_type.strip().lower() in ("array", "user-defined")
            and r.get("udt_name")
        ):
            pg_type = r["udt_name"]
        if (
            pg_type in ("numeric", "decimal")
            and r.get("numeric_precision") is not None
        ):
            scale = r.get("numeric_scale") or 0
            pg_type = f"numeric({r['numeric_precision']},{scale})"
        dt = pg_type_to_spark(pg_type, action, r.get("type_details"))
        if dt is None:
            continue
        nullable = str(r.get("is_nullable", "YES")).upper() != "NO"
        fields.append(T.StructField(name, dt, nullable))
    return T.StructType(fields)
