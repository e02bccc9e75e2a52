"""MongoDB pushdown/inference/unnest logic tests (server-free).

Expectation sources: crates/mongodb/src/utils/expression.rs:385-700 (expr→
BSON), utils/schema.rs:133-465 (inference/unification), utils/unnest.rs +
core/tests/mongodb/mod.rs (flattening and duplicate-key behavior)."""

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    In,
    IsNull,
    LessThanOrEqual,
    Not,
    StringStartsWith,
)

from datafusion_table_providers_spark.sources.mongodb_source import (
    flatten_document,
    infer_schema_from_documents,
    sql_like_to_regex,
    translate_filters_bson,
)


def test_simple_comparisons():
    doc, rest = translate_filters_bson(
        [EqualTo(("age",), 30), GreaterThan(("score",), 1.5)]
    )
    assert doc == {"$and": [{"age": {"$eq": 30}}, {"score": {"$gt": 1.5}}]}
    assert rest == []


def test_single_clause_not_wrapped():
    doc, _ = translate_filters_bson([LessThanOrEqual(("a",), 5)])
    assert doc == {"a": {"$lte": 5}}


def test_in_null_not_nested_field():
    doc, rest = translate_filters_bson(
        [
            In(("tags", "primary"), ("a", "b")),
            IsNull(("x",)),
            Not(EqualTo(("y",), 1)),
        ]
    )
    assert doc["$and"] == [
        {"tags.primary": {"$in": ["a", "b"]}},
        {"x": {"$eq": None}},
        {"y": {"$not": {"$eq": 1}}},
    ]
    assert rest == []


def test_like_to_regex():
    assert sql_like_to_regex("abc%") == "^abc.*$"
    assert sql_like_to_regex("a_c") == "^a.c$"
    assert sql_like_to_regex("50\\%") == "^50%$"
    assert sql_like_to_regex("a.b") == "^a\\.b$"


def test_string_filters_regex():
    doc, _ = translate_filters_bson([StringStartsWith(("s",), "pre.")])
    assert doc == {"s": {"$regex": "^pre\\..*$"}}


def test_unsupported_returned():
    class Custom:
        pass

    doc, rest = translate_filters_bson([Custom(), EqualTo(("a",), 1)])
    assert doc == {"a": {"$eq": 1}}
    assert len(rest) == 1


def test_schema_inference_numeric_promotion():
    docs = [
        {"a": 1, "b": "x"},
        {"a": 2.5, "c": True},
        {"a": 3, "b": "y", "d": 2**40},
    ]
    schema = infer_schema_from_documents(docs)
    m = {f.name: f.dataType for f in schema.fields}
    assert isinstance(m["a"], T.DoubleType)  # int ∪ double → double
    assert isinstance(m["b"], T.StringType)
    assert isinstance(m["c"], T.BooleanType)
    assert isinstance(m["d"], T.LongType)


def test_schema_inference_conflict_falls_to_string():
    docs = [{"a": 1}, {"a": "oops"}]
    schema = infer_schema_from_documents(docs)
    assert isinstance(schema.fields[0].dataType, T.StringType)


def test_schema_inference_nested_union():
    docs = [{"o": {"x": 1}}, {"o": {"y": "s"}}]
    schema = infer_schema_from_documents(docs)
    inner = schema.fields[0].dataType
    assert isinstance(inner, T.StructType)
    assert [f.name for f in inner.fields] == ["x", "y"]


def test_flatten_depth_and_duplicates():
    doc = {"a": {"b": {"c": 1}}, "a.b": {"c": 9}}
    flat = flatten_document(doc, max_depth=2)
    # depth-2: a.b.c from the nested path wins (first encountered)
    assert flat["a.b.c"] == 1
    deep = flatten_document({"a": {"b": {"c": {"d": 2}}}}, max_depth=1)
    assert deep == {"a.b": {"c": {"d": 2}}}


def test_mongo_reader_requires_pymongo_or_works():
    """mongo_reader_df is the live scan entry with declarative
    SchemaProjection applied as one Catalyst select (projection.rs analog).
    Without pymongo it must fail loudly, not silently degrade."""
    import importlib.util

    from datafusion_table_providers_spark.sources import mongodb_source as m

    if importlib.util.find_spec("pymongo") is None:
        import pytest as _pytest

        with _pytest.raises(ImportError, match="pymongo"):
            m.mongo_reader_df(None, "mongodb://x", "db", "coll")
    else:  # pragma: no cover - gated on driver presence
        assert callable(m.mongo_reader_df)


def test_schema_projection_over_inferred_docs(spark):
    """The live-reader reshaping path end-to-end minus the wire: documents →
    inferred schema → DataFrame → SchemaProjection (flatten + catch-all)."""
    from datafusion_table_providers_spark.core.schema_projection import (
        SchemaProjection,
        apply_projection,
    )
    from datafusion_table_providers_spark.sources.mongodb_source import (
        infer_schema_from_documents,
    )

    docs = [
        {"id": 1, "geo": {"lat": 1.5, "lon": 2.5}, "extra_a": "x"},
        {"id": 2, "geo": {"lat": 3.5, "lon": 4.5}, "extra_b": 7},
    ]
    schema = infer_schema_from_documents(docs)
    rows = [
        (d.get("id"), (d["geo"]["lat"], d["geo"]["lon"]),
         d.get("extra_a"), d.get("extra_b"))
        for d in docs
    ]
    df = spark.createDataFrame(rows, schema)
    out = apply_projection(
        df,
        SchemaProjection(flatten=("geo",), json_catch_all="rest", keep=("id",)),
    )
    assert out.columns == ["id", "geo.lat", "geo.lon", "rest"]
    got = {r["id"]: r for r in out.collect()}
    assert got[1]["geo.lat"] == 1.5
    import json as _json

    assert _json.loads(got[1]["rest"])["extra_a"] == "x"
