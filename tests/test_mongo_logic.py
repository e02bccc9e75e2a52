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
