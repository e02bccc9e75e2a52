"""A31 schema-projection tests (flatten / nest / JSON catch-all), per
crates/common/src/schema_projection.rs semantics."""

import json

from pyspark.sql import functions as F

from datafusion_table_providers_spark.core.schema_projection import (
    SchemaProjection,
    apply_projection,
)


def _df(spark):
    return spark.createDataFrame(
        [(1, ("a", 2), 3.5, "x"), (2, ("b", 4), 7.0, "y")],
        "id long, info struct<name:string, n:int>, v double, tag string",
    )


def test_flatten_struct(spark):
    out = apply_projection(_df(spark), SchemaProjection(flatten=("info",)))
    assert out.columns == ["id", "v", "tag", "info.name", "info.n"]
    row = out.orderBy("id").first()
    assert row["info.name"] == "a" and row["info.n"] == 2


def test_nest_columns(spark):
    out = apply_projection(
        _df(spark), SchemaProjection(nest={"metrics": ("v", "id")})
    )
    assert "metrics" in out.columns and "v" not in out.columns
    row = out.orderBy(F.col("metrics.id")).first()
    assert row["metrics"]["v"] == 3.5


def test_json_catch_all(spark):
    out = apply_projection(
        _df(spark),
        SchemaProjection(keep=("id",), json_catch_all="rest"),
    )
    assert out.columns == ["id", "rest"]
    rest = json.loads(out.orderBy("id").first()["rest"])
    assert rest["tag"] == "x" and rest["v"] == 3.5


def test_flatten_non_struct_raises(spark):
    import pytest

    with pytest.raises(TypeError):
        apply_projection(_df(spark), SchemaProjection(flatten=("v",)))
