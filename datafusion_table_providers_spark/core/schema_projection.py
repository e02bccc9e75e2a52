"""Declarative schema projection for dynamic-document sources (A31).

Reference analog: crates/common/src/schema_projection.rs:95-341 — a
user-supplied spec that reshapes inferred schemas: flatten nested structs
into dotted top-level columns, nest groups of flat columns into structs, and
collect leftover dynamic fields into a catch-all JSON column. Applied by the
MongoDB provider (crates/mongodb/src/projection.rs).

Spark-first: the spec compiles to a single ``select`` of column expressions
(`col("a.b")`, `struct(...)`, `to_json(struct(...))`) — pure Catalyst, no
Python per row, so it costs one projection regardless of data size.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class SchemaProjection:
    """Reshaping spec.

    - ``flatten``: struct columns to explode into dotted top-level columns
      (depth-1 per application; list order = output order)
    - ``nest``: new struct column name → flat source columns
    - ``json_catch_all``: name of a string column receiving ``to_json`` of
      all columns not otherwise mentioned ('' → disabled)
    - ``keep``: explicit passthrough columns (defaults to everything not
      consumed by the other rules)
    """

    flatten: Tuple[str, ...] = ()
    nest: Dict[str, Tuple[str, ...]] = field(default_factory=dict)
    json_catch_all: str = ""
    keep: Tuple[str, ...] = ()


def apply_projection(df: DataFrame, spec: SchemaProjection) -> DataFrame:
    consumed = set(spec.flatten)
    for srcs in spec.nest.values():
        consumed.update(srcs)

    cols: List = []
    names = [f.name for f in df.schema.fields]

    keep = list(spec.keep) if spec.keep else [
        n for n in names if n not in consumed
    ]

    catch_all_srcs: List[str] = []
    if spec.json_catch_all:
        explicit = set(keep) | consumed
        catch_all_srcs = [n for n in names if n not in explicit]
        keep = [n for n in keep if n not in catch_all_srcs]

    for n in keep:
        cols.append(F.col(n))

    for struct_col in spec.flatten:
        dt = df.schema[struct_col].dataType
        if not isinstance(dt, T.StructType):
            raise TypeError(f"flatten target {struct_col} is not a struct")
        for sub in dt.fields:
            cols.append(
                F.col(f"{struct_col}.{sub.name}").alias(
                    f"{struct_col}.{sub.name}"
                )
            )

    for new_name, srcs in spec.nest.items():
        cols.append(
            F.struct(*[F.col(s).alias(s) for s in srcs]).alias(new_name)
        )

    if spec.json_catch_all and catch_all_srcs:
        cols.append(
            F.to_json(
                F.struct(*[F.col(s) for s in catch_all_srcs])
            ).alias(spec.json_catch_all)
        )

    return df.select(*cols)
