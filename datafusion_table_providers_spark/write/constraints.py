"""Pre-write constraint validation.

Reference analog: crates/common/src/util/constraints.rs:28-123 — incoming
batches are checked for PK/unique violations *before* any write, using a
``count(1) OVER (PARTITION BY keys) > 1`` window. That check is literally a
Spark window aggregate, which is how it's expressed here — distributed, no
collect, scales to any input size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class ConstraintViolation(Exception):
    pass


def validate_unique(df: DataFrame, keys: Sequence[str]) -> None:
    """Raise if `df` contains duplicate key tuples (batch self-consistency).

    Uses groupBy-count rather than a window so Catalyst can do map-side
    partial aggregation and stop at the first duplicate found (LIMIT 1).
    """
    if not keys:
        return
    dup = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        vals = {k: dup[0][k] for k in keys}
        raise ConstraintViolation(
            f"incoming batch violates unique constraint on {list(keys)}: "
            f"duplicate key {vals}"
        )


def validate_not_null(df: DataFrame, keys: Sequence[str]) -> None:
    if not keys:
        return
    cond = None
    for k in keys:
        c = F.col(k).isNull()
        cond = c if cond is None else (cond | c)
    bad = df.filter(cond).limit(1).collect()
    if bad:
        raise ConstraintViolation(f"NULL in constrained columns {list(keys)}")
