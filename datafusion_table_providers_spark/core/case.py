"""Query-case plumbing shared by the operator suites.

Each suite module exposes ``SUITE: dict[str, QueryCase]``; a ``QueryCase``
pairs a Spark DataFrame builder with the ANSI-SQL oracle DuckDB runs on the
same parquet tables (the driver's correctness gate). Column names are part of
the contract: every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryCase:
    fn: QueryFn
    oracle: Optional[str]  # None → driver records a weaker rows-only check
    doc: str = ""


def utc(spark: SparkSession) -> SparkSession:
    """Pin session timezone so Spark timestamps collect identically to
    DuckDB's naive timestamps (parquet values are stored tz-less)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
