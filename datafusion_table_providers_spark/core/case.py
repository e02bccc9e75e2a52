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
    """Apply engine session tuning (UTC timezone, AQE, Python-source filter
    pushdown, Arrow batching) to whatever session invoked us.

    The correctness driver owns its SparkSession, so every query entry point
    must self-provision its runtime confs — most critically the UTC timezone
    (timestamps must collect identically to DuckDB's naive values) and
    ``spark.sql.python.filterPushdown.enabled`` (connector readers refuse to
    run with pushFilters implemented but pushdown disabled)."""
    from datafusion_table_providers_spark.session import tune_session

    return tune_session(spark)
