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


def events_ts_meta(sf_dir: str) -> tuple:
    """(is_nanos, is_ntz) for ``events.ts``, from one driver-side parquet
    footer read. Driver testdata has shipped the column as TIMESTAMP(NANOS)
    (round 1) and TIMESTAMP(MICROS, no tz) (round 2+); readers must adapt.

    Local-filesystem paths only (pyarrow peek): fine for driver testdata; a
    remote ``sf_dir`` (s3://, hdfs://) would need a filesystem abstraction
    here before the Spark read — which itself handles any scheme.
    """
    import os

    import pyarrow.parquet as pq

    t = pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type
    is_nanos = getattr(t, "unit", None) == "ns"
    is_ntz = getattr(t, "tz", None) is None
    return is_nanos, is_ntz


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
