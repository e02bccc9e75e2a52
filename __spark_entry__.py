"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``datafusion_table_providers_spark``; each operator
suite module pairs the Spark DataFrame builder with its DuckDB oracle SQL
(see ``datafusion_table_providers_spark/core/case.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datafusion_table_providers_spark.suite import (  # noqa: E402
    BROKEN_SUITES,
    FULL_SUITE,
)
from datafusion_table_providers_spark.session import tune_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3-shaped 3-way join
    with broadcast dims, aggregation and Top-K."""
    if BROKEN_SUITES:
        # a silently-missing suite would shrink queries() without a trace;
        # fail the smoke check loudly instead
        raise ImportError(f"operator suites failed to import: {BROKEN_SUITES}")
    tune_session(spark)
    case = FULL_SUITE["b08_multi_join_q3"]
    return case.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ pipeline ops)."""
    return {name: case.fn for name, case in FULL_SUITE.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; omitted → rows-only check."""
    return {
        name: case.oracle
        for name, case in FULL_SUITE.items()
        if case.oracle is not None
    }
