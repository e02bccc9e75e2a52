"""Assembles every operator suite into the driver-facing registry.

Suites:
- operators.relational — SURVEY.md §2.B relational surface (Catalyst-executed)
- sources.suite        — connector-backed queries (DuckDB/SQLite scan+pushdown,
                         write path round-trips, federation)
- llm suites           — dedup / similarity / text-analysis / multimodal ops
"""

from __future__ import annotations

from typing import Dict

from datafusion_table_providers_spark.core.case import QueryCase
from datafusion_table_providers_spark.operators import relational

FULL_SUITE: Dict[str, QueryCase] = {}
FULL_SUITE.update(relational.SUITE)

# Optional suites are registered as they land; a broken import of one suite
# must not take down the whole correctness gate.
for _mod, _attr in [
    ("datafusion_table_providers_spark.operators.extensions", "SUITE"),
    ("datafusion_table_providers_spark.operators.tpch", "SUITE"),
    ("datafusion_table_providers_spark.operators.tpch2", "SUITE"),
    ("datafusion_table_providers_spark.llm.dedup", "SUITE"),
    ("datafusion_table_providers_spark.llm.similarity", "SUITE"),
    ("datafusion_table_providers_spark.llm.text", "SUITE"),
    ("datafusion_table_providers_spark.llm.multimodal", "SUITE"),
    ("datafusion_table_providers_spark.llm.pipeline", "SUITE"),
    ("datafusion_table_providers_spark.sources.suite", "SUITE"),
]:
    try:
        _m = __import__(_mod, fromlist=[_attr])
        FULL_SUITE.update(getattr(_m, _attr))
    except ImportError:
        pass
