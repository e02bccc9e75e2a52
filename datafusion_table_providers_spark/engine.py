"""User-facing Engine: table registry + SQL entry + whole-plan federation.

Reference analog — the federated SessionContext
(datafusion-federation wiring, README.md:13-21, and
crates/common/src/sql/sql_provider_datafusion/federation.rs):

- ``register_*`` mirrors TableProviderFactory / ``get_table``
  (python/python/datafusion_table_providers/duckdb.py:30-62).
- ``Engine.sql(q)``: if every referenced table lives on backends sharing ONE
  ``compute_context``, the entire query is unparsed to that backend and runs
  remotely as a single SQL statement — the reference's federation fast path
  ("pushing down joins between multiple tables from the same database
  system", README.md:7-9). Logical→remote name mapping is carried by a CTE
  prelude, the same trick as the reference's table-function CTE scan
  (crates/duckdb/src/sql_table.rs:296-307: ``WITH name AS (SELECT * FROM
  read_parquet(...)) <query>``).
- Otherwise the query runs on Spark: connector-backed temp views feed
  Catalyst, which executes the cross-source remainder locally — exactly the
  reference's fallback (federation.rs: DataFusion executes the cross-source
  remainder).

Scale note: the federated fast path materializes the remote result via one
Arrow stream on the driver — correct for the aggregate/TopK results it is
meant for. Scans of large remote tables should go through the partitioned
Python Data Source connectors instead (sources/duckdb_source.py), which read
on executors.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession

from datafusion_table_providers_spark.session import tune_session
from datafusion_table_providers_spark.sources.backends import Backend


@dataclass
class TableHandle:
    name: str
    backend: Optional[Backend]  # None → Spark-native (parquet/df)
    remote_relation: str  # SQL relation text on the backend ("tbl" or subquery)


class Engine:
    def __init__(self, spark: SparkSession):
        self.spark = tune_session(spark)
        self._tables: Dict[str, TableHandle] = {}

    # -- registration -----------------------------------------------------
    def register_parquet(self, name: str, path: str) -> DataFrame:
        df = self.spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        self._tables[name] = TableHandle(name, None, name)
        return df

    def register_dataframe(self, name: str, df: DataFrame) -> DataFrame:
        df.createOrReplaceTempView(name)
        self._tables[name] = TableHandle(name, None, name)
        return df

    def register_backend_table(
        self,
        name: str,
        backend: Backend,
        remote_relation: Optional[str] = None,
        partition_column: Optional[str] = None,
        num_partitions: int = 1,
        columns: Optional[list] = None,
    ) -> DataFrame:
        """Register a connector-backed table as a Spark temp view.

        The view reads through the Python Data Source connector (executor-side
        Arrow batches, filter/column pushdown); federation metadata is kept so
        ``Engine.sql`` can still collapse same-backend queries.

        ``columns`` prunes the remote projection (reference mod.rs:258-276):
        list every column queries against this view will touch; the transfer
        then carries only those instead of full-width rows.
        """
        relation = remote_relation or name
        df = self._connector_df(
            backend, relation, partition_column, num_partitions, columns
        )
        df.createOrReplaceTempView(name)
        self._tables[name] = TableHandle(name, backend, relation)
        return df

    def _connector_df(
        self,
        backend: Backend,
        relation: str,
        partition_column: Optional[str],
        num_partitions: int,
        columns: Optional[list] = None,
    ) -> DataFrame:
        from datafusion_table_providers_spark.sources.duckdb_source import (
            duckdb_reader_df,
        )
        from datafusion_table_providers_spark.sources.sqlite_source import (
            sqlite_reader_df,
        )

        ctx = backend.compute_context()
        if ctx.startswith("duckdb:"):
            return duckdb_reader_df(
                self.spark,
                backend,
                relation,
                partition_column,
                num_partitions,
                columns=columns,
            )
        if ctx.startswith("sqlite:"):
            return sqlite_reader_df(self.spark, backend, relation, columns=columns)
        raise ValueError(f"no connector for backend context {ctx}")

    # -- query ------------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """Run SQL with whole-plan federation when possible."""
        handles = self._referenced(query)
        backends = {h.backend for h in handles.values()}
        contexts = {
            h.backend.compute_context() for h in handles.values() if h.backend
        }
        if handles and None not in backends and len(contexts) == 1:
            backend = next(iter(backends))
            pushed = self._with_cte_prelude(query, handles)
            arrow = backend.query_arrow(pushed)
            return self.spark.createDataFrame(arrow)
        return self.spark.sql(query)

    def explain_federation(self, query: str) -> str:
        """Report which execution path ``sql`` would take (for tests/docs)."""
        handles = self._referenced(query)
        contexts = {
            h.backend.compute_context() if h.backend else "spark"
            for h in handles.values()
        }
        if handles and "spark" not in contexts and len(contexts) == 1:
            return f"federated[{next(iter(contexts))}]"
        return f"spark[{', '.join(sorted(contexts)) or 'no-tables'}]"

    def _referenced(self, query: str) -> Dict[str, TableHandle]:
        found = {}
        for name, h in self._tables.items():
            if re.search(rf"(?<![\w.]){re.escape(name)}(?![\w.])", query, re.I):
                found[name] = h
        return found

    def _with_cte_prelude(self, query: str, handles: Dict[str, TableHandle]) -> str:
        ctes = [
            f'"{h.name}" AS (SELECT * FROM {h.remote_relation})'
            for h in handles.values()
            if h.remote_relation != h.name
        ]
        if not ctes:
            return query
        # Merge with an existing WITH clause if the query has one.
        stripped = query.lstrip()
        if re.match(r"(?i)^WITH\s", stripped):
            body = stripped[len("WITH") :]
            return "WITH " + ", ".join(ctes) + ", " + body
        return "WITH " + ", ".join(ctes) + " " + query

    # -- DML (delegates to the write layer) -------------------------------
    def insert_into(self, name: str, df: DataFrame, **kwargs) -> int:
        from datafusion_table_providers_spark.write.writer import insert_into

        h = self._require_backend(name)
        return insert_into(h.backend, h.remote_relation, df, **kwargs)

    def delete_from(self, name: str, condition: Optional[str] = None) -> int:
        from datafusion_table_providers_spark.write.writer import delete_from

        h = self._require_backend(name)
        return delete_from(h.backend, h.remote_relation, condition)

    def update(self, name: str, assignments: Dict[str, str], condition=None) -> int:
        from datafusion_table_providers_spark.write.writer import update

        h = self._require_backend(name)
        return update(h.backend, h.remote_relation, assignments, condition)

    def _require_backend(self, name: str) -> TableHandle:
        h = self._tables.get(name)
        if h is None or h.backend is None:
            raise ValueError(f"{name} is not a backend-managed table")
        return h
