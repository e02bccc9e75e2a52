"""DuckDB factory demo — the reference's python/examples/duckdb_demo.py
translated to Spark: SessionContext → Engine, register_table_provider →
register_backend_table, ctx.table(t).show() → engine DataFrames.

Self-provisioning: builds its own temp DuckDB file so it runs anywhere.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import tempfile

import duckdb

from datafusion_table_providers_spark.engine import Engine
from datafusion_table_providers_spark.factories import (
    AccessMode,
    DuckDBTableFactory,
)
from datafusion_table_providers_spark.session import get_spark


def main():
    path = os.path.join(tempfile.mkdtemp(), "duckdb_example.db")
    con = duckdb.connect(path)
    con.execute("CREATE TABLE companies AS SELECT 'Acme' AS name, 1000 AS emp")
    con.execute("CREATE TABLE projects AS SELECT 'Apollo' AS title, 'Acme' AS owner")
    con.close()

    spark = get_spark("duckdb_demo")
    factory = DuckDBTableFactory(path, AccessMode.ReadOnly).with_session(spark)
    eng = Engine(spark)
    for t in factory.tables():
        eng.register_backend_table(t, factory.backend, t)
        print("Checking table:", t)
        factory.get_table(t).show()
    # whole-query federation: executed by DuckDB as ONE pushed statement
    eng.sql(
        "SELECT c.name, c.emp, p.title FROM companies c "
        "JOIN projects p ON c.name = p.owner"
    ).show()


if __name__ == "__main__":
    main()
