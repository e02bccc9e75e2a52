"""Postgres factory demo — reference python/examples/postgres_demo.py.

No Postgres server ships in this environment, so this demo shows the
surface that runs WITHOUT one: the connection/transport spec the factory
would use, the dialect-correct SQL a scan would push, and the declared
Spark schema the type matrix produces from information_schema rows.
Point ``params`` at a real server and ``factory.tables()`` /
``factory.get_table(...)`` go live with the same code.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from datafusion_table_providers_spark.core.expr import DIALECTS, build_select
from datafusion_table_providers_spark.core.pg_types import (
    schema_from_information_schema,
)
from datafusion_table_providers_spark.factories import PostgresTableFactory


def main():
    factory = PostgresTableFactory(
        {"host": "localhost", "port": "5432", "db": "postgres", "user": "postgres"}
    )
    b = factory.backend
    print("compute context:", b.compute_context())
    print("jdbc url:", b.jdbc_url())
    print("dbapi spec:", b.dbapi_spec())

    d = DIALECTS["postgres"]
    sql = build_select(
        d,
        d.quote_ident("companies"),
        columns=["name", "employees"],
        where=['"employees" > 500'],
        limit=10,
    )
    print("pushed scan SQL:", sql)

    rows = [
        {"column_name": "id", "data_type": "bigint", "is_nullable": "NO"},
        {"column_name": "name", "data_type": "character varying"},
        {"column_name": "tags", "data_type": "ARRAY", "udt_name": "_text"},
        {
            "column_name": "price",
            "data_type": "numeric",
            "numeric_precision": 12,
            "numeric_scale": 2,
        },
    ]
    print("declared schema:", schema_from_information_schema(rows).simpleString())


if __name__ == "__main__":
    main()
