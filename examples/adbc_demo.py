"""ADBC factory demo — the Arrow-native transport (reference crates/adbc).

Uses DuckDB's ADBC-shaped DB-API module as the driver so the demo runs
without external adbc_driver_* wheels; swap ``driver`` for
``adbc_driver_postgresql.dbapi`` etc. against a real server.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import tempfile

import duckdb

from datafusion_table_providers_spark.factories import ADBCTableFactory
from datafusion_table_providers_spark.session import get_spark


def main():
    path = os.path.join(tempfile.mkdtemp(), "adbc_example.duckdb")
    con = duckdb.connect(path)
    con.execute(
        "CREATE TABLE metrics AS "
        "SELECT range AS id, range * 1.5 AS value FROM range(1000)"
    )
    con.close()

    spark = get_spark("adbc_demo")
    factory = ADBCTableFactory(
        {
            "driver": "duckdb",
            "connect_args": [path],
            "connect_kwargs": {"read_only": True},
        }
    ).with_session(spark)
    print("tables:", factory.tables())
    df = factory.get_table(
        "metrics", columns=["id", "value"], partition_column="id", num_partitions=4
    )
    df.filter("value > 100").groupBy().sum("value").show()


if __name__ == "__main__":
    main()
